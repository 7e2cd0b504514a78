"""Sharded training step: pjit-style jit over the (data, model) mesh.

The full train step (forward, backward, optimizer) compiles into one SPMD
program: parameters laid out by the Megatron TP rules (sharding.py),
activations sharded over the data axis, and GSPMD inserting the collectives
(all-reduce of TP partial sums inside the layers, psum of data-parallel
gradients).  The Pallas attention/softmax/LN kernels execute inside
shard_map regions (see ops/) with purely local shards, so no collective ever
crosses an attention kernel — the layout keeps TP collectives on the
ICI-mapped model axis.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_flash import nn
from tpu_flash.parallel.context import ParallelContext, parallel_context
from tpu_flash.parallel.sharding import (
    batch_specs,
    decoder_param_specs,
    shard_params,
)


def make_sharded_train_step(ctx: ParallelContext, model, opt, loss_fn):
    """Build a jitted SPMD train step.

    ``loss_fn(params, batch, key, training)`` -> scalar.  Returns
    ``train_step(params, opt_state, batch, key) -> (params, opt_state, loss)``
    whose inputs/outputs carry the mesh shardings.
    """

    def step(params, opt_state, batch, key):
        with parallel_context(ctx):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch, key=key, training=True)
            params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))


def init_sharded(ctx: ParallelContext, model, opt, key):
    """Initialize params + optimizer state directly onto the mesh."""
    params = model.init(key)
    params, specs = shard_params(ctx, model, params)
    opt_state = opt.init(params)  # inherits param shardings leaf-wise
    return params, opt_state, specs


def put_batch(ctx: ParallelContext, batch):
    specs = batch_specs(ctx, batch)
    return {
        k: jax.device_put(jnp.asarray(v), NamedSharding(ctx.mesh, specs[k]))
        for k, v in batch.items()
    }


def put_local_batch(ctx: ParallelContext, local_batch):
    """Multi-host batch feed: each process passes ITS rows of the global
    batch (its data loader's shard); the returned jax.Arrays are globally
    sharded over the mesh without any cross-host data movement.

    Single-process meshes degrade to ``put_batch`` semantics (the local
    batch IS the global batch).  On a ``dcn_data``-granule mesh each host
    contributes ``global_batch / n_hosts`` rows, which land on its own
    devices by construction of the hybrid device order (context.py).
    """
    specs = batch_specs(ctx, local_batch)
    if jax.process_count() == 1:
        return put_batch(ctx, local_batch)
    import numpy as np
    return {
        k: jax.make_array_from_process_local_data(
            NamedSharding(ctx.mesh, specs[k]), np.asarray(v))
        for k, v in local_batch.items()
    }
