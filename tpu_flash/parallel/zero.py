"""ZeRO-1 optimizer-state sharding over the data axis.

The reference has no distributed training at all (SURVEY.md §2.4 explicitly
lists ZeRO among the absent capabilities); this is new TPU-native design.
Plain data parallelism replicates the optimizer state on every data-parallel
replica — for Adam that is 2 extra fp32 copies of the model, usually the
largest single consumer of HBM in training.  ZeRO-1 shards those moments
(and the gradient reduction feeding them) over the ``data`` axis so each
replica holds 1/data_size of the optimizer state.

The TPU-idiomatic construction needs no manual collectives: the step places
``with_sharding_constraint`` annotations and GSPMD materializes them as

  * gradients constrained to the zero1 spec  → **reduce_scatter** over
    ``data`` (instead of the all-reduce of plain DP);
  * elementwise ``opt.update`` on shard-resident grads/params/state → purely
    local (this is where the memory is saved);
  * updated params constrained back to their TP spec (replicated over
    ``data``) → **all_gather** over ``data``.

Both collectives move exactly the same bytes as the all-reduce they replace
(an all-reduce IS a reduce-scatter + all-gather), so ZeRO-1 costs no extra
communication — it composes with the Megatron TP specs (sharding.py), which
keep their ``model``-axis placement; the zero1 spec only fills a dimension
that TP left unsharded.

Optimizer-state sharding is obtained generically (for ANY ``Transform``,
including wrapped ones like ``skip_nonfinite(adamw(...))``): optimizer
states embed per-parameter arrays at paths whose *suffix* is the parameter's
own path (``exp_avg/layers/0/...``, ``inner/exp_avg_sq/layers/0/...``), so
each state leaf's sharding is looked up by path-suffix match against the
zero1 spec tree and applied via jit ``out_shardings`` — no per-optimizer
spec plumbing.  (Sharding cannot be left to propagation: ``init`` builds
state with ``zeros_like``, whose output has no data dependence on the
params, so GSPMD has nothing to propagate from.)
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_flash.parallel.context import ParallelContext, parallel_context
from tpu_flash.parallel.sharding import (
    decoder_param_specs,
    map_with_specs,
    shard_params,
)


def zero1_specs(ctx: ParallelContext, params, specs):
    """Extend each param's TP spec with the ``data`` axis on the first
    dimension that is unsharded and divisible by ``data_size``.

    Leaves with no eligible dimension (tiny LN vectors, biases smaller than
    the data axis) keep their TP spec — replicating a [E]-sized moment is
    noise next to the [E, E] matrices that do shard."""

    def pick(p, spec):
        entries = tuple(spec) + (None,) * (p.ndim - len(tuple(spec)))
        for i, (dim, s) in enumerate(zip(p.shape, entries)):
            if s is None and dim >= ctx.data_size \
                    and dim % ctx.data_size == 0:
                return P(*entries[:i], ctx.data_axis, *entries[i + 1:])
        return P(*entries)

    return map_with_specs(params, specs, pick)


def _constrain(ctx: ParallelContext, tree, specs):
    return map_with_specs(
        tree, specs,
        lambda x, s: jax.lax.with_sharding_constraint(
            x, NamedSharding(ctx.mesh, s)))


def _norm_key(k) -> str:
    """Normalize a tree_util path entry (DictKey/SequenceKey/GetAttrKey/
    FlattenedIndexKey) to a plain string."""
    for attr in ("key", "idx", "name"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def state_shardings(ctx: ParallelContext, opt, params, zspecs):
    """Sharding pytree for ``opt.init(params)``'s state, by path-suffix
    lookup: a state leaf at ``exp_avg/layers/0/.../weight`` gets the zero1
    spec of the param at ``layers/0/.../weight``; leaves matching no param
    (step counters, skip counts) replicate."""
    by_path = {
        tuple(_norm_key(k) for k in path): spec
        for path, spec in jax.tree_util.tree_flatten_with_path(
            zspecs, is_leaf=lambda x: isinstance(x, P))[0]
    }

    def lookup(path, leaf):
        keys = tuple(_norm_key(k) for k in path)
        for start in range(len(keys)):
            spec = by_path.get(keys[start:])
            if spec is not None and len(spec) <= getattr(leaf, "ndim", 0):
                return NamedSharding(ctx.mesh, spec)
        return NamedSharding(ctx.mesh, P())

    shape = jax.eval_shape(opt.init, params)
    return jax.tree_util.tree_map_with_path(lookup, shape)


def init_zero1(ctx: ParallelContext, model, opt, key):
    """Initialize TP-sharded params and a data-sharded optimizer state.

    Returns ``(params, opt_state, specs, zspecs)``: params carry the
    Megatron TP layout (replicated over ``data``); every array in
    ``opt_state`` congruent with a param is additionally sharded over
    ``data`` per :func:`zero1_specs`."""
    params = model.init(key)
    params, specs = shard_params(ctx, model, params)
    zspecs = zero1_specs(ctx, params, specs)
    out = state_shardings(ctx, opt, params, zspecs)
    opt_state = jax.jit(opt.init, out_shardings=out)(params)
    return params, opt_state, specs, zspecs


def make_zero1_train_step(ctx: ParallelContext, model, opt, loss_fn):
    """Build a jitted SPMD train step with ZeRO-1 optimizer sharding.

    Same contract as ``make_sharded_train_step`` (train.py): ``loss_fn(
    params, batch, key, training)`` -> scalar; returns ``train_step(params,
    opt_state, batch, key) -> (params, opt_state, loss)``.  Numerics are
    identical to the unsharded step (the update is elementwise; only the
    placement of the reduction changes)."""
    specs_cache = {}

    def step(params, opt_state, batch, key):
        if "specs" not in specs_cache:
            specs = decoder_param_specs(model, params)
            specs_cache["specs"] = specs
            specs_cache["zspecs"] = zero1_specs(ctx, params, specs)
        specs, zspecs = specs_cache["specs"], specs_cache["zspecs"]
        with parallel_context(ctx):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, batch, key=key, training=True)
            # reduce_scatter the DP gradient sum instead of all-reducing it
            grads = _constrain(ctx, grads, zspecs)
            params_sh = _constrain(ctx, params, zspecs)
            new_params, opt_state = opt.update(grads, opt_state, params_sh)
            # all-gather the updated shards back to the TP layout
            new_params = _constrain(ctx, new_params, specs)
        return new_params, opt_state, loss

    return jax.jit(step, donate_argnums=(0, 1))
