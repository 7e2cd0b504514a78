"""Pipeline parallelism: the decoder layer stack sharded over a "pipe" mesh
axis with a GPipe microbatch schedule.

The reference is single-GPU (SURVEY.md §2.4); this is new TPU-native design.
The idiomatic TPU form is SPMD: every device runs the same jitted program,
the stage's layers live in stacked parameters sharded on the pipe axis, and
activations hop stage-to-stage with ``jax.lax.ppermute`` inside a
``lax.scan`` over schedule steps.  jax AD differentiates straight through
the schedule (the transpose of ``ppermute`` is the reverse hop), so one
forward definition yields the standard fill-drain backward for free.

Composition: embeddings, final LayerNorm and lm_head stay *outside* the
pipeline region (they are cheap and replicated over the pipe axis); the
microbatch dimension may additionally be sharded over the ``data`` axis of
the same mesh (PP x DP in one shard_map).  Tensor parallelism composes by
nesting the model axis inside the stage, which is left to the GSPMD path.

Bubble fraction is the GPipe (S-1)/(n_micro + S - 1); pick
``n_micro >= 4 * stages`` for <20% bubble.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

PIPE_AXIS = "pipe"


def make_pipeline_mesh(pipe: int, data: int = 1, devices=None) -> Mesh:
    """(data, pipe) mesh; pipe should ride ICI (activation hops are
    latency-critical), data may span DCN."""
    if devices is None:
        devices = jax.devices()
    if pipe * data != len(devices):
        raise ValueError(f"mesh {data}x{pipe} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, pipe)
    return Mesh(arr, ("data", PIPE_AXIS))


def stack_layer_params(params, n_layer: int):
    """Stack the per-layer parameter trees of a DecoderLM into one tree whose
    leaves carry a leading [n_layer] axis (shardable over the pipe axis)."""
    per_layer = [params["layers"][str(i)] for i in range(n_layer)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *per_layer)


def unstack_layer_params(stacked, n_layer: int):
    """Inverse of :func:`stack_layer_params` (back to the model's dict)."""
    return {
        str(i): jax.tree_util.tree_map(lambda x: x[i], stacked)
        for i in range(n_layer)
    }


def _pipeline_loop(stacked_local, micros, key, *, layer_apply, axis_name,
                   n_micro, training, moe):
    """One device's view of the GPipe schedule.  Runs inside shard_map.

    ``stacked_local``: this stage's layers, leaves [layers_per_stage, ...].
    ``micros``: [n_micro, B_m, L, E] microbatched activations (replicated
    over the pipe axis; injected at stage 0).
    Returns (outs, aux): this device's output buffer (only stage S-1's is
    meaningful) and the replicated MoE router aux-loss total (0 when not
    MoE) — warm-up/drain bubble steps are excluded from aux.
    """
    S = jax.lax.axis_size(axis_name)
    s = jax.lax.axis_index(axis_name)
    T = n_micro + S - 1
    perm = [(i, i + 1) for i in range(S - 1)]  # stage s -> s+1 (no wrap)

    def stage_fn(x, step_key):
        def body(carry, layer_params_and_idx):
            lp, li = layer_params_and_idx
            h, k, aux = carry
            lk = None if k is None else jax.random.fold_in(k, li)
            h = layer_apply(lp, h, key=lk, training=training)
            if moe:
                h, layer_aux = h
                aux = aux + layer_aux
            return (h, k, aux), None
        n_local = jax.tree_util.tree_leaves(stacked_local)[0].shape[0]
        idxs = jnp.arange(n_local)
        (x, _, aux), _ = jax.lax.scan(
            body, (x, step_key, jnp.zeros((), jnp.float32)),
            (stacked_local, idxs))
        return x, aux

    bm_shape = micros.shape[1:]
    recv0 = jnp.zeros(bm_shape, micros.dtype)
    outs0 = jnp.zeros_like(micros)

    def step(carry, t):
        recv, outs, aux_tot = carry
        x0 = jax.lax.dynamic_index_in_dim(
            micros, jnp.clip(t, 0, n_micro - 1), 0, keepdims=False)
        x_in = jnp.where(s == 0, x0, recv)
        step_key = (None if key is None
                    else jax.random.fold_in(key, t * S + s))
        y, aux = stage_fn(x_in, step_key)
        # This stage processes microbatch t-s; anything else is bubble.
        valid = jnp.logical_and(t >= s, t - s < n_micro)
        aux_tot = aux_tot + jnp.where(valid, aux, 0.0)
        # Stage S-1 collects microbatch t-(S-1).  Early (invalid) steps write
        # warm-up garbage into slot 0, which the first valid step (t = S-1)
        # overwrites; other stages' buffers are discarded by the caller.
        out_idx = jnp.clip(t - (S - 1), 0, n_micro - 1)
        outs = jax.lax.dynamic_update_index_in_dim(outs, y, out_idx, 0)
        recv = jax.lax.ppermute(y, axis_name, perm) if S > 1 else y
        return (recv, outs, aux_tot), None

    (_, outs, aux_tot), _ = jax.lax.scan(
        step, (recv0, outs0, jnp.zeros((), jnp.float32)), jnp.arange(T))
    # Every microbatch crosses every stage exactly once; summing the valid
    # per-stage totals over the pipe axis gives the all-layer aux sum
    # (averaged over microbatches by the caller).
    return outs, jax.lax.psum(aux_tot, axis_name)


def pipelined_decoder_apply(
    model, params, idx, *,
    mesh: Mesh,
    n_micro: int,
    key=None,
    training: bool = False,
    return_aux: bool = False,
    pipe_axis: str = PIPE_AXIS,
    data_axis: str | None = "data",
):
    """Forward pass of a DecoderLM with its layer stack pipelined over
    ``pipe_axis`` of ``mesh``.

    The global batch is split into ``n_micro`` microbatches (batch must
    divide evenly).  Embeddings / final LN / lm_head run outside the
    pipeline region under plain GSPMD.  Differentiable end-to-end.
    """
    from tpu_flash.parallel.context import current_context, set_parallel_context

    c = model.cfg
    B, L = idx.shape
    if B % n_micro:
        raise ValueError(f"batch {B} not divisible by n_micro {n_micro}")
    S = mesh.shape[pipe_axis]
    if c.n_layer % S:
        raise ValueError(f"n_layer {c.n_layer} not divisible by stages {S}")

    nkeys = 2
    k_emb, k_pipe = (jax.random.split(key, nkeys) if key is not None
                     else (None, None))

    x = model.token_embeddings(params["token_embeddings"], idx)
    if c.positional == "learned":
        positions = jnp.arange(L, dtype=jnp.int32)[None, :]
        x = x + model.position_embeddings(
            params["position_embeddings"], positions)
    # rope: MultiHeadAttention derives arange positions per microbatch
    # itself (the pipeline splits batch, not sequence, so local arange(L)
    # positions are the global ones).
    x = model.dropout({}, x, key=k_emb, training=training)

    # [n_micro, B/n_micro, L, E]
    micros = x.reshape(n_micro, B // n_micro, L, c.n_embd)

    stacked = stack_layer_params(params, c.n_layer)
    # Leading layer axis sharded over the pipe stages.
    stacked = jax.lax.with_sharding_constraint(
        stacked, NamedSharding(mesh, P(pipe_axis)))

    layer_apply = lambda lp, h, *, key, training: model.layers[0](
        lp, h, key=key, training=training)

    moe = c.moe is not None
    micro_spec = P(None, data_axis, None, None)
    loop = functools.partial(
        _pipeline_loop, layer_apply=layer_apply, axis_name=pipe_axis,
        n_micro=n_micro, training=training, moe=moe)

    # The op wrappers must not try to open their own shard_map while we are
    # already inside one (trace-time switch in ops/attention.py).
    out_spec = ((P(pipe_axis, data_axis, None, None) if data_axis
                 else P(pipe_axis)), P())
    prev_ctx = current_context()
    set_parallel_context(None)
    try:
        if k_pipe is None:
            outs, aux = jax.shard_map(
                lambda sp, mb: loop(sp, mb, None),
                mesh=mesh, in_specs=(P(pipe_axis), micro_spec),
                out_specs=out_spec, check_vma=False,
            )(stacked, micros)
        else:
            outs, aux = jax.shard_map(
                loop, mesh=mesh,
                in_specs=(P(pipe_axis), micro_spec, P()),
                out_specs=out_spec, check_vma=False,
            )(stacked, micros, k_pipe)
    finally:
        set_parallel_context(prev_ctx)

    # Stage S-1 holds the real outputs: outs is [S * n_micro, ...] stacked on
    # the pipe axis; take the last stage's slab.
    outs = outs.reshape(S, n_micro, B // n_micro, L, c.n_embd)[-1]
    x = outs.reshape(B, L, c.n_embd)

    x = model.ln(params["ln"], x)
    logits = model.lm_head(params["lm_head"], x)
    if return_aux:
        # Per-microbatch aux terms are means over B_m tokens; average over
        # microbatches to match DecoderLM's full-batch aux semantics.
        return logits, aux / n_micro
    return logits
