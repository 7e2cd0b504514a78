"""Vocab-parallel fused lm_head + cross-entropy over the tensor axis.

The reference computes its loss on full materialized logits
(minitorch/nn.py:256-274, run_machine_translation.py loss path) on one GPU.
Under tensor parallelism the lm_head is vocab-sharded (sharding.py:89), and
the TPU-native loss is the Megatron-LM design: every shard turns its own
vocab slice into (max, sumexp, picked-logit) partials and ONE pmax + two
psums over the model axis merge them — no shard ever holds a full-vocab
logits row, and nothing [N, V]-sized crosses ICI (the collectives move
O(N) scalars).  Composed with the chunked online-logsumexp loss
(nn/functional.chunked_softmax_loss), per-shard peak memory is
O(N * V / (tp * n_chunks)).

Autodiff design: the custom_vjp sits OUTSIDE the shard_map — forward and
backward are each their own explicit shard_map with exactly the semantic
collectives (dx summed over the model axis, dw/db summed over the data
axis).  Differentiating THROUGH a ``check_vma=False`` shard_map instead
would compose any in-body psums with shard_map's transpose machinery
(cotangent division by axes unmentioned in out_specs + defensive psum over
axes unmentioned in in_specs), which double-counts in mesh-dependent ways.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from tpu_flash.nn import functional as F
from tpu_flash.parallel.context import ParallelContext, current_context


def vocab_parallel_softmax_loss(hidden: jax.Array, weight: jax.Array,
                                bias: jax.Array | None, labels: jax.Array,
                                *, n_chunks: int = 4,
                                ctx: ParallelContext | None = None
                                ) -> jax.Array:
    """Per-token cross-entropy of ``hidden @ weight + bias`` vs ``labels``.

    ``hidden`` [B, L, E] or [N, E]; ``weight`` [E, V] (the FULL logical
    lm_head — pass it vocab-sharded on the mesh and the shard_map in_spec
    keeps it that way, no gather); ``labels`` int [B, L] / [N].  Returns
    losses shaped like ``labels``, exactly ``softmax_loss(logits, labels)``
    in fp32.  Differentiable w.r.t. ``hidden``, ``weight`` and ``bias``
    under the surrounding jit/pjit (custom_vjp outside the shard_map).

    With no active parallel context (or model_size == 1, or a batch that
    does not divide the data axis) this degrades to the single-device
    chunked loss, so callers can use it unconditionally.
    """
    ctx = ctx or current_context()
    n_chunks = max(int(n_chunks), 1)
    B = labels.shape[0]
    if (ctx is None or ctx.model_size == 1
            or B % ctx.data_size != 0):
        return F.chunked_softmax_loss(hidden, weight, bias, labels,
                                      n_chunks=n_chunks)

    tp = ctx.model_size
    V = weight.shape[1]
    quantum = tp * n_chunks
    C = -(-V // quantum)
    pad = quantum * C - V
    w = jnp.pad(weight, ((0, 0), (0, pad)))
    b = (jnp.zeros((V,), jnp.float32) if bias is None
         else bias.astype(jnp.float32))
    # padded columns carry -inf bias -> exp() exactly 0 in the online lse
    b = jnp.pad(b, (0, pad), constant_values=-jnp.inf)
    static = (ctx.mesh, ctx.data_axis, ctx.model_axis, n_chunks)
    # dw/db of the jnp.pad transpose back to the unpadded V columns via
    # ordinary autodiff of the wrapper (pad transposes to slice).
    return _vp_loss(static, hidden, w, b, labels)


def _shard_base(w_local, model_axis):
    """This shard's first global vocab column id."""
    return (jax.lax.axis_index(model_axis)
            * w_local.shape[1]).astype(jnp.int32)


def _fwd_shard_map(static, x, w, b, y):
    mesh, data_axis, model_axis, n_chunks = static
    bspec = P(data_axis, *([None] * (x.ndim - 1)))
    lspec = P(data_axis, *([None] * (y.ndim - 1)))

    def body(xl, wl, bl, yl):
        lead = yl.shape
        xf = xl.reshape(-1, xl.shape[-1])
        yf = yl.reshape(-1).astype(jnp.int32)
        loss, lse = F._chunked_fwd(model_axis, n_chunks, xf, wl, bl, yf,
                                   _shard_base(wl, model_axis))
        return loss.reshape(lead), lse.reshape(lead)

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(bspec, P(None, model_axis), P(model_axis), lspec),
        out_specs=(lspec, lspec), check_vma=False)(x, w, b, y)


def _bwd_shard_map(static, x, w, b, y, lse, g):
    mesh, data_axis, model_axis, n_chunks = static
    bspec = P(data_axis, *([None] * (x.ndim - 1)))
    lspec = P(data_axis, *([None] * (y.ndim - 1)))

    def body(xl, wl, bl, yl, lsel, gl):
        xf = xl.reshape(-1, xl.shape[-1])
        yf = yl.reshape(-1).astype(jnp.int32)
        dx, dw, db = F._chunked_bwd_scan(
            n_chunks, xf, wl, bl, yf, _shard_base(wl, model_axis),
            lsel.reshape(-1), gl.reshape(-1).astype(jnp.float32))
        # dx: each model shard holds only its vocab slice's dlogits @ w^T
        # partial -> sum across the model axis.  dw/db: each data shard
        # summed only its local tokens -> sum across the data axis.
        dx = jax.lax.psum(dx, model_axis)
        dw = jax.lax.psum(dw, data_axis)
        db = jax.lax.psum(db, data_axis)
        return dx.reshape(xl.shape).astype(xl.dtype), dw, db

    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(bspec, P(None, model_axis), P(model_axis), lspec, lspec,
                  lspec),
        out_specs=(bspec, P(None, model_axis), P(model_axis)),
        check_vma=False)(x, w, b, y, lse, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _vp_loss(static, x, w, b, y):
    loss, _ = _fwd_shard_map(static, x, w, b, y)
    return loss


def _vp_loss_fwd(static, x, w, b, y):
    loss, lse = _fwd_shard_map(static, x, w, b, y)
    return loss, (x, w, b, y, lse)


def _vp_loss_bwd(static, res, g):
    x, w, b, y, lse = res
    dx, dw, db = _bwd_shard_map(static, x, w, b, y, lse, g)
    return (dx, dw.astype(w.dtype), db,
            np.zeros(y.shape, jax.dtypes.float0))


_vp_loss.defvjp(_vp_loss_fwd, _vp_loss_bwd)
