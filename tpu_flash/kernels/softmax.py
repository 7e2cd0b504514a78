"""Fused masked attention-softmax Pallas kernels (forward + backward).

TPU-native equivalent of the reference's LightSeq-derived CUDA kernels
``launch_attn_softmax`` / ``launch_attn_softmax_bw``
(src/softmax_kernel.cu:236-296,360-440 in pdrebello/flash-attention-minitorch).

Semantics preserved exactly:
  * operates on [B, H, Lq, Lk] attention scores;
  * optional additive padding mask of shape [B, Lk] broadcast over heads and
    query positions (src/softmax_kernel.cu:52-88);
  * optional ``mask_future`` causal masking;
  * ``1e-8`` added to the softmax denominator (src/softmax_kernel.cu:12,114).

Differences by design: the reference dispatches over a compiled-in ladder of
block widths and *throws* for ``to_len > 1024`` (fw) / ``2048`` (bw)
(src/softmax_kernel.cu:277-279,413-424).  Here one kernel tiles rows over the
grid and keeps the full key axis in VMEM — no length ladder and no hard cap
below VMEM capacity; and the op is functional (out-of-place) rather than
mutating its input.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.common import (
    MASK_VALUE,
    default_interpret,
    pad_to,
    round_up,
)

SOFTMAX_EPS = 1e-8


def _pick_block_rows(n_rows: int, n_cols: int) -> int:
    """Choose a row-tile height that keeps ~2 MB of fp32 per input block."""
    budget = (2 * 1024 * 1024) // max(1, 4 * n_cols)
    block = max(8, min(512, budget - budget % 8))
    return min(block, round_up(n_rows, 8))


def _fwd_kernel(x_ref, mask_ref, out_ref, *, mask_future, block_r, kv_len,
                padded_kv, has_mask, q_offset):
    r = pl.program_id(2)
    x = x_ref[0, 0].astype(jnp.float32)                 # [br, Lk]
    if has_mask:
        x = x + mask_ref[0].astype(jnp.float32)      # [1, Lk] broadcast
    need_cols = mask_future or padded_kv
    if need_cols:
        cols = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
        if mask_future:
            # Diagonal aligned bottom-right: query i sees keys <= i + offset
            # (offset = Lk - Lq), matching ops.reference.causal_mask.
            rows = (q_offset + r * block_r
                    + jax.lax.broadcasted_iota(jnp.int32, x.shape, 0))
            x = jnp.where(cols <= rows, x, MASK_VALUE)
        if padded_kv:
            x = jnp.where(cols < kv_len, x, MASK_VALUE)
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    out_ref[0, 0] = (e / (jnp.sum(e, axis=-1, keepdims=True) + SOFTMAX_EPS)).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("mask_future", "interpret"))
def attn_softmax_forward(
    x: jax.Array,
    pad_mask: jax.Array | None = None,
    *,
    mask_future: bool = False,
    interpret: bool | None = None,
) -> jax.Array:
    """Masked softmax over the last axis of [B, H, Lq, Lk] scores."""
    if interpret is None:
        interpret = default_interpret()
    B, H, Lq, Lk = x.shape
    block_r = _pick_block_rows(Lq, Lk)
    pLq = round_up(Lq, block_r)
    pLk = round_up(Lk, 128)
    padded_kv = pLk != Lk

    xf = pad_to(pad_to(x, 2, pLq), 3, pLk)
    has_mask = pad_mask is not None
    # [B, 1, Lk]: the middle singleton makes the (1, 1, pLk) block legal
    # under Mosaic's last-two-dims tiling rule.
    maskf = (pad_to(pad_mask, 1, pLk) if has_mask
             else jnp.zeros((B, pLk), x.dtype))[:, None, :]

    kernel = functools.partial(
        _fwd_kernel, mask_future=mask_future, block_r=block_r,
        kv_len=Lk, padded_kv=padded_kv, has_mask=has_mask,
        q_offset=Lk - Lq)
    out = pl.pallas_call(
        kernel,
        grid=(B, H, pLq // block_r),
        in_specs=[
            pl.BlockSpec((1, 1, block_r, pLk), lambda b, h, r: (b, h, r, 0)),
            pl.BlockSpec((1, 1, pLk), lambda b, h, r: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_r, pLk), lambda b, h, r: (b, h, r, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, pLq, pLk), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(xf, maskf)
    return out[:, :, :Lq, :Lk]


def _bwd_kernel(p_ref, dp_ref, dx_ref):
    p = p_ref[0, 0].astype(jnp.float32)
    dp = dp_ref[0, 0].astype(jnp.float32)
    row = jnp.sum(dp * p, axis=-1, keepdims=True)
    dx_ref[0, 0] = (p * (dp - row)).astype(dx_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def attn_softmax_backward(
    prob: jax.Array, dprob: jax.Array, *, interpret: bool | None = None,
) -> jax.Array:
    """dx = P * (dP - rowsum(dP*P))  (src/softmax_kernel.cu:321-346)."""
    if interpret is None:
        interpret = default_interpret()
    B, H, Lq, Lk = prob.shape
    block_r = _pick_block_rows(Lq, Lk)
    pLq = round_up(Lq, block_r)
    pLk = round_up(Lk, 128)

    pf = pad_to(pad_to(prob, 2, pLq), 3, pLk)
    dpf = pad_to(pad_to(dprob, 2, pLq), 3, pLk)
    dx = pl.pallas_call(
        _bwd_kernel,
        grid=(B, H, pLq // block_r),
        in_specs=[
            pl.BlockSpec((1, 1, block_r, pLk), lambda b, h, r: (b, h, r, 0)),
            pl.BlockSpec((1, 1, block_r, pLk), lambda b, h, r: (b, h, r, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_r, pLk), lambda b, h, r: (b, h, r, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, pLq, pLk), prob.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        interpret=interpret,
    )(pf, dpf)
    return dx[:, :, :Lq, :Lk]
