"""Pallas TPU flash-attention kernels (forward + backward).

TPU-native redesign of the reference CUDA kernels
(src/flash_attn2_fw.cpp, src/flash_attn2_bw.cpp, src/flash_attn_fw.cpp,
src/flash_attn_bw.cpp in pdrebello/flash-attention-minitorch):

* Forward — FlashAttention-2 loop order: the grid is
  ``(batch*heads, q_tiles, kv_tiles)`` with the kv dimension innermost
  ("arbitrary", i.e. sequential); the online-softmax state (unnormalized
  output accumulator, running max ``m`` and sum ``l``) lives in VMEM scratch
  that persists across the kv iterations of one q tile.  The epilogue divides
  by ``l`` once and emits both the logsumexp (FA2 residual) and the running
  max (so the FA1-style ``(l, m)`` residual pair is recoverable:
  ``l = exp(lse - m)``).

* Backward — no atomics (the reference accumulates dQ with ``atomicAdd``,
  src/flash_attn2_bw.cpp:228; TPU has none, and doesn't need them): the
  dK/dV pass runs a grid over kv tiles with the q dimension innermost and
  accumulates in VMEM scratch; an independent dQ pass runs the transposed
  grid.  ``P`` is recomputed from the saved logsumexp (``P = exp(S - L)``),
  and ``D = rowsum(dO * O)`` is precomputed in plain XLA.

* Causal block-skip — tiles entirely above the diagonal skip all compute via
  ``pl.when`` (the analog of the reference's ``-DCAUSAL_BLOCKSPARSE`` whole-
  tile skip, src/flash_attn_fw.cpp:88-92).

All compute is fp32 on the MXU regardless of input dtype; inputs may be
bf16.  Sequence lengths that are not multiples of the block size are handled
by the caller padding to the block size and passing the true ``kv_len`` here,
which is enforced with an in-kernel additive mask.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.common import (
    LANES,
    MASK_VALUE,
    cdiv,
    default_interpret,
    pad_to,
    round_up,
)

# 512x512 tiles measured fastest on v5e for both fw and bw (d=64/128);
# smaller sequences clamp to the (8-aligned) sequence length automatically.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _mask_scores(s, i, j, *, block_q, block_k, causal, kv_len, padded_kv,
                 q_offset=0):
    """Apply in-tile causal and kv-padding masks to a [bq, bk] score tile.

    ``q_offset = true_kv_len - true_q_len`` aligns the causal diagonal
    bottom-right (query i attends keys <= i + offset), matching
    ``ops.reference.causal_mask`` — the convention that makes single-token
    decode (Lq=1 against a long cache) attend the whole prefix.

    VPU masking only runs on tiles that actually need it: interior causal
    tiles (fully below the diagonal) and interior kv tiles take the untouched
    fast path through ``lax.cond``.
    """
    need_col_ids = causal or padded_kv
    if not need_col_ids:
        return s

    def apply_mask(s):
        cols = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        if causal:
            rows = q_offset + i * block_q + jax.lax.broadcasted_iota(
                jnp.int32, s.shape, 0)
            s = jnp.where(cols <= rows, s, MASK_VALUE)
        if padded_kv:
            s = jnp.where(cols < kv_len, s, MASK_VALUE)
        return s

    # Tile needs masking iff it crosses the diagonal (causal) or contains the
    # kv padding boundary.
    need = False
    if causal:
        # last col of tile > smallest row bound in tile
        need = (j + 1) * block_k - 1 > q_offset + i * block_q
    if padded_kv:
        need = jnp.logical_or(need, (j + 1) * block_k > kv_len)
    return jax.lax.cond(need, apply_mask, lambda s: s, s)


def _causal_block_live(i, j, *, block_q, block_k, q_offset):
    """False iff kv tile j is entirely above the causal diagonal for q tile i
    (the whole-tile skip of the reference's -DCAUSAL_BLOCKSPARSE build,
    src/flash_attn_fw.cpp:88-92)."""
    return j * block_k <= q_offset + i * block_q + block_q - 1


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    q_ref, k_ref, v_ref,              # inputs
    o_ref, lse_ref, m_out_ref,        # outputs
    acc_ref, m_ref, l_ref,            # VMEM scratch
    *, scale, causal, block_q, block_k, num_kv, kv_len, padded_kv, q_offset,
):
    i = pl.program_id(1)
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    # Causal block-skip: whole tile above the diagonal contributes nothing.
    run = True
    if causal:
        run = _causal_block_live(i, j, block_q=block_q, block_k=block_k,
                                 q_offset=q_offset)

    @pl.when(run)
    def _body():
        # Dots run in the input dtype (bf16 inputs hit the MXU at full bf16
        # rate; fp32 inputs keep fp32 MXU passes for parity) and always
        # accumulate fp32 via preferred_element_type.
        q = q_ref[0]                                # [bq, d]
        k = k_ref[0]                                # [bk, d]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale                                   # [bq, bk] fp32
        s = _mask_scores(
            s, i, j, block_q=block_q, block_k=block_k,
            causal=causal, kv_len=kv_len, padded_kv=padded_kv,
            q_offset=q_offset)

        m_prev = m_ref[:]                           # [bq, 1]
        l_prev = l_ref[:]
        m_cur = jnp.max(s, axis=-1, keepdims=True)  # [bq, 1]
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)             # rescale of the old state
        p = jnp.exp(s - m_new)                      # [bq, bk]
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

        v = v_ref[0]                                # [bk, d]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                           # [bq, d] fp32
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new
        l_ref[:] = l_new

    @pl.when(j == num_kv - 1)
    def _epilogue():
        m_fin = m_ref[:]
        l_fin = l_ref[:]
        # Fully-masked rows (query padding) have l == 0; guard the division.
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)
        # lse/m outputs carry a trailing singleton dim so the (1, block_q, 1)
        # block satisfies Mosaic's tiling rule (last dim == array dim).
        lse_ref[0] = m_fin + jnp.log(l_safe)        # L = m + log l
        m_out_ref[0] = m_fin


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret"),
)
def flash_attention_forward(
    q: jax.Array, k: jax.Array, v: jax.Array,
    *,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
):
    """Flash-attention forward over [B, H, L, d] inputs.

    Returns ``(out, lse, m)`` with ``out`` in the input dtype and
    ``lse``/``m`` fp32 of shape [B, H, L]: the FA2 residual (logsumexp) plus
    the running max so callers can reconstruct the FA1 ``(l, m)`` pair.
    """
    if interpret is None:
        interpret = default_interpret()
    B, H, Lq, d = q.shape
    Lk = k.shape[-2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))

    block_q = min(block_q, round_up(Lq, 8))
    block_k = min(block_k, round_up(Lk, 8))
    pLq, pLk = round_up(Lq, block_q), round_up(Lk, block_k)
    padded_kv = pLk != Lk

    qf = pad_to(q.reshape(B * H, Lq, d), 1, pLq)
    kf = pad_to(k.reshape(B * H, Lk, d), 1, pLk)
    vf = pad_to(v.reshape(B * H, Lk, d), 1, pLk)

    num_q, num_kv = pLq // block_q, pLk // block_k
    grid = (B * H, num_q, num_kv)

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        num_kv=num_kv, kv_len=Lk, padded_kv=padded_kv, q_offset=Lk - Lq,
    )
    out, lse, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
            jax.ShapeDtypeStruct((B * H, pLq, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * H, pLq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)

    out = out[:, :Lq].reshape(B, H, Lq, d)
    lse = lse[:, :Lq, 0].reshape(B, H, Lq)
    m = m[:, :Lq, 0].reshape(B, H, Lq)
    return out, lse, m


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_dkv_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, causal, block_q, block_k, num_q, kv_len, padded_kv, q_offset,
):
    j = pl.program_id(1)   # kv tile (outer)
    i = pl.program_id(2)   # q tile (inner, sequential)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    run = True
    if causal:
        run = _causal_block_live(i, j, block_q=block_q, block_k=block_k,
                                 q_offset=q_offset)

    @pl.when(run)
    def _body():
        q = q_ref[0]                                # [bq, d]
        k = k_ref[0]                                # [bk, d]
        v = v_ref[0]                                # [bk, d]
        do = do_ref[0]                              # [bq, d]
        lse = lse_ref[0]                            # [bq, 1] fp32
        delta = delta_ref[0]                        # [bq, 1] fp32

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = _mask_scores(
            s, i, j, block_q=block_q, block_k=block_k,
            causal=causal, kv_len=kv_len, padded_kv=padded_kv,
            q_offset=q_offset)
        p = jnp.exp(s - lse)                        # [bq, bk]

        # dV += P^T dO
        dv_acc[:] += jax.lax.dot_general(
            p.astype(do.dtype), do, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        # dP = dO V^T ; dS = P (dP - D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        # dK += tau dS^T Q
        dk_acc[:] += scale * jax.lax.dot_general(
            ds.astype(q.dtype), q, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(i == num_q - 1)
    def _epilogue():
        dk_ref[0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *, scale, causal, block_q, block_k, num_kv, kv_len, padded_kv, q_offset,
):
    i = pl.program_id(1)   # q tile (outer)
    j = pl.program_id(2)   # kv tile (inner, sequential)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    run = True
    if causal:
        run = _causal_block_live(i, j, block_q=block_q, block_k=block_k,
                                 q_offset=q_offset)

    @pl.when(run)
    def _body():
        q = q_ref[0]
        k = k_ref[0]
        v = v_ref[0]
        do = do_ref[0]
        lse = lse_ref[0]                            # [bq, 1] fp32
        delta = delta_ref[0]                        # [bq, 1] fp32

        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale
        s = _mask_scores(
            s, i, j, block_q=block_q, block_k=block_k,
            causal=causal, kv_len=kv_len, padded_kv=padded_kv,
            q_offset=q_offset)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        # dQ += tau dS K
        dq_acc[:] += scale * jax.lax.dot_general(
            ds.astype(k.dtype), k, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(j == num_kv - 1)
    def _epilogue():
        dq_ref[0] = dq_acc[:].astype(dq_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "interpret"),
)
def flash_attention_backward(
    q: jax.Array, k: jax.Array, v: jax.Array,
    o: jax.Array, lse: jax.Array, do: jax.Array,
    *,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    interpret: bool | None = None,
):
    """Flash-attention backward: returns (dq, dk, dv) for [B, H, L, d] inputs.

    Two race-free passes (dK/dV then dQ) replace the reference's atomicAdd
    accumulation (src/flash_attn2_bw.cpp:228).  Works for both the FA1 and
    FA2 residual conventions because ``(1/l)·exp(S-m) == exp(S-lse)`` with
    ``lse = m + log l``.
    """
    if interpret is None:
        interpret = default_interpret()
    B, H, Lq, d = q.shape
    Lk = k.shape[-2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))

    block_q = min(block_q, round_up(Lq, 8))
    block_k = min(block_k, round_up(Lk, 8))
    pLq, pLk = round_up(Lq, block_q), round_up(Lk, block_k)
    padded_kv = pLk != Lk

    # D_i = sum_d dO * O — plain XLA, fused into one pass over dO/O.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)

    qf = pad_to(q.reshape(B * H, Lq, d), 1, pLq)
    kf = pad_to(k.reshape(B * H, Lk, d), 1, pLk)
    vf = pad_to(v.reshape(B * H, Lk, d), 1, pLk)
    dof = pad_to(do.reshape(B * H, Lq, d), 1, pLq)
    lsef = pad_to(lse.reshape(B * H, Lq, 1), 1, pLq)
    deltaf = pad_to(delta.reshape(B * H, Lq, 1), 1, pLq)

    num_q, num_kv = pLq // block_q, pLk // block_k

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        num_q=num_q, kv_len=Lk, padded_kv=padded_kv, q_offset=Lk - Lq,
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid=(B * H, num_kv, num_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),   # q
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),   # k
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),   # v
            pl.BlockSpec((1, block_q, d), lambda b, j, i: (b, i, 0)),   # do
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),   # lse
            pl.BlockSpec((1, block_q, 1), lambda b, j, i: (b, i, 0)),   # delta
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, j, i: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLk, d), k.dtype),
            jax.ShapeDtypeStruct((B * H, pLk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, deltaf)

    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        num_kv=num_kv, kv_len=Lk, padded_kv=padded_kv, q_offset=Lk - Lq,
    )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(B * H, num_q, num_kv),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),   # q
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),   # k
            pl.BlockSpec((1, block_k, d), lambda b, i, j: (b, j, 0)),   # v
            pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),   # do
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),   # lse
            pl.BlockSpec((1, block_q, 1), lambda b, i, j: (b, i, 0)),   # delta
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, i, j: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf, dof, lsef, deltaf)

    dq = dq[:, :Lq].reshape(B, H, Lq, d)
    dk = dk[:, :Lk].reshape(B, H, Lk, d)
    dv = dv[:, :Lk].reshape(B, H, Lk, d)
    return dq, dk, dv
