"""Flash-decode attention kernel over a (optionally quantized) KV-cache.

The serving-side counterpart of the training flash kernels and the core of
the north-star decode path: one new query token per sequence attends a long
cached prefix.  The reference has no decode path at all (its generate()
re-runs the full prefix per token, SURVEY.md §3.5).

Kernel design (decode is a *matvec* — bandwidth-bound, so the design is all
about the memory system, not the MXU):

  * grid (B, S_tiles) with key tiles innermost (sequential); each step
    streams one [H, block_s, d] tile — ALL heads of a sequence at once, so
    each DMA is megabytes, not hundreds of KB;
  * scores and outputs are batched bf16 MXU dots over all heads; an
    earlier version cast operands to fp32 for the dots, which runs the MXU
    at fp32 rate (~4x slower) and made the kernel lose to XLA — the bf16
    cast IS the dequant for int8/fp8 codes, and accumulation stays fp32;
  * online softmax state ([H, 1] running max/sum, [H, d] accumulator) lives
    in VMEM scratch across the key tiles of one sequence;
  * per-sequence prefix lengths arrive via scalar prefetch
    (PrefetchScalarGridSpec); tiles entirely beyond a sequence's length are
    skipped for compute AND for DMA — the index_map clamps out-of-range tile
    indices to the last in-range tile and Pallas elides the repeat fetch, so
    HBM traffic scales with the true prefix length, not the buffer size;
  * INT8/FP8 KV codes are streamed and dequantized against per-position
    scales folded into the [H, block_s] score/probability rows
    (``q·(codes*scale) == (q·codes)*scale`` and
    ``sum_j p_j (v_codes_j*scale_j) == sum_j (p_j*scale_j) v_codes_j``) —
    the cache stays quantized in HBM, halving/quartering decode's dominant
    bandwidth cost.
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
    round_up,
)

# 1024-key tiles x all heads = 0.5-2 MB DMAs; big enough to stream at full
# HBM rate, small enough that the fp32 broadcast intermediates fit VMEM.
DEFAULT_BLOCK_S = 1024

# Double-buffered K+V tile budget (bytes). Grid-step fixed costs are ~1.5us,
# so tiles must be large enough that their DMA time dominates; sweepable via
# `python bench/bench_decode.py --sweep-tiles` (measured flat at 378-385 GB/s
# from 512 through 4096-key tiles — the pattern's HBM ceiling, bench/RESULTS.md).
VMEM_TILE_BUDGET = 1 << 21


def _decode_kernel(
    lengths_ref,                                   # scalar prefetch [B]
    q_ref, k_ref, ks_ref, v_ref, vs_ref,           # inputs
    o_ref,                                         # output
    acc_ref, m_ref, l_ref,                         # scratch
    *, scale, block_s, num_s, quantized, window,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    length = lengths_ref[b]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    live = j * block_s < length
    if window is not None:
        # sliding window: only keys in (length - window, length) attend
        live = jnp.logical_and(live, (j + 1) * block_s > length - window)

    @pl.when(live)
    def _body():
        # All intermediates keep the [Hkv, g, *] layout — Mosaic cannot
        # relayout middle-singleton squeezes, so nothing is ever reshaped.
        # g is the query-group size (GQA); for MHA g == 1.  Grouped query
        # heads become the M dim of the per-KV-head matvec, so GQA also
        # improves MXU utilization.
        # Dots run in the query dtype: bf16 queries keep the MXU at native
        # bf16 rate (an earlier version cast everything to fp32, which runs
        # the MXU ~4x slower and lost to XLA); fp32 queries keep exact
        # parity.  For int8/fp8 codes the cast IS the dequant.
        cd = q_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                else jax.lax.Precision.DEFAULT)
        q = q_ref[0]                                # [Hkv, g, d]
        k = k_ref[0].astype(cd)                     # [Hkv, bs, d]
        v = v_ref[0].astype(cd)                     # [Hkv, bs, d]

        s = jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32)     # [Hkv, g, bs]
        if quantized:
            # [Hkv, 1, bs] broadcasts over the group dim
            s = s * ks_ref[0, :, :, pl.ds(j * block_s, block_s)]
        s = s * scale
        pos = j * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
        s = jnp.where(pos < length, s, MASK_VALUE)
        if window is not None:
            s = jnp.where(pos >= length - window, s, MASK_VALUE)

        m_prev, l_prev = m_ref[:], l_ref[:]         # [Hkv, g, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                      # [Hkv, g, bs]
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * vs_ref[0, :, :, pl.ds(j * block_s, block_s)]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))),
            precision=prec,
            preferred_element_type=jnp.float32)     # [Hkv, g, d]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(j == num_s - 1)
    def _epilogue():
        l_fin = l_ref[:]
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        o_ref[0] = (acc_ref[:] / l_safe).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_s", "window", "interpret"),
)
def flash_decode_attention(
    q: jax.Array,                 # [B, Hq, 1, d] queries (Hq = g * KV heads)
    k_cache: jax.Array,           # [B, H, S, d] fp / int8 / fp8 codes
    v_cache: jax.Array,
    lengths: jax.Array,           # [B] int32 valid prefix lengths
    k_scale: jax.Array | None = None,   # [B, H, 1, S] fp32, lane-major
    v_scale: jax.Array | None = None,
    *,
    scale: float | None = None,
    block_s: int = DEFAULT_BLOCK_S,
    window: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Single-token attention over the cache; returns [B, H, 1, d].

    ``window``: sliding-window decode — only the last ``window`` cached
    positions attend; tiles before the window repeat the first in-window
    tile index so their DMA is elided, making decode traffic O(window)
    regardless of prefix length."""
    if interpret is None:
        interpret = default_interpret()
    B, Hq, Lq, d = q.shape
    assert Lq == 1, "flash_decode_attention is the single-token path"
    H = k_cache.shape[1]                    # KV heads (GQA: H <= Hq)
    if Hq % H:
        raise ValueError(
            f"query heads ({Hq}) must be a multiple of KV heads ({H})")
    g = Hq // H
    S = k_cache.shape[2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))

    # Cap the key-tile footprint so double-buffered K+V tiles (plus the
    # resident scale slabs) stay inside VMEM for any cache dtype: fp32
    # caches halve the tile, int8/fp8 double it.
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    cap = 128
    while (2 * cap) * 2 * H * d * itemsize <= VMEM_TILE_BUDGET \
            and cap < (1 << 20):
        cap *= 2
    block_s = min(block_s, cap)
    block_s = min(block_s, round_up(S, 128))
    pS = round_up(S, block_s)
    if pS != S:
        pad = [(0, 0), (0, 0), (0, pS - S), (0, 0)]
        k_cache = jnp.pad(k_cache, pad)
        v_cache = jnp.pad(v_cache, pad)
        if k_scale is not None:
            spad = [(0, 0), (0, 0), (0, 0), (0, pS - S)]
            k_scale = jnp.pad(k_scale, spad)
            v_scale = jnp.pad(v_scale, spad)
    num_s = pS // block_s

    quantized = k_scale is not None
    if not quantized:
        # dummy 1-wide scale operands keep one kernel signature
        k_scale = jnp.ones((B, H, 1, 1), jnp.float32)
        v_scale = k_scale

    lengths = lengths.astype(jnp.int32)
    # Clamp out-of-range tiles onto the last in-range tile: Pallas skips the
    # DMA when a block index repeats, so masked tail tiles cost ~nothing.
    def kv_index(b, j, lengths_ref):
        last = jax.lax.max(
            (jax.lax.div(jax.lax.max(lengths_ref[b], 1) - 1, block_s)), 0)
        j = jax.lax.min(j, last)
        if window is not None:
            first = jax.lax.max(
                jax.lax.div(lengths_ref[b] - window, block_s), 0)
            j = jax.lax.max(j, jax.lax.min(first, last))
        return (b, 0, j, 0)

    # Scales: the full [H, S] slab is resident per b — constant block index
    # over the kv loop, so Pallas fetches it once per b instead of issuing
    # extra small DMAs every tile.
    def scale_index(b, j, lengths_ref):
        return (b, 0, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_s),
        in_specs=[
            pl.BlockSpec((1, H, g, d), lambda b, j, L: (b, 0, 0, 0)),
            pl.BlockSpec((1, H, block_s, d), kv_index),
            pl.BlockSpec((1, H, 1, pS if quantized else 1), scale_index),
            pl.BlockSpec((1, H, block_s, d), kv_index),
            pl.BlockSpec((1, H, 1, pS if quantized else 1), scale_index),
        ],
        out_specs=pl.BlockSpec((1, H, g, d), lambda b, j, L: (b, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((H, g, d), jnp.float32),
            pltpu.VMEM((H, g, 1), jnp.float32),
            pltpu.VMEM((H, g, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, scale=scale, block_s=block_s, num_s=num_s,
        quantized=quantized, window=window)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, H, g, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, q.reshape(B, H, g, d), k_cache, k_scale, v_cache, v_scale)
    return out.reshape(B, Hq, 1, d)
