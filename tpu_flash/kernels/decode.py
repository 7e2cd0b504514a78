"""Flash-decode attention kernel over a (optionally quantized) KV-cache.

The serving-side counterpart of the training flash kernels and the core of
the north-star decode path: one new query token per sequence attends a long
cached prefix.  The reference has no decode path at all (its generate()
re-runs the full prefix per token, SURVEY.md §3.5).

Kernel design (decode is a *matvec* — bandwidth-bound, so the design is all
about the memory system, not the MXU):

  * the cache is stored HEADS-MINOR, ``[B, S, H*d]``: one key tile is a
    single fully-contiguous ``[block_s, H*d]`` HBM slab.  The previous
    ``[B, H, S, d]`` layout fetched H strided 128 KB stripes per tile and
    topped out at ~380 GB/s; the contiguous layout streams at the chip's
    ~820 GB/s spec rate — measured 1.96x end-to-end (bench/exp_decode_hm.py,
    bench/exp_decode_layout.py, bench/RESULTS.md);
  * queries enter as a BLOCK-DIAGONAL matrix ``qbd [M, H*d]`` with
    ``qbd[h, h*d+i] = q[h, i] * softmax_scale`` so scores for all heads are
    ONE dot against the tile, ``s = qbd @ K_tile^T -> [M, block_s]``, with
    no transposes or reshapes of the streamed data; the epilogue extracts
    each head's stripe of ``acc = P @ V_tile -> [M, H*d]``.  Off-stripe
    garbage columns are never read.  GQA folds the g query heads of each KV
    head into g rows sharing one stripe, and SMALL MULTI-TOKEN queries
    (Lq > 1 — speculative-decoding verification) fold the same way: the
    per-KV-head row group is G = Lq * g rows (token-major within the
    group), each row carrying its own causal length limit
    ``length - Lq + i + 1`` — so verifying Lq draft tokens streams the
    cache ONCE (M = G * KV-heads, padded to a sublane multiple);
  * grid (B, S_tiles) with key tiles innermost (sequential); online-softmax
    state ([M, 1] running max/sum, [M, H*d] accumulator) lives in VMEM
    scratch across the key tiles of one sequence;
  * scores and outputs are batched bf16 MXU dots; an earlier version cast
    operands to fp32, which runs the MXU at fp32 rate (~4x slower) — the
    bf16 cast IS the dequant for int8/fp8 codes, accumulation stays fp32;
  * per-sequence prefix lengths arrive via scalar prefetch
    (PrefetchScalarGridSpec); tiles entirely beyond a sequence's length are
    skipped for compute AND for DMA — the index_map clamps out-of-range tile
    indices to the last in-range tile and Pallas elides the repeat fetch, so
    HBM traffic scales with the true prefix length, not the buffer size;
  * INT8/FP8 KV codes are streamed and dequantized against per-(head,
    position) scales folded into the [M, block_s] score/probability rows
    (``q·(codes*scale) == (q·codes)*scale`` and
    ``sum_j p_j (v_codes_j*scale_j) == sum_j (p_j*scale_j) v_codes_j``;
    each block-diagonal row only ever reads its own head's stripe, so the
    per-row scale is exact) — the cache stays quantized in HBM,
    halving/quartering decode's dominant bandwidth cost.  Scales stay
    per-KV-head ([Hpad, *] slabs, NOT one row per qbd row — that would
    grow VMEM residency g-fold under GQA); the kernel expands them to
    [M, block_s] with a tiny replication dot.  Small-slab caches keep the
    whole [Hpad, pS] slab resident per sequence (one DMA per b); past
    ``SCALE_RESIDENT_BUDGET`` the scales ride the same per-tile index map
    as K/V so VMEM stays bounded for arbitrarily long caches.

``flash_decode_attention`` accepts both layouts: 3-D ``[B, S, H*d]`` caches
(native; zero-copy from :class:`tpu_flash.inference.kv_cache.KVCache`) and
the legacy 4-D ``[B, H, S, d]`` (transposed on entry — fine for tests,
wasteful for serving).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.common import (
    MASK_VALUE,
    default_interpret,
    round_up,
    cast_codes,
)

# 1024-key tiles = 1-4 MB contiguous DMAs; big enough to stream at full
# HBM rate, small enough that double-buffered K+V tiles fit VMEM.
DEFAULT_BLOCK_S = 1024

# Double-buffered K+V tile budget (bytes). Grid-step fixed costs are ~1.5us,
# so tiles must be large enough that their DMA time dominates; sweepable via
# `python bench/bench_decode.py --sweep-tiles` (which passes block_s
# explicitly — this module-level default is read at trace time, so mutating
# it after a call has compiled does nothing).
VMEM_TILE_BUDGET = 1 << 21

# Per-sequence resident quantization-scale slabs ([Hpad, pS] fp32 x2) above
# this size switch to per-tile fetches so VMEM stays bounded at large S.
SCALE_RESIDENT_BUDGET = 1 << 21


def _decode_kernel(
    lengths_ref,                                   # scalar prefetch [B]
    qbd_ref, k_ref, ks_ref, v_ref, vs_ref,         # inputs
    o_ref,                                         # output
    acc_ref, m_ref, l_ref,                         # scratch
    *, block_s, num_s, quantized, scales_resident, window, M, Hpad, R, G,
    Lq, g, d,
):
    b = pl.program_id(0)
    j = pl.program_id(1)
    length = lengths_ref[b]

    def expand_scales(s_ref):
        """[Hpad, block_s] per-KV-head scale tile -> [M, block_s], one row
        per qbd row (row r reads KV head r // G).  A replication dot
        (rep[r, h] = (r//G == h)) instead of repeat/reshape: Mosaic
        cannot relayout middle-singleton squeezes, and the dot is tiny."""
        tile = (s_ref[0, :, pl.ds(j * block_s, block_s)] if scales_resident
                else s_ref[0])                          # [Hpad, bs]
        if G == 1:
            return tile                                 # M == Hpad
        r = jax.lax.broadcasted_iota(jnp.int32, (M, Hpad), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (M, Hpad), 1)
        rep = jnp.where(r // G == c, 1.0, 0.0)
        return jax.lax.dot_general(
            rep, tile, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)         # [M, bs]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    live = j * block_s < length
    if window is not None:
        # sliding window: the earliest position any query row attends is
        # (length - Lq + 1) - window (row i's window ends at its own limit)
        live = jnp.logical_and(
            live, (j + 1) * block_s > length - window - (Lq - 1))

    @pl.when(live)
    def _body():
        # Dots run in the query dtype: bf16 queries keep the MXU at native
        # bf16 rate; fp32 queries keep exact parity.  For int8/fp8 codes
        # the cast IS the dequant (scales applied to the [M, bs] rows).
        cd = qbd_ref.dtype
        prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
                else jax.lax.Precision.DEFAULT)
        qbd = qbd_ref[0]                            # [M, HD]
        k = cast_codes(k_ref[0], cd)                # [bs, HD]
        v = cast_codes(v_ref[0], cd)

        s = jax.lax.dot_general(
            qbd, k, (((1,), (1,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)     # [M, bs]
        if quantized:
            s = s * expand_scales(ks_ref)               # [M, bs]
        # Per-row causal limit: row (h, i, u) is query token i of Lq and
        # attends positions < length - Lq + i + 1 (Lq == 1 => pos < length).
        row1 = jax.lax.broadcasted_iota(jnp.int32, (M, 1), 0)
        limit = length - (Lq - 1) + (row1 % G) // g          # [M, 1]
        pos = j * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < limit, s, MASK_VALUE)
        if window is not None:
            s = jnp.where(pos >= limit - window, s, MASK_VALUE)

        m_prev, l_prev = m_ref[:], l_ref[:]         # [M, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)                      # [M, bs]
        # Rows that have seen nothing but mask (m_new == MASK_VALUE —
        # possible when lengths[b] < Lq makes a row's causal limit <= 0)
        # would otherwise turn exp(MASK - MASK) == 1 into a mean over the
        # tile; zero them so such rows output 0 (the Lq == 1 behavior for
        # lengths == 0).
        p = jnp.where(m_new > MASK_VALUE * 0.5, p, 0.0)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        if quantized:
            p = p * expand_scales(vs_ref)               # [M, bs]
        pv = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            precision=prec,
            preferred_element_type=jnp.float32)     # [M, HD]
        acc_ref[:] = acc_ref[:] * alpha + pv
        m_ref[:] = m_new

    @pl.when(j == num_s - 1)
    def _epilogue():
        # Stripe extraction: row r's output lives in KV head r//G's column
        # stripe; rows with the same in-group index u have disjoint
        # stripes, so a [R, M] selection dot (sel[u, m] = (m % G == u and
        # u < G)) collapses the masked accumulator to out[u, h*d+c] =
        # attention of group row u of KV head h in one tiny MXU op — no
        # 3-D reshapes (Mosaic cannot relayout middle-singleton squeezes)
        # and the R-row output padding falls out of the dot shape for
        # free.  Padding rows (r//G >= true KV head count) exceed any
        # col//d and are masked out before the dot.
        l_fin = l_ref[:]
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        HD = acc_ref.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (M, HD), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, HD), 1)
        masked = jnp.where((col // d) == (row // G),
                           acc_ref[:] / l_safe, 0.0)    # [M, HD]
        u = jax.lax.broadcasted_iota(jnp.int32, (R, M), 0)
        m = jax.lax.broadcasted_iota(jnp.int32, (R, M), 1)
        sel = jnp.where((m % G == u) & (u < G), 1.0, 0.0)
        o_ref[0] = jax.lax.dot_general(
            sel, masked, (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("scale", "block_s", "window", "interpret"),
)
def flash_decode_attention(
    q: jax.Array,                 # [B, Hq, Lq, d] queries (Hq = g * KV heads)
    k_cache: jax.Array,           # [B, S, H*d] (native) or [B, H, S, d]
    v_cache: jax.Array,           # fp / int8 / fp8 codes
    lengths: jax.Array,           # [B] int32 valid prefix lengths
    k_scale: jax.Array | None = None,   # [B, H, S] fp32 (or legacy [B,H,1,S])
    v_scale: jax.Array | None = None,
    *,
    scale: float | None = None,
    block_s: int = DEFAULT_BLOCK_S,
    window: int | None = None,
    interpret: bool | None = None,
) -> jax.Array:
    """Attention of the last Lq tokens over the cache; returns
    [B, Hq, Lq, d].

    Lq is normally 1 (plain decode).  Small Lq > 1 is the speculative-
    verification path: the Lq query tokens are the last Lq cached
    positions (query i attends positions < lengths - Lq + i + 1) and all
    of them ride ONE pass over the cache — Lq just multiplies the
    block-diagonal row group, not the HBM traffic.  Keep Lq small (the
    VMEM accumulator is [Lq*Hq-ish, H*d]); prompt-scale prefill belongs on
    the training flash kernel instead.

    ``window``: sliding-window decode — only the last ``window`` cached
    positions attend (per query row); tiles before the earliest window
    repeat the first in-window tile index so their DMA is elided, making
    decode traffic O(window) regardless of prefix length."""
    if interpret is None:
        interpret = default_interpret()
    B, Hq, Lq, d = q.shape
    if k_cache.ndim == 4:
        # legacy [B, H, S, d] layout: transpose into the native heads-minor
        # form (an extra pass over the cache — callers on the hot path keep
        # the cache heads-minor and skip this).
        Bk, H, S, dk = k_cache.shape
        k_cache = k_cache.transpose(0, 2, 1, 3).reshape(Bk, S, H * dk)
        v_cache = v_cache.transpose(0, 2, 1, 3).reshape(Bk, S, H * dk)
    HD = k_cache.shape[-1]
    if HD % d:
        raise ValueError(f"cache feature dim {HD} not a multiple of d={d}")
    H = HD // d                             # KV heads (GQA: H <= Hq)
    if Hq % H:
        raise ValueError(
            f"query heads ({Hq}) must be a multiple of KV heads ({H})")
    g = Hq // H
    S = k_cache.shape[1]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))
    if k_scale is not None and k_scale.ndim == 4:   # legacy [B, H, 1, S]
        k_scale = k_scale[:, :, 0, :]
        v_scale = v_scale[:, :, 0, :]

    # Row count: G = Lq*g rows per KV head (token-major within the group),
    # KV heads padded so M is a multiple of 8 (fp32 sublane granularity).
    # Output rows R likewise.
    G = Lq * g
    Hpad = H
    while G * Hpad < 8 or (G * Hpad) % 8:
        Hpad += 1
    M = G * Hpad
    R = round_up(G, 8)

    # Cap the key-tile footprint so double-buffered K+V tiles (plus the
    # resident scale slabs) stay inside VMEM for any cache dtype: fp32
    # caches halve the tile, int8/fp8 double it.
    itemsize = jnp.dtype(k_cache.dtype).itemsize
    cap = 128
    while (2 * cap) * 2 * HD * itemsize <= VMEM_TILE_BUDGET \
            and cap < (1 << 20):
        cap *= 2
    # fp8 needs no special tile cap anymore: the bit reconstruction
    # (common.fp8_e4m3_to_bf16) runs entirely in uint16, so its in-flight
    # temps cost the same 2 bytes/elt as int8's bf16 dequant cast (the old
    # int32/fp32 staging forced halved fp8 tiles and ~280 GB/s effective —
    # bench/exp_fp8_convert.py, RESULTS.md round-2).
    block_s = min(block_s, cap)
    block_s = min(block_s, round_up(S, 128))
    pS = round_up(S, block_s)
    if pS != S:
        k_cache = jnp.pad(k_cache, [(0, 0), (0, pS - S), (0, 0)])
        v_cache = jnp.pad(v_cache, [(0, 0), (0, pS - S), (0, 0)])
        if k_scale is not None:
            spad = [(0, 0), (0, 0), (0, pS - S)]
            k_scale = jnp.pad(k_scale, spad)
            v_scale = jnp.pad(v_scale, spad)
    num_s = pS // block_s

    quantized = k_scale is not None
    # Resident slabs (one DMA per sequence) while small; per-tile fetches
    # past the budget so VMEM stays bounded at large S * many heads.
    scales_resident = (quantized
                       and 2 * Hpad * pS * 4 <= SCALE_RESIDENT_BUDGET)
    if quantized:
        # scales stay per-KV-head; only pad the head axis to Hpad (zeros —
        # padding-row scores are discarded by the epilogue mask).  The
        # g-fold expansion to qbd rows happens in-kernel.
        if Hpad != H:
            pad = [(0, 0), (0, Hpad - H), (0, 0)]
            k_scale = jnp.pad(k_scale, pad)
            v_scale = jnp.pad(v_scale, pad)
    else:
        # dummy 1-wide scale operands keep one kernel signature
        k_scale = jnp.ones((B, Hpad, 1), jnp.float32)
        v_scale = k_scale

    # Block-diagonal scaled queries [B, M, HD]: row h*G + i*g + u carries
    # query head h*g+u, token i, in KV head h's column stripe; padding
    # rows (h >= H) are zero.
    nrows = H * G
    eye = np.zeros((M, HD), np.float32)
    for r in range(nrows):
        h = r // G
        eye[r, h * d:(h + 1) * d] = 1.0
    # [B, Hq, Lq, d] -> rows (h, i, u): [B, H, g, Lq, d] -> [B, H, Lq, g, d]
    qr = q.reshape(B, H, g, Lq, d).swapaxes(2, 3).reshape(B, nrows, d)
    qrows = jnp.tile(qr.astype(jnp.float32) * scale, (1, 1, H))
    qrows = jnp.pad(qrows, ((0, 0), (0, M - nrows), (0, 0)))
    qbd = (qrows * jnp.asarray(eye)[None]).astype(q.dtype)

    lengths = lengths.astype(jnp.int32)
    # Clamp out-of-range tiles onto the last in-range tile: Pallas skips the
    # DMA when a block index repeats, so masked tail tiles cost ~nothing.
    def kv_index(b, j, lengths_ref):
        last = jax.lax.max(
            (jax.lax.div(jax.lax.max(lengths_ref[b], 1) - 1, block_s)), 0)
        j = jax.lax.min(j, last)
        if window is not None:
            first = jax.lax.max(
                jax.lax.div(lengths_ref[b] - window - (Lq - 1), block_s), 0)
            j = jax.lax.max(j, jax.lax.min(first, last))
        return (b, j, 0)

    # Scales: small slabs are resident per b (constant block index over the
    # kv loop — Pallas fetches once per b instead of issuing extra small
    # DMAs every tile); large ones ride the clamped per-tile kv index.
    if scales_resident:
        scale_spec = pl.BlockSpec((1, Hpad, pS), lambda b, j, L: (b, 0, 0))
    elif quantized:
        scale_spec = pl.BlockSpec(
            (1, Hpad, block_s),
            lambda b, j, L: (kv_index(b, j, L)[0], 0, kv_index(b, j, L)[1]))
    else:
        scale_spec = pl.BlockSpec((1, Hpad, 1), lambda b, j, L: (b, 0, 0))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, num_s),
        in_specs=[
            pl.BlockSpec((1, M, HD), lambda b, j, L: (b, 0, 0)),
            pl.BlockSpec((1, block_s, HD), kv_index),
            scale_spec,
            pl.BlockSpec((1, block_s, HD), kv_index),
            scale_spec,
        ],
        out_specs=pl.BlockSpec((1, R, HD), lambda b, j, L: (b, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((M, HD), jnp.float32),
            pltpu.VMEM((M, 1), jnp.float32),
            pltpu.VMEM((M, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(
        _decode_kernel, block_s=block_s, num_s=num_s,
        quantized=quantized, scales_resident=scales_resident,
        window=window, M=M, Hpad=Hpad, R=R, G=G, Lq=Lq, g=g, d=d)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, R, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(lengths, qbd, k_cache, k_scale, v_cache, v_scale)
    # out[b, i*g+u, h*d+c] = head h*g+u, token i -> [B, Hq, Lq, d]
    out = out[:, :G].reshape(B, Lq, g, H, d).transpose(0, 3, 2, 1, 4)
    return out.reshape(B, Hq, Lq, d)
