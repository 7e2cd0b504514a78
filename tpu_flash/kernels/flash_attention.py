"""Pallas TPU flash-attention kernels (forward + backward).

TPU-native redesign of the reference CUDA kernels
(src/flash_attn2_fw.cpp, src/flash_attn2_bw.cpp, src/flash_attn_fw.cpp,
src/flash_attn_bw.cpp in pdrebello/flash-attention-minitorch):

* Forward — FlashAttention-2 loop order: one pass of KV tiles per Q tile with
  the online-softmax state (unnormalized output accumulator and running max)
  in VMEM scratch.  The epilogue divides by ``l`` once and emits both the
  logsumexp (FA2 residual) and the running max (so the FA1-style ``(l, m)``
  residual pair is recoverable: ``l = exp(lse - m)``).

* Backward — no atomics (the reference accumulates dQ with ``atomicAdd``,
  src/flash_attn2_bw.cpp:228; TPU has none, and doesn't need them): the
  dK/dV pass runs KV tiles outer with Q inner and accumulates in VMEM
  scratch; an independent dQ pass runs the transposed order.  ``P`` is
  recomputed from the saved logsumexp (``P = exp(S - L)``), and
  ``D = rowsum(dO * O)`` is precomputed in plain XLA.

TPU-specific performance structure (the parts that differ from a CUDA
translation):

* **Packed tile schedule.**  Instead of a dense rectangular grid with
  in-kernel skips (the reference's ``-DCAUSAL_BLOCKSPARSE`` whole-tile skip,
  src/flash_attn_fw.cpp:88-92 — which on TPU would still burn a pipeline
  step + DMA per dead tile), the live (q_tile, kv_tile) pairs are enumerated
  at trace time and streamed through a ``PrefetchScalarGridSpec``: the grid
  is exactly the live tiles, and the prefetched index maps steer the block
  DMAs.  Causal attention therefore does ~half the grid steps of the dense
  version, and KV padding tiles are never visited at all.

* **exp2 softmax.**  ``softmax_scale * log2(e)`` is folded into Q once per
  tile, the online softmax runs in base 2 (the VPU's native exponent), and
  the epilogue converts the logsumexp back to natural log.

* **``l`` rides the MXU.**  For head dims where ``d+1`` stays within the
  same 128-lane group, V is augmented with a ones column so the softmax
  normalizer comes out of the P·V matmul for free (the MXU pass is already
  half-empty at d=64) instead of a slow cross-lane VPU reduction.

All softmax/accumulation arithmetic is fp32 regardless of input dtype; the
MXU dots run in the input dtype (bf16 in, fp32 accumulate).  Sequence
lengths that are not multiples of the block size are handled by padding and
an in-kernel additive mask over the true ``kv_len``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.common import (
    LANES,
    MASK_VALUE,
    default_interpret,
    pad_to,
    round_up,
)

# Measured on v5e (d=64/128, L=2k-8k, causal+dense): the forward prefers two
# PACKED 512-row Q sub-tiles per grid step against 1024-col KV tiles (42.3 vs
# 38.9 TFLOP/s for one 1024-row tile: the two independent QK->softmax->PV
# chains let one half's VPU softmax overlap the other half's MXU dots — see
# ``q_pack`` below); the fused backward prefers 512x512 (52 vs 46-47 TFLOP/s
# against 512x1024, stable across 3 interleaved rounds; an earlier sweep
# recorded the opposite ranking — day-to-day chip variance, re-measure before
# trusting either).  Packing the backward the same way measured neutral
# (bench/exp_bw_interleave.py), so it stays single-chain.  Smaller sequences
# clamp to the (8-aligned) length.
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 1024
DEFAULT_Q_PACK = 2
DEFAULT_BLOCK_Q_BWD = 512
DEFAULT_BLOCK_K_BWD = 512

LOG2E = 1.4426950408889634
# The reference masks by *setting* scores to -1e7 (src/flash_attn_fw.cpp:
# 152-159); in base-2 score space the same constant is scaled by log2(e).
MASK2 = MASK_VALUE * LOG2E

_FIRST, _LAST, _MASK, _LIVE = 1, 2, 4, 8


def _dot(a, b, dims):
    """dot_general with fp32 accumulation and dtype-pinned precision:
    fp32 operands always contract exactly (parity mode must not degrade to
    bf16 passes), bf16 operands always run at native bf16 MXU rate — both
    independent of the ambient ``jax_default_matmul_precision``."""
    precision = (jax.lax.Precision.HIGHEST if a.dtype == jnp.float32
                 else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(
        a, b, (dims, ((), ())),
        precision=precision, preferred_element_type=jnp.float32)


def _tile_schedule(num_q, num_kv, *, block_q, block_k, causal, q_offset,
                   kv_len, kv_outer=False, window=None):
    """Trace-time schedule of (q_tile, kv_tile) visits.

    Returns int32 numpy arrays ``(imap, jmap, flags)`` where flags packs
    FIRST (reset accumulators), LAST (write outputs), MASK (tile crosses the
    causal diagonal or the kv-length boundary; informational — masks are
    applied unconditionally because a lax.cond around the mask measures far
    slower than the mask itself) and LIVE (tile contributes;
    dead tiles appear only as forced visits so every output block is written
    at least once, and their bodies are skipped entirely).

    The schedule is the TPU replacement for both the reference's whole-tile
    causal skip and its dense grid: dead tiles cost nothing — no grid step,
    no DMA.
    """
    def live(i, j):
        if j * block_k >= kv_len:
            return False          # kv padding tile
        if not causal:
            return True
        if j * block_k > q_offset + (i + 1) * block_q - 1:
            return False
        if window is not None and \
                (j + 1) * block_k - 1 <= q_offset + i * block_q - window:
            return False
        return True

    def needs_mask(i, j):
        need = (j + 1) * block_k > kv_len
        if causal:
            need = need or ((j + 1) * block_k - 1 > q_offset + i * block_q)
        return need

    entries = []
    if kv_outer:
        for j in range(num_kv):
            is_ = [i for i in range(num_q) if live(i, j)]
            forced = not is_
            if forced:
                is_ = [num_q - 1]
            for idx, i in enumerate(is_):
                f = (_FIRST if idx == 0 else 0) \
                    | (_LAST if idx == len(is_) - 1 else 0) \
                    | (0 if forced else _LIVE) \
                    | (_MASK if (not forced and needs_mask(i, j)) else 0)
                entries.append((i, j, f))
    else:
        for i in range(num_q):
            js = [j for j in range(num_kv) if live(i, j)]
            forced = not js
            if forced:
                js = [0]
            for idx, j in enumerate(js):
                f = (_FIRST if idx == 0 else 0) \
                    | (_LAST if idx == len(js) - 1 else 0) \
                    | (0 if forced else _LIVE) \
                    | (_MASK if (not forced and needs_mask(i, j)) else 0)
                entries.append((i, j, f))
    arr = np.asarray(entries, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2]


def _packed_schedule(num_groups, num_kv, *, block_q, block_k, causal,
                     q_offset, kv_len, q_pack, window=None):
    """Trace-time schedule for the forward: one visit list of
    ``(q_group, kv_tile)`` where a group packs ``q_pack`` consecutive
    ``block_q``-row sub-tiles.  Flags carry FIRST/LAST (accumulator reset /
    output write for the group) plus one LIVE bit per sub-tile
    (``_LIVE << h``), so a KV tile beyond sub-tile h's causal range — or,
    with ``window``, BEFORE its sliding window — skips that half's compute
    entirely (the whole-tile analog of Mistral-style local attention).
    ``q_pack=1`` reduces to the classic per-tile schedule."""
    def half_live(g, h, j):
        if j * block_k >= kv_len:
            return False
        if not causal:
            return True
        first_row = q_offset + (g * q_pack + h) * block_q
        last_row = q_offset + (g * q_pack + h + 1) * block_q - 1
        if j * block_k > last_row:
            return False
        if window is not None and (j + 1) * block_k - 1 <= first_row - window:
            return False          # tile entirely behind the sliding window
        return True

    entries = []
    for g in range(num_groups):
        js = [j for j in range(num_kv)
              if any(half_live(g, h, j) for h in range(q_pack))]
        forced = not js
        if forced:
            js = [0]
        for idx, j in enumerate(js):
            f = (_FIRST if idx == 0 else 0) \
                | (_LAST if idx == len(js) - 1 else 0)
            if not forced:
                for h in range(q_pack):
                    if half_live(g, h, j):
                        f |= _LIVE << h
            entries.append((g, j, f))
    arr = np.asarray(entries, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2]


def _apply_mask(s2, i, j, *, block_q, block_k, causal, kv_len, q_offset,
                window=None, qseg=None, kseg=None):
    """Causal / kv-boundary / sliding-window / segment mask on a base-2
    score tile.

    ``q_offset = true_kv_len - true_q_len`` aligns the causal diagonal
    bottom-right (query i attends keys <= i + offset), matching
    ``ops.reference.causal_mask`` — the convention that makes single-token
    decode (Lq=1 against a long cache) attend the whole prefix.  With
    ``window`` (requires causal), row r attends only keys in
    ``(r - window, r]``.  With ``qseg``/``kseg`` ([bq, 1] / [1, bk] int32
    segment-id tiles), rows attend only keys of the SAME segment — the
    packed-sequence (block-diagonal) form used to train on concatenated
    examples without cross-contamination.
    """
    cols = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 1)
    if causal:
        rows = q_offset + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s2.shape, 0)
        s2 = jnp.where(cols <= rows, s2, MASK2)
        if window is not None:
            s2 = jnp.where(cols > rows - window, s2, MASK2)
    if qseg is not None:
        s2 = jnp.where(qseg == kseg, s2, MASK2)
    s2 = jnp.where(cols < kv_len, s2, MASK2)
    return s2


def _fold_l(d: int) -> bool:
    """True when the ones column fits in the same 128-lane group as V, so the
    softmax normalizer can ride the (otherwise half-empty) P·V MXU pass."""
    return round_up(d + 1, LANES) == round_up(d, LANES)


def _pad_contract(x, d):
    """Zero-pad the minor (contraction) dim of a VMEM tile to a full lane
    group.  Measured on v5e: a K=64 bf16 contraction runs the MXU at ~53
    TFLOP/s while K=128 runs at ~154 — padding the contraction with zeros
    costs 2x the macs yet is ~1.5x faster in wall clock.  The concat is a
    handful of vreg copies in VMEM (no HBM traffic)."""
    target = round_up(d, LANES)
    if d == target:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], target - d), x.dtype)], axis=1)


def _dequant_tile(codes, scale_ref, dot_dtype):
    """Dequantize an int8/fp8 KV tile in VMEM against per-position scales
    ([bk, 1], broadcast over d) and cast to the dot dtype — the fused-dequant
    form of BASELINE's INT8-KV FA2: codes stream from HBM at 1/2 (1/4 for
    fp32 training) the bandwidth and fp values never exist outside VMEM."""
    return (codes.astype(jnp.float32) * scale_ref[0]).astype(dot_dtype)


def _ones_col(x):
    """Append a ones column: an N=64-output MXU dot measures ~67 TFLOP/s on
    v5e but N=65 measures ~117, so dots whose outputs are [*, d=64]
    accumulators run faster with a (discarded) 65th column — and the column
    is ones rather than zeros so the same trick doubles as the softmax-sum
    accumulator in the forward."""
    return jnp.concatenate(
        [x, jnp.ones((x.shape[0], 1), x.dtype)], axis=1)


def dropout_keep_mask(rows, cols, bh, seed, rate):
    """Deterministic attention-dropout keep mask from a counter-based hash.

    The TPU-native analog of FlashAttention's philox-counter dropout: the
    mask for position (row, col) of head ``bh`` is a pure function of the
    indices and a seed, so the backward pass REGENERATES it exactly instead
    of storing an [Lq, Lk] mask (which would defeat the flash memory
    footprint).  Plain uint32 multiply/xor/shift (murmur3-style fmix
    finalizer) rather than ``pltpu.prng_*``: identical bits in interpret
    mode (CPU tests) and compiled Mosaic, and recomputable from plain jnp
    for the test oracle (``ops.reference.dropout_keep_oracle``).

    ``rows``/``cols`` are int32 GLOBAL indices (broadcastable to the tile
    shape), ``bh`` the flattened batch·head index, ``seed`` int32; returns
    bool keep mask with P(keep) = 1 - rate.
    """
    h = (rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ cols.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         ^ (jnp.asarray(bh).astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
         ^ jnp.asarray(seed).astype(jnp.uint32))
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    h = h * jnp.uint32(0x846CA68B)
    h = h ^ (h >> 16)
    return h >= jnp.uint32(min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1))


def _tile_keep_scale(i_tile, j_tile, shape, *, block_q, block_k, bh, seed,
                     rate):
    """keep/(1-rate) multiplier tile for (q tile, kv tile): 0 where dropped."""
    rows = i_tile * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    cols = j_tile * block_k + jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    keep = dropout_keep_mask(rows, cols, bh, seed, rate)
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)), jnp.float32(0.0))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    imap_ref, jmap_ref, flags_ref, seed_ref,  # prefetched schedule + seed
    q_ref, k_ref, v_ref, ks_ref, vs_ref,   # inputs (scales used if quantized)
    qseg_ref, kseg_ref,               # segment ids (dummies if not segmented)
    o_ref, lse_ref, m_out_ref,        # outputs
    acc_ref, m_ref, l_ref,            # VMEM scratch (l_ref only if not fold_l)
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d,
    quantized, q_pack, dropout_rate, window, segmented,
):
    t = pl.program_id(1)
    bh = pl.program_id(0)   # hoisted: program_id inside pl.when bodies is
    flags = flags_ref[t]    # not substitutable by the interpreter
    fold_l = l_ref is None

    @pl.when((flags & _FIRST) != 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        if not fold_l:
            l_ref[:] = jnp.zeros_like(l_ref)

    # The KV tile is shared by every packed Q sub-tile: dequantize/augment it
    # once.  (On forced visits — groups with no live sub-tile, scheduled only
    # so the output block gets written — this computes on an arbitrary tile
    # and is discarded; such visits exist only for fully-masked groups.)
    kt = (_dequant_tile(k_ref[0], ks_ref, q_ref.dtype) if quantized
          else k_ref[0])
    kp = _pad_contract(kt, d)                       # [bk, d128]
    vt = (_dequant_tile(v_ref[0], vs_ref, q_ref.dtype) if quantized
          else v_ref[0])                            # [bk, d]
    v_aug = _ones_col(vt) if fold_l else vt

    def scores(h):
        # Fold softmax scale and the base-2 conversion into Q: one cheap
        # [bq, d] multiply instead of per-score work, then bf16 (or input
        # dtype) dots on the MXU with fp32 accumulation.
        sel = pl.ds(h * block_q, block_q)
        q = (q_ref[0, sel].astype(jnp.float32) * (scale * LOG2E)).astype(
            q_ref.dtype)                            # [bq, d]
        s2 = _dot(_pad_contract(q, d), kp, ((1,), (1,)))  # [bq, bk]
        if causal or padded_kv or segmented:
            s2 = _apply_mask(
                s2, imap_ref[t] * q_pack + h, jmap_ref[t],
                block_q=block_q, block_k=block_k, causal=causal,
                kv_len=kv_len, q_offset=q_offset, window=window,
                qseg=qseg_ref[0, sel] if segmented else None,
                kseg=kseg_ref[0] if segmented else None)
        return s2

    def chain(s2, h):
        sel = pl.ds(h * block_q, block_q)
        m_prev = m_ref[sel]                         # [bq, 1]
        m_cur = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)            # rescale of the old state
        p = jnp.exp2(s2 - m_new)                    # [bq, bk] fp32

        if dropout_rate > 0.0:
            # Attention dropout: drop entries of the (normalized) P AFTER
            # the softmax — so the normalizer l accumulates the UNDROPPED p
            # (which is why fold_l is disabled under dropout) and only the
            # P·V accumulation sees the mask.  Regenerated identically in
            # the backward from the same (row, col, head, seed) hash.
            p_v = p * _tile_keep_scale(
                imap_ref[t] * q_pack + h, jmap_ref[t], s2.shape,
                block_q=block_q, block_k=block_k, bh=bh,
                seed=seed_ref[0], rate=dropout_rate)
        else:
            p_v = p
        pb = p_v.astype(v_aug.dtype)
        # fold_l: ones column — rowsum(p) rides the same MXU pass.
        pv = _dot(pb, v_aug, ((1,), (0,)))          # [bq, d(+1)] fp32
        acc_ref[sel] = acc_ref[sel] * alpha + pv
        if not fold_l:
            l_ref[sel] = (alpha * l_ref[sel]
                          + jnp.sum(p, axis=-1, keepdims=True))
        m_ref[sel] = m_new

    # One online-softmax chain per packed sub-tile.  The chains are
    # independent (disjoint accumulator rows); in the common all-live case
    # EVERY sub-tile's QK dot is issued before the first softmax, so
    # sub-tile h+1's MXU dots overlap sub-tile h's VPU softmax — the
    # measured cure for the serialized QK->softmax->PV chain of the
    # single-tile body.  (Ordering matters: one pl.when per half, each
    # containing its full dot->softmax->PV chain, measures no faster than
    # the unpacked kernel.)
    live = [(flags & (_LIVE << h)) != 0 for h in range(q_pack)]
    if q_pack == 1:
        @pl.when(live[0])
        def _single():
            chain(scores(0), 0)
    else:
        all_live = functools.reduce(jnp.logical_and, live)

        @pl.when(all_live)
        def _all():
            tiles = [scores(h) for h in range(q_pack)]
            for h, s2 in enumerate(tiles):
                chain(s2, h)

        # Without a window, liveness is monotonic in h (sub-tile h+1 ends on
        # a later row, so every KV tile live for h is live for h+1): the
        # only partial states are live suffixes and sub-tile 0 needs no
        # partial branch.  A sliding window BREAKS this (a lower sub-tile
        # can attend a tile the upper one has slid past), so every sub-tile
        # gets a branch then.
        for h in range(0 if window is not None else 1, q_pack):
            @pl.when(live[h] & jnp.logical_not(all_live))
            def _partial(h=h):
                chain(scores(h), h)

    @pl.when((flags & _LAST) != 0)
    def _epilogue():
        if fold_l:
            acc = acc_ref[:]
            out, l_fin = acc[:, :d], acc[:, d:d + 1]
        else:
            out, l_fin = acc_ref[:], l_ref[:]
        # Empty-attention convention: rows with NO visible keys (every score
        # masked to MASK2, or the whole q tile dead and never visited) emit
        # out = 0 and lse = -inf — the same "empty partial" encoding the
        # sequence-parallel merge uses, and backward treats such rows as
        # exact zeros.  This intentionally differs from a plain softmax over
        # -1e7 scores (uniform attention); the reference never supports
        # these rows at all (it asserts Lq == Lk, cuda_kernel_ops.py:531).
        # Real scores are |q||k|/sqrt(d)-bounded, orders of magnitude above
        # the MASK2 threshold.
        m_fin = m_ref[:]
        empty = m_fin <= MASK2 + 1.0    # all-masked (== MASK2) or -inf
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        o_ref[0] = jnp.where(empty, 0.0, out / l_safe).astype(o_ref.dtype)
        # Back to natural log for the saved residuals:
        # lse = m2/log2(e) + ln(l),  m = m2/log2(e).
        m_nat = m_fin * (1.0 / LOG2E)
        lse_ref[0] = jnp.where(empty, -jnp.inf, m_nat + jnp.log(l_safe))
        m_out_ref[0] = jnp.where(empty, -jnp.inf, m_nat)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "q_pack",
                     "dropout_rate", "window", "interpret"),
)
def flash_attention_forward(
    q: jax.Array, k: jax.Array, v: jax.Array,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    *,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
    q_pack: int | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int = 0,
    window: int | None = None,
    segment_ids: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Flash-attention forward over [B, H, L, d] inputs.

    ``segment_ids`` ([B, L] int32, requires Lq == Lk): packed-sequence
    attention — position i attends position j only when their segment ids
    are equal (composed with the causal/window masks).  This is how multiple
    examples are trained in one row without padding waste or
    cross-contamination; new capability vs the reference (whose collate
    pads every row to model_max_length, run_machine_translation.py:87-154).

    ``window`` (requires ``causal``): sliding-window/local attention — row r
    attends keys in ``(r - window, r]``; KV tiles entirely behind the
    window are never visited (no grid step, no DMA), so compute and HBM
    traffic are O(L·window) instead of O(L²/2).

    ``k``/``v`` may be int8 (or fp8) codes with per-position fp32 scales
    ``k_scale``/``v_scale`` of shape [B, H, Lk] — the quantized-KV training
    form: codes stream from HBM at reduced bandwidth and are dequantized
    against their scales in VMEM (see ``_dequant_tile``).

    ``dropout_rate``/``dropout_seed``: in-kernel attention dropout on the
    softmax probabilities (keep prob 1-rate, kept entries scaled by
    1/(1-rate)); the mask is a counter-based hash of (row, col, head, seed)
    — see ``dropout_keep_mask`` — so the backward regenerates it exactly
    and nothing [Lq, Lk]-sized is ever materialized.  The reference has no
    dropout in its flash path at all (its model-level attention dropout is
    never applied, modules_transfomer.py:56); this is the BASELINE.md
    "causal+dropout" measured config.

    ``q_pack`` packs that many consecutive ``block_q``-row Q sub-tiles into
    each grid step, giving the kernel independent QK->softmax->PV chains
    whose MXU and VPU phases overlap (measured +9% over the single-chain
    body at the headline shape).  Packing drops to 1 automatically when the
    sequence has a single Q tile.

    Returns ``(out, lse, m)`` with ``out`` in the query dtype and
    ``lse``/``m`` fp32 of shape [B, H, L]: the FA2 residual (logsumexp) plus
    the running max so callers can reconstruct the FA1 ``(l, m)`` pair.
    """
    if interpret is None:
        interpret = default_interpret()
    B, H, Lq, d = q.shape
    Hkv = k.shape[1]
    if H % Hkv:
        raise ValueError(f"query heads ({H}) must be a multiple of KV "
                         f"heads ({Hkv})")
    g = H // Hkv                 # GQA group size (1 = MHA)
    Lk = k.shape[-2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    quantized = k_scale is not None
    segmented = segment_ids is not None
    if segmented and Lq != k.shape[-2]:
        raise ValueError("segment_ids requires Lq == Lk (packed training)")

    block_q = min(block_q, round_up(Lq, 8))
    block_k = min(block_k, round_up(Lk, 8))
    if q_pack is None:
        # Packing pays when the PV pass is MXU-underfilled (d=64-class heads,
        # the fold_l shapes) and the VPU softmax is a large fraction of the
        # chain; at full-width d=128 it measured ~neutral-to-negative.
        q_pack = DEFAULT_Q_PACK if _fold_l(d) else 1
    if round_up(Lq, block_q) // block_q < q_pack:
        q_pack = 1                    # single Q tile: nothing to pack
    group_q = q_pack * block_q
    pLq, pLk = round_up(Lq, group_q), round_up(Lk, block_k)
    padded_kv = pLk != Lk
    q_offset = Lk - Lq

    # Native GQA: the grid runs over QUERY heads; K/V (and scale) index
    # maps fold the flat query-head index onto its KV head, so grouped
    # query heads share one stream of KV tiles — no materialized repeat,
    # and KV HBM traffic is divided by the group size.
    def kv_bh(bh):
        return (bh // H) * Hkv + (bh % H) // g

    qf = pad_to(q.reshape(B * H, Lq, d), 1, pLq)
    kf = pad_to(k.reshape(B * Hkv, Lk, d), 1, pLk)
    vf = pad_to(v.reshape(B * Hkv, Lk, d), 1, pLk)
    if quantized:
        ksf = pad_to(k_scale.reshape(B * Hkv, Lk, 1), 1, pLk)
        vsf = pad_to(v_scale.reshape(B * Hkv, Lk, 1), 1, pLk)
        scale_block = (1, block_k, 1)
        scale_index = lambda b, t, im, jm, *r: (kv_bh(b), jm[t], 0)
    else:
        ksf = vsf = jnp.ones((B * Hkv, 1, 1), jnp.float32)
        scale_block = (1, 1, 1)
        scale_index = lambda b, t, im, jm, *r: (kv_bh(b), 0, 0)

    if segmented:
        seg = segment_ids.astype(jnp.int32)
        # Two layouts of the same [B, L] ids: rows as [B, pLq, 1] (the lse
        # pattern) and keys as [B, 1, pLk]; padding gets -1, but padded keys
        # are masked by kv_len and padded rows are sliced off anyway.
        qsegf = pad_to(seg[:, :, None], 1, pLq, fill=-1)
        ksegf = pad_to(seg[:, None, :], 2, pLk, fill=-1)
        qseg_block, kseg_block = (1, group_q, 1), (1, 1, block_k)
        qseg_index = lambda b, t, im, jm, *r: (b // H, im[t], 0)
        kseg_index = lambda b, t, im, jm, *r: (b // H, 0, jm[t])
    else:
        qsegf = ksegf = jnp.zeros((B, 1, 1), jnp.int32)
        qseg_block = kseg_block = (1, 1, 1)
        qseg_index = kseg_index = lambda b, t, im, jm, *r: (b // H, 0, 0)

    num_groups, num_kv = pLq // group_q, pLk // block_k
    imap, jmap, flags = _packed_schedule(
        num_groups, num_kv, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, kv_len=Lk, q_pack=q_pack, window=window)
    # Under dropout the softmax normalizer must sum the UNDROPPED p, so it
    # cannot ride the P·V ones column.
    fold_l = _fold_l(d) and dropout_rate == 0.0
    seed_arr = jnp.atleast_1d(jnp.asarray(dropout_seed, jnp.int32))

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset, d=d,
        quantized=quantized, q_pack=q_pack, dropout_rate=dropout_rate,
        window=window, segmented=segmented,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B * H, len(imap)),
        in_specs=[
            pl.BlockSpec((1, group_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda b, t, im, jm, *r: (kv_bh(b), jm[t], 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda b, t, im, jm, *r: (kv_bh(b), jm[t], 0)),
            pl.BlockSpec(scale_block, scale_index),
            pl.BlockSpec(scale_block, scale_index),
            pl.BlockSpec(qseg_block, qseg_index),
            pl.BlockSpec(kseg_block, kseg_index),
        ],
        out_specs=[
            pl.BlockSpec((1, group_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec((1, group_q, 1), lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec((1, group_q, 1), lambda b, t, im, jm, *r: (b, im[t], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((group_q, d + 1 if fold_l else d), jnp.float32),
            pltpu.VMEM((group_q, 1), jnp.float32),
        ] + ([] if fold_l else [pltpu.VMEM((group_q, 1), jnp.float32)]),
    )

    def kernel_wrapper(im, jm, fl, sd, q_r, k_r, v_r, ks_r, vs_r, qs_r, ks2_r,
                       o_r, lse_r, m_r, *scratch):
        if fold_l:
            acc, m_s = scratch
            kernel(im, jm, fl, sd, q_r, k_r, v_r, ks_r, vs_r, qs_r, ks2_r,
                   o_r, lse_r, m_r, acc, m_s, None)
        else:
            acc, m_s, l_s = scratch
            kernel(im, jm, fl, sd, q_r, k_r, v_r, ks_r, vs_r, qs_r, ks2_r,
                   o_r, lse_r, m_r, acc, m_s, l_s)

    out, lse, m = pl.pallas_call(
        kernel_wrapper,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
            jax.ShapeDtypeStruct((B * H, pLq, 1), jnp.float32),
            jax.ShapeDtypeStruct((B * H, pLq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(imap), jnp.asarray(jmap), jnp.asarray(flags), seed_arr,
      qf, kf, vf, ksf, vsf, qsegf, ksegf)

    out = out[:, :Lq].reshape(B, H, Lq, d)
    lse = lse[:, :Lq, 0].reshape(B, H, Lq)
    m = m[:, :Lq, 0].reshape(B, H, Lq)
    return out, lse, m


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_p_ds(q, k, v, do, lse, delta, i, j, *, scale, causal, block_q,
              block_k, kv_len, padded_kv, q_offset, d,
              dropout_rate=0.0, bh=None, seed=None, window=None,
              qseg=None, kseg=None):
    """Shared backward recompute for one (q, kv) tile pair: returns
    ``(p_dv, ds)`` — used identically by the fused, dK/dV and dQ kernels so
    the three cannot drift apart.  ``p_dv`` is the matrix that left-multiplies
    dO for dV: the plain softmax ``p`` without dropout, and the
    mask-scaled ``p * keep/(1-rate)`` with it.

    Dropout math (out = (P∘M/(1-r)) V with M the keep mask): the saved
    ``delta = rowsum(dO·O)`` already equals ``rowsum(P ∘ dP̃)`` for
    ``dP̃ = (dO Vᵀ)∘M/(1-r)``, so ``ds = p∘(dP̃ - delta)`` holds with the
    same delta — only dp and the dV operand pick up the regenerated mask.

    Rows with ``lse = -inf`` (empty attention: no visible keys under the
    causal mask, see the forward epilogue) contribute exactly zero:
    ``exp2(s - inf) == 0`` guards what would otherwise be ``exp2(+inf)``.
    """
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    s2 = _dot(_pad_contract(qs, d), _pad_contract(k, d), ((1,), (1,)))
    if causal or padded_kv or qseg is not None:
        s2 = _apply_mask(
            s2, i, j, block_q=block_q, block_k=block_k,
            causal=causal, kv_len=kv_len, q_offset=q_offset, window=window,
            qseg=qseg, kseg=kseg)
    lse2 = jnp.where(jnp.isneginf(lse), jnp.inf, lse * LOG2E)
    p = jnp.exp2(s2 - lse2)                         # [bq, bk]
    dp = _dot(_pad_contract(do, d), _pad_contract(v, d), ((1,), (1,)))
    if dropout_rate > 0.0:
        keep_scale = _tile_keep_scale(
            i, j, s2.shape, block_q=block_q, block_k=block_k, bh=bh,
            seed=seed, rate=dropout_rate)
        dp = dp * keep_scale
        p_dv = p * keep_scale
    else:
        p_dv = p
    ds = p * (dp - delta)
    return p_dv, ds


def _bwd_dkv_kernel(
    imap_ref, jmap_ref, flags_ref, seed_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d, aug,
    quantized, dropout_rate, window, segmented,
):
    t = pl.program_id(1)
    bh = pl.program_id(0)
    flags = flags_ref[t]

    @pl.when((flags & _FIRST) != 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when((flags & _LIVE) != 0)
    def _body():
        q, do = q_ref[0], do_ref[0]                 # [bq, d]
        kt = (_dequant_tile(k_ref[0], ks_ref, q_ref.dtype) if quantized
              else k_ref[0])
        vt = (_dequant_tile(v_ref[0], vs_ref, q_ref.dtype) if quantized
              else v_ref[0])
        p, ds = _bwd_p_ds(
            q, kt, vt, do, lse_ref[0], delta_ref[0],
            imap_ref[t], jmap_ref[t], scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
            padded_kv=padded_kv, q_offset=q_offset, d=d,
            dropout_rate=dropout_rate, bh=bh,
            seed=seed_ref[0], window=window,
            qseg=qseg_ref[0] if segmented else None,
            kseg=kseg_ref[0] if segmented else None)
        # dV += P^T dO   (ones column: see _ones_col — discarded on store)
        dv_acc[:] += _dot(p.astype(do.dtype),
                          _ones_col(do) if aug else do, ((0,), (0,)))
        # dK += dS^T Q  (the tau = scale factor is applied once at the end)
        dk_acc[:] += _dot(ds.astype(q.dtype),
                          _ones_col(q) if aug else q, ((0,), (0,)))

    @pl.when((flags & _LAST) != 0)
    def _epilogue():
        dk_ref[0] = (scale * dk_acc[:, :d]).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:, :d].astype(dv_ref.dtype)


def _bwd_dq_kernel(
    imap_ref, jmap_ref, flags_ref, seed_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d, aug,
    quantized, dropout_rate, window, segmented,
):
    t = pl.program_id(1)
    bh = pl.program_id(0)
    flags = flags_ref[t]

    @pl.when((flags & _FIRST) != 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when((flags & _LIVE) != 0)
    def _body():
        k = (_dequant_tile(k_ref[0], ks_ref, q_ref.dtype) if quantized
             else k_ref[0])
        vt = (_dequant_tile(v_ref[0], vs_ref, q_ref.dtype) if quantized
              else v_ref[0])
        _, ds = _bwd_p_ds(
            q_ref[0], k, vt, do_ref[0], lse_ref[0], delta_ref[0],
            imap_ref[t], jmap_ref[t], scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
            padded_kv=padded_kv, q_offset=q_offset, d=d,
            dropout_rate=dropout_rate, bh=bh,
            seed=seed_ref[0], window=window,
            qseg=qseg_ref[0] if segmented else None,
            kseg=kseg_ref[0] if segmented else None)
        # dQ += dS K  (tau applied once at the end)
        dq_acc[:] += _dot(ds.astype(k.dtype),
                          _ones_col(k) if aug else k, ((1,), (0,)))

    @pl.when((flags & _LAST) != 0)
    def _epilogue():
        dq_ref[0] = (scale * dq_acc[:, :d]).astype(dq_ref.dtype)


def _bwd_fused_kernel(
    imap_ref, jmap_ref, flags_ref, seed_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dq_ref,
    dk_acc, dv_acc, dq_acc,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d, aug,
    n_steps, quantized, dropout_rate, window, segmented,
):
    """Single-pass backward: dK/dV accumulate per KV tile as in
    ``_bwd_dkv_kernel``, and dQ accumulates into a full-sequence fp32 VMEM
    scratch (``[pLq, d(+1)]``) indexed by the current Q tile — the grid for
    one (batch, head) runs sequentially on a TensorCore, so this is the
    race-free TPU replacement for the reference's ``atomicAdd`` dQ
    (src/flash_attn2_bw.cpp:228) that also skips the entire second pass
    (and its recomputation of S and dP: 5 MXU dots per tile pair instead
    of 7, plus one less read of Q/K/V/dO)."""
    t = pl.program_id(1)
    bh = pl.program_id(0)
    flags = flags_ref[t]

    @pl.when(t == 0)
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when((flags & _FIRST) != 0)
    def _init_kv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    @pl.when((flags & _LIVE) != 0)
    def _body():
        q, do = q_ref[0], do_ref[0]
        k = (_dequant_tile(k_ref[0], ks_ref, q_ref.dtype) if quantized
             else k_ref[0])
        vt = (_dequant_tile(v_ref[0], vs_ref, q_ref.dtype) if quantized
              else v_ref[0])
        p, ds = _bwd_p_ds(
            q, k, vt, do, lse_ref[0], delta_ref[0],
            imap_ref[t], jmap_ref[t], scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
            padded_kv=padded_kv, q_offset=q_offset, d=d,
            dropout_rate=dropout_rate, bh=bh,
            seed=seed_ref[0], window=window,
            qseg=qseg_ref[0] if segmented else None,
            kseg=kseg_ref[0] if segmented else None)
        dv_acc[:] += _dot(p.astype(do.dtype),
                          _ones_col(do) if aug else do, ((0,), (0,)))
        dk_acc[:] += _dot(ds.astype(q.dtype),
                          _ones_col(q) if aug else q, ((0,), (0,)))
        row0 = pl.multiple_of(imap_ref[t] * block_q, block_q)
        dq_acc[pl.ds(row0, block_q), :] += _dot(
            ds.astype(k.dtype), _ones_col(k) if aug else k, ((1,), (0,)))

    @pl.when((flags & _LAST) != 0)
    def _epilogue_kv():
        dk_ref[0] = (scale * dk_acc[:, :d]).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:, :d].astype(dv_ref.dtype)

    @pl.when(t == n_steps - 1)
    def _epilogue_dq():
        dq_ref[0] = (scale * dq_acc[:, :d]).astype(dq_ref.dtype)


def _group_sum(x, B, Hkv, g, Lk, d):
    """Sum per-query-head dK/dV over each GQA group -> [B, Hkv, Lk, d]
    (fp32 accumulation; identity reshape for MHA)."""
    if g == 1:
        return x.reshape(B, Hkv, Lk, d)
    return x.astype(jnp.float32).reshape(B, Hkv, g, Lk, d).sum(2).astype(
        x.dtype)


# dQ-in-VMEM scratch is [pLq, d(+1)] fp32 per core, and the fused kernel
# also holds the full-sequence dQ *output* block (double-buffered in the
# INPUT dtype) on top of the usual q/k/v/do tiles — so the scratch budget
# must leave room for roughly 3x itself, and everything except the fp32
# scratch doubles when the inputs are fp32 (measured: fp32 L=8192 d=64
# demanded 19.08M scoped vmem against the 16M limit while bf16 L=8192
# compiles fine).  Sequences past the budget fall back to the two-pass form.
_FUSED_DQ_VMEM_BUDGET = int(2.5 * 1024 * 1024)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k",
                     "dropout_rate", "window", "interpret"),
)
def flash_attention_backward(
    q: jax.Array, k: jax.Array, v: jax.Array,
    o: jax.Array, lse: jax.Array, do: jax.Array,
    dlse: jax.Array | None = None,
    k_scale: jax.Array | None = None,
    v_scale: jax.Array | None = None,
    *,
    causal: bool = False,
    scale: float | None = None,
    block_q: int = DEFAULT_BLOCK_Q_BWD,
    block_k: int = DEFAULT_BLOCK_K_BWD,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int = 0,
    window: int | None = None,
    segment_ids: jax.Array | None = None,
    interpret: bool | None = None,
):
    """Flash-attention backward: returns (dq, dk, dv) for [B, H, L, d] inputs.

    Default: ONE race-free pass over the packed live-tile schedule — dK/dV
    accumulate per KV tile, dQ accumulates into a full-sequence VMEM scratch
    (see ``_bwd_fused_kernel``); sequences whose dQ scratch would overflow
    VMEM fall back to the classic two-pass (dK/dV then dQ) form.  Either way
    this replaces the reference's atomicAdd accumulation
    (src/flash_attn2_bw.cpp:228).  Works for both the FA1 and FA2 residual
    conventions because ``(1/l)·exp(S-m) == exp(S-lse)`` with
    ``lse = m + log l``.
    """
    if interpret is None:
        interpret = default_interpret()
    B, H, Lq, d = q.shape
    Hkv = k.shape[1]
    if H % Hkv:
        raise ValueError(f"query heads ({H}) must be a multiple of KV "
                         f"heads ({Hkv})")
    g = H // Hkv
    Lk = k.shape[-2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))
    if window is not None and not causal:
        raise ValueError("window requires causal=True")

    block_q = min(block_q, round_up(Lq, 8))
    block_k = min(block_k, round_up(Lk, 8))
    pLq, pLk = round_up(Lq, block_q), round_up(Lk, block_k)
    padded_kv = pLk != Lk
    q_offset = Lk - Lq

    # D_i = sum_d dO * O — plain XLA, fused into one pass over dO/O.
    # A cotangent on the logsumexp output folds in exactly here: the lse
    # contribution to dS is ``p * dlse_i`` and ``ds = p*(dp - (D - dlse))``,
    # so the kernels run unchanged with a shifted D.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)

    # Native GQA (see the forward): K/V reads fold onto the KV head; the
    # dK/dV OUTPUTS stay per-QUERY-head (each grid row accumulates its own
    # group member's contribution race-free) and are group-summed after.
    def kv_bh(bh):
        return (bh // H) * Hkv + (bh % H) // g

    qf = pad_to(q.reshape(B * H, Lq, d), 1, pLq)
    kf = pad_to(k.reshape(B * Hkv, Lk, d), 1, pLk)
    vf = pad_to(v.reshape(B * Hkv, Lk, d), 1, pLk)
    dof = pad_to(do.reshape(B * H, Lq, d), 1, pLq)
    lsef = pad_to(lse.reshape(B * H, Lq, 1), 1, pLq)
    deltaf = pad_to(delta.reshape(B * H, Lq, 1), 1, pLq)
    quantized = k_scale is not None
    if quantized:
        ksf = pad_to(k_scale.reshape(B * Hkv, Lk, 1), 1, pLk)
        vsf = pad_to(v_scale.reshape(B * Hkv, Lk, 1), 1, pLk)
        scale_block = (1, block_k, 1)
        scale_index = lambda b, t, im, jm, *r: (kv_bh(b), jm[t], 0)
    else:
        ksf = vsf = jnp.ones((B * Hkv, 1, 1), jnp.float32)
        scale_block = (1, 1, 1)
        scale_index = lambda b, t, im, jm, *r: (kv_bh(b), 0, 0)
    # gradients are w.r.t. the (dequantized) fp values
    grad_dtype = q.dtype
    seed_arr = jnp.atleast_1d(jnp.asarray(dropout_seed, jnp.int32))
    segmented = segment_ids is not None
    if segmented:
        if Lq != Lk:
            raise ValueError("segment_ids requires Lq == Lk (packed training)")
        seg = segment_ids.astype(jnp.int32)
        qsegf = pad_to(seg[:, :, None], 1, pLq, fill=-1)
        ksegf = pad_to(seg[:, None, :], 2, pLk, fill=-1)
        qseg_block, kseg_block = (1, block_q, 1), (1, 1, block_k)
        qseg_index = lambda b, t, im, jm, *r: (b // H, im[t], 0)
        kseg_index = lambda b, t, im, jm, *r: (b // H, 0, jm[t])
    else:
        qsegf = ksegf = jnp.zeros((B, 1, 1), jnp.int32)
        qseg_block = kseg_block = (1, 1, 1)
        qseg_index = kseg_index = lambda b, t, im, jm, *r: (b // H, 0, 0)

    num_q, num_kv = pLq // block_q, pLk // block_k

    kv_imap, kv_jmap, kv_flags = _tile_schedule(
        num_q, num_kv, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, kv_len=Lk, kv_outer=True, window=window)
    aug = _fold_l(d)
    dw = d + 1 if aug else d
    budget = _FUSED_DQ_VMEM_BUDGET
    if jnp.dtype(q.dtype).itemsize >= 4:
        budget //= 2     # fp32 tiles/output double the non-scratch footprint
    fused = pLq * dw * 4 <= budget

    common_in_specs = [
        pl.BlockSpec((1, block_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
        pl.BlockSpec((1, block_k, d),
                     lambda b, t, im, jm, *r: (kv_bh(b), jm[t], 0)),
        pl.BlockSpec((1, block_k, d),
                     lambda b, t, im, jm, *r: (kv_bh(b), jm[t], 0)),
        pl.BlockSpec(scale_block, scale_index),
        pl.BlockSpec(scale_block, scale_index),
        pl.BlockSpec(qseg_block, qseg_index),
        pl.BlockSpec(kseg_block, kseg_index),
        pl.BlockSpec((1, block_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, t, im, jm, *r: (b, im[t], 0)),
        pl.BlockSpec((1, block_q, 1), lambda b, t, im, jm, *r: (b, im[t], 0)),
    ]
    kv_out_specs = [
        pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, *r: (b, jm[t], 0)),
        pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, *r: (b, jm[t], 0)),
    ]

    if fused:
        fused_kernel = functools.partial(
            _bwd_fused_kernel,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset, d=d, aug=aug,
            n_steps=len(kv_imap), quantized=quantized,
            dropout_rate=dropout_rate, window=window, segmented=segmented,
        )
        fused_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(B * H, len(kv_imap)),
            in_specs=common_in_specs,
            out_specs=kv_out_specs + [
                pl.BlockSpec((1, pLq, d), lambda b, t, im, jm, *r: (b, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, dw), jnp.float32),
                pltpu.VMEM((block_k, dw), jnp.float32),
                pltpu.VMEM((pLq, dw), jnp.float32),
            ],
        )
        dk, dv, dq = pl.pallas_call(
            fused_kernel,
            grid_spec=fused_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B * H, pLk, d), grad_dtype),
                jax.ShapeDtypeStruct((B * H, pLk, d), grad_dtype),
                jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(jnp.asarray(kv_imap), jnp.asarray(kv_jmap), jnp.asarray(kv_flags),
          seed_arr, qf, kf, vf, ksf, vsf, qsegf, ksegf, dof, lsef, deltaf)
        dq = dq[:, :Lq].reshape(B, H, Lq, d)
        dk, dv = (_group_sum(x[:, :Lk], B, Hkv, g, Lk, d) for x in (dk, dv))
        return dq, dk, dv

    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset, d=d, aug=aug,
        quantized=quantized, dropout_rate=dropout_rate, window=window,
        segmented=segmented,
    )
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B * H, len(kv_imap)),
        in_specs=common_in_specs,
        out_specs=kv_out_specs,
        scratch_shapes=[
            pltpu.VMEM((block_k, dw), jnp.float32),
            pltpu.VMEM((block_k, dw), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLk, d), grad_dtype),
            jax.ShapeDtypeStruct((B * H, pLk, d), grad_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(kv_imap), jnp.asarray(kv_jmap), jnp.asarray(kv_flags),
      seed_arr, qf, kf, vf, ksf, vsf, qsegf, ksegf, dof, lsef, deltaf)

    q_imap, q_jmap, q_flags = _tile_schedule(
        num_q, num_kv, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, kv_len=Lk, kv_outer=False, window=window)
    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset, d=d, aug=aug,
        quantized=quantized, dropout_rate=dropout_rate, window=window,
        segmented=segmented,
    )
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(B * H, len(q_imap)),
        in_specs=common_in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dw), jnp.float32),
        ],
    )
    (dq,) = pl.pallas_call(
        dq_kernel,
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(q_imap), jnp.asarray(q_jmap), jnp.asarray(q_flags),
      seed_arr, qf, kf, vf, ksf, vsf, qsegf, ksegf, dof, lsef, deltaf)

    dq = dq[:, :Lq].reshape(B, H, Lq, d)
    dk, dv = (_group_sum(x[:, :Lk], B, Hkv, g, Lk, d) for x in (dk, dv))
    return dq, dk, dv
