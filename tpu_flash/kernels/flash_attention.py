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

* **Packed, variable-width tile schedule.**  Instead of a dense rectangular
  grid with in-kernel skips (the reference's ``-DCAUSAL_BLOCKSPARSE``
  whole-tile skip, src/flash_attn_fw.cpp:88-92 — which on TPU would still
  burn a pipeline step + DMA per dead tile), the live (q_tile, kv_tile)
  pairs are enumerated at trace time and streamed through a
  ``PrefetchScalarGridSpec``: the grid is exactly the live tiles, the
  prefetched index maps steer the block DMAs, and every sub-tile the causal
  diagonal cuts carries a static WIDTH CLASS so its dots run on the live
  columns only (round 1 computed-and-masked the dead columns — 1.4x the
  counted dot volume at B4 H8 L2048 d64).  Causal attention therefore does
  ~half the grid steps of the dense version at ~the counted dot volume, and
  KV padding tiles are never visited at all.

* **Software-pipelined packed chains.**  Each forward grid step carries
  ``q_pack`` independent Q sub-tile chains with sub-tile h+1's QK dot
  issued before sub-tile h's softmax, so VPU and MXU phases of neighboring
  chains overlap (the VPU softmax is ~fully hidden — measured ~5% of the
  forward, bench/exp_fw_ablate.py) while only two fp32 score tiles stay
  live in VMEM.  Bigger groups also cut KV re-reads (each KV tile serves
  ``q_pack`` sub-tiles per fetch) and grid steps (~1.3 us fixed cost each).

* **exp2 softmax.**  ``softmax_scale * log2(e)`` is folded into Q once per
  tile, the online softmax runs in base 2 (the VPU's native exponent), and
  the epilogue converts the logsumexp back to natural log.

* **``l`` rides the MXU.**  For head dims where ``d+1`` stays within the
  same 128-lane group, V is augmented with a ones column so the softmax
  normalizer comes out of the P·V matmul for free (N=65 output costs the
  same MXU wall time as N=64, bench/exp_dot_shapes.py) instead of a
  cross-lane VPU reduction.

* **No operand padding.**  At kernel dot geometry the MXU charges
  ``ceil(K/128)`` passes whether or not the d=64 contraction is
  zero-padded (native == padded within noise, bench/exp_dot_shapes.py),
  so operands stream at their natural width — padding them in HBM or VMEM
  only costs bandwidth and copies.

* **Quantized KV is d-major.**  int8/fp8 codes arrive ``[.., d, L]`` (full
  int8 tiles, long DMA rows; the d-minor form streamed 64-byte rows and
  cost +35%), the kernels cast them once (fp8 via the bit reconstruction
  in ``common.fp8_e4m3_to_bf16``), and the per-position scales fold into
  scores / probabilities / dS on the hidden VPU side.

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
    cast_codes,
    default_interpret,
    pad_to,
    round_up,
)

# Round-3 retune (bench/exp_fw_residual.py, headline shape, spec-trimmed
# kernels): the forward prefers EIGHT packed 256-row Q sub-tiles per grid
# step against 1024-col KV tiles (0.354 ms vs 0.357 for 4x512x1024 and
# 0.419 for 2x1024x1024) — same 2048-row group (one Q/O fetch per bh),
# finer chains pipeline the VPU tail better, and the two live fp32 score
# tiles stay small ([256, bk]).  The DMA floor probe puts this schedule's
# streaming at ~607-722 GB/s with the whole 34 MB in 0.046-0.055 ms, so
# KV bytes are NOT the forward's residual — remaining gap to the ~0.235 ms
# executed-dot floor is pipeline serialization.  The fused
# backward prefers 512x2048 (0.792 ms vs 0.822 at 512x1024, 0.869 at the
# round-1 512x512 default): the width classes make wide KV tiles cheap
# (diagonal pairs run at their live width), so fewer/bigger steps win.
# Packing the backward measured neutral (bench/exp_bw_interleave.py), so
# it stays single-chain.  Smaller sequences clamp to the (8-aligned)
# length.
DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 1024
DEFAULT_Q_PACK = 8
DEFAULT_BLOCK_Q_BWD = 512
DEFAULT_BLOCK_K_BWD = 2048

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
    """Trace-time schedule of (q_tile, kv_tile) visits (backward passes).

    Returns ``(imap, jmap, flags, wmap, widths)``: int32 numpy arrays plus
    the static tuple of distinct width classes.  flags packs FIRST (reset
    accumulators), LAST (write outputs), MASK (tile crosses the causal
    diagonal or the kv-length boundary; informational — masks are applied
    unconditionally because a lax.cond around the mask measures far slower
    than the mask itself) and LIVE (tile contributes; dead tiles appear
    only as forced visits so every output block is written at least once,
    and their bodies are skipped entirely).  ``wmap[t]`` indexes ``widths``
    (-1 for dead visits): the static KV-column width this pair computes —
    tiles the causal diagonal cuts run their dots on the live width class
    only instead of computing and masking the dead columns (see
    ``_width_class``).

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

    def width(i, j):
        if not live(i, j):
            return 0
        if window is not None and \
                j * block_k < q_offset + i * block_q - window + 1:
            return block_k       # window cuts the left side: no left-trim
        hi = min(kv_len, (j + 1) * block_k)
        if causal:
            hi = min(hi, q_offset + (i + 1) * block_q)
        return _width_class(hi - j * block_k, block_k)

    def needs_mask(i, j):
        need = (j + 1) * block_k > kv_len
        if causal:
            need = need or ((j + 1) * block_k - 1 > q_offset + i * block_q)
        return need

    widths: list[int] = []
    width_ids: dict[int, int] = {}

    def wid(i, j, forced):
        if forced:
            return -1
        w = width(i, j)
        if w not in width_ids:
            width_ids[w] = len(widths)
            widths.append(w)
        return width_ids[w]

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
                entries.append((i, j, f, wid(i, j, forced)))
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
                entries.append((i, j, f, wid(i, j, forced)))
    arr = np.asarray(entries, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], tuple(widths)


def _width_class(live_cols: int, block_k: int) -> int:
    """Round a live column count up to the block's width-class granularity
    (quarters of the tile, at least one 128-lane group).  The class system
    keeps the number of DISTINCT width vectors — and therefore compiled
    kernel branches — small while recovering most of the causal diagonal
    waste: a sub-tile whose live range covers only the first quarter/half
    of the KV tile issues its QK and P·V dots at that width instead of
    computing (and masking away) the dead columns."""
    gran = max(LANES, block_k // 4)
    return min(block_k, round_up(live_cols, gran))


def _subtile_width(i, j, *, block_q, block_k, causal, q_offset, kv_len,
                   window=None):
    """Static KV-column width the (absolute q sub-tile i, kv tile j) pair
    computes: 0 for a dead pair, ``block_k`` for a full tile, a width class
    in between for tiles the causal diagonal cuts.  Shared by the forward's
    packed schedule and the backward's packed KV-outer schedule so the two
    cannot drift."""
    if j * block_k >= kv_len:
        return 0
    first_row = q_offset + i * block_q
    last_row = q_offset + (i + 1) * block_q - 1
    if causal and j * block_k > last_row:
        return 0              # tile entirely beyond the causal range
    if window is not None and (j + 1) * block_k - 1 <= first_row - window:
        return 0              # tile entirely behind the sliding window
    if window is not None and j * block_k < first_row - window + 1:
        # the window cuts the LEFT side of the tile: no left-trim
        # support — full width, in-kernel mask handles it
        return block_k
    hi = min(kv_len, (j + 1) * block_k)
    if causal:
        hi = min(hi, last_row + 1)
    return _width_class(hi - j * block_k, block_k)


def _packed_kv_schedule(num_groups, num_kv, *, block_q, block_k, causal,
                        q_offset, kv_len, q_pack, window=None):
    """Trace-time schedule for the packed fused backward: KV tiles OUTER
    (dK/dV accumulate per KV tile), and inside each KV tile the q_pack-
    sub-tile Q groups that contain at least one live pair.

    Returns ``(gmap, jmap, flags, pat, patterns)`` exactly like
    ``_packed_schedule``: FIRST/LAST flag the KV-tile boundaries
    (accumulator reset / dK/dV write), LIVE marks real visits (dead KV
    tiles — possible only with windows or KV padding — get one forced
    visit so their output blocks are written), ``patterns[pat[t]][h]`` is
    sub-tile h's static width class on this visit.

    This is the backward's step-count lever: at L=8192 (512x1024 tiles)
    the unpacked schedule runs 72 live pairs per (batch, head) and the
    measured ~1.3 us/grid-step fixed cost alone is ~0.75 ms of the
    backward; packing 8x256 sub-tiles per group cuts it to 20 steps.
    Round 2's "packing is neutral" verdict (bench/exp_bw_interleave.py)
    was measured at L=2048 where the unpacked schedule is 4-6 steps."""
    entries = []
    patterns: list[tuple[int, ...]] = []
    pattern_ids: dict[tuple[int, ...], int] = {}

    def pat_id(vec):
        if vec not in pattern_ids:
            pattern_ids[vec] = len(patterns)
            patterns.append(vec)
        return pattern_ids[vec]

    def width(g, h, j):
        return _subtile_width(
            g * q_pack + h, j, block_q=block_q, block_k=block_k,
            causal=causal, q_offset=q_offset, kv_len=kv_len, window=window)

    for j in range(num_kv):
        gs = [g for g in range(num_groups)
              if any(width(g, h, j) for h in range(q_pack))]
        forced = not gs
        if forced:
            gs = [num_groups - 1]
        for idx, g in enumerate(gs):
            f = (_FIRST if idx == 0 else 0) \
                | (_LAST if idx == len(gs) - 1 else 0) \
                | (0 if forced else _LIVE)
            vec = tuple(0 if forced else width(g, h, j)
                        for h in range(q_pack))
            entries.append((g, j, f, pat_id(vec)))
    arr = np.asarray(entries, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], tuple(patterns)


def _packed_schedule(num_groups, num_kv, *, block_q, block_k, causal,
                     q_offset, kv_len, q_pack, window=None):
    """Trace-time schedule for the forward: one visit list of
    ``(q_group, kv_tile)`` where a group packs ``q_pack`` consecutive
    ``block_q``-row sub-tiles.

    Returns ``(imap, jmap, flags, pat, patterns)``: flags carry FIRST/LAST
    (accumulator reset / output write for the group); ``pat[t]`` indexes
    ``patterns``, the static tuple of distinct per-sub-tile width vectors.
    ``patterns[p][h]`` is the number of KV columns sub-tile h computes on
    this visit — 0 for a dead sub-tile (beyond the causal range or, with
    ``window``, entirely behind the sliding window), ``block_k`` for a full
    tile, and a width class in between for tiles the causal diagonal cuts:
    the variable-width replacement for computing dead diagonal columns and
    masking them away (the executed-but-masked dot volume at the headline
    shape was ~1.4x the counted work).  ``q_pack=1`` reduces to the classic
    per-tile schedule."""
    def width(g, h, j):
        return _subtile_width(
            g * q_pack + h, j, block_q=block_q, block_k=block_k,
            causal=causal, q_offset=q_offset, kv_len=kv_len, window=window)

    entries = []
    patterns: list[tuple[int, ...]] = []
    pattern_ids: dict[tuple[int, ...], int] = {}

    def pat_id(vec):
        if vec not in pattern_ids:
            pattern_ids[vec] = len(patterns)
            patterns.append(vec)
        return pattern_ids[vec]

    for g in range(num_groups):
        js = [j for j in range(num_kv)
              if any(width(g, h, j) for h in range(q_pack))]
        forced = not js
        if forced:
            js = [0]
        for idx, j in enumerate(js):
            f = (_FIRST if idx == 0 else 0) \
                | (_LAST if idx == len(js) - 1 else 0)
            vec = tuple(0 if forced else width(g, h, j)
                        for h in range(q_pack))
            entries.append((g, j, f, pat_id(vec)))
    arr = np.asarray(entries, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2], arr[:, 3], tuple(patterns)


def _apply_mask(s2, i, j, *, block_q, block_k, causal, kv_len, q_offset,
                padded_kv=True, window=None, qseg=None, kseg=None,
                transposed=False):
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

    All conditions are merged into ONE boolean keep mask and ONE select:
    the mask runs on every visited tile (a lax.cond around it measures
    slower than the mask itself), so each saved per-element VPU op is paid
    L^2 times.  ``padded_kv=False`` drops the kv-boundary compare entirely
    when the KV length is block-aligned (causal rows never exceed kv_len:
    rows <= q_offset + Lq - 1 = Lk - 1; padded Q rows are sliced off by the
    caller and padded Q rows in the backward contribute zero via dO = 0).
    """
    c_ax, r_ax = (0, 1) if transposed else (1, 0)
    cols = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s2.shape, c_ax)
    keep = None
    if causal:
        rows = q_offset + i * block_q + jax.lax.broadcasted_iota(
            jnp.int32, s2.shape, r_ax)
        keep = cols <= rows
        if window is not None:
            keep &= cols > rows - window
    if padded_kv:
        bound = cols < kv_len
        keep = bound if keep is None else keep & bound
    if qseg is not None:
        same = qseg == kseg
        keep = same if keep is None else keep & same
    if keep is None:
        return s2
    return jnp.where(keep, s2, MASK2)


def _fold_l(d: int) -> bool:
    """True when the ones column fits in the same 128-lane group as V, so the
    softmax normalizer can ride the (otherwise half-empty) P·V MXU pass."""
    return round_up(d + 1, LANES) == round_up(d, LANES)


def _pad_contract(x, d):
    """Zero-pad the minor (contraction) dim of a VMEM tile to a full lane
    group.  NO LONGER USED by the attention kernels: round-2 measurement at
    the exact kernel dot shapes (bench/exp_dot_shapes.py) shows a native
    K=64 contraction runs at the same wall time as the zero-padded K=128
    form (92 vs 90 useful TF/s — the MXU charges by ceil(K/128) either
    way), so the padding concat was pure VMEM-copy overhead.  (The round-1
    "53 vs 115 TF/s" cliff that motivated it came from isolated-XLA-dot
    shapes, not the in-kernel ones.)  Kept for reuse by experiments."""
    target = round_up(d, LANES)
    if d == target:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((x.shape[0], target - d), x.dtype)], axis=1)


def _ones_col(x):
    """Append a ones column: an N=64-output MXU dot measures ~67 TFLOP/s on
    v5e but N=65 measures ~117, so dots whose outputs are [*, d=64]
    accumulators run faster with a (discarded) 65th column — and the column
    is ones rather than zeros so the same trick doubles as the softmax-sum
    accumulator in the forward."""
    return jnp.concatenate(
        [x, jnp.ones((x.shape[0], 1), x.dtype)], axis=1)


def _ones_row(x):
    """d-major twin of :func:`_ones_col`: append a ones ROW to a [d, bk]
    tile so a ((1,), (1,)) contraction against it emits the same N=65
    output geometry (and the forward's folded softmax-sum column)."""
    return jnp.concatenate(
        [x, jnp.ones((1, x.shape[1]), x.dtype)], axis=0)


def dropout_keep_mask(rows, cols, b, h, seed, rate):
    """Deterministic attention-dropout keep mask from a counter-based hash.

    The TPU-native analog of FlashAttention's philox-counter dropout: the
    mask for position (row, col) of (batch ``b``, head ``h``) is a pure
    function of the indices and a seed, so the backward pass REGENERATES it
    exactly instead of storing an [Lq, Lk] mask (which would defeat the
    flash memory footprint).  Plain uint32 multiply/xor/shift (murmur3-style
    fmix finalizer) rather than ``pltpu.prng_*``: identical bits in
    interpret mode (CPU tests) and compiled Mosaic, and recomputable from
    plain jnp for the test oracle (``ops.reference.dropout_keep_oracle``).

    ``rows``/``cols`` are int32 GLOBAL indices (broadcastable to the tile
    shape); ``b``/``h`` are the GLOBAL batch and head indices mixed
    separately — under shard_map the kernels reconstruct them from the
    local program id plus the shard's (batch, head) offsets (prefetched in
    the seed array), so sharded runs are bit-identical to the unsharded
    layout; ``seed`` int32.  Returns bool keep mask, P(keep) = 1 - rate.
    """
    u = (rows.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         ^ cols.astype(jnp.uint32) * jnp.uint32(0x85EBCA77)
         ^ (jnp.asarray(b).astype(jnp.uint32) * jnp.uint32(0xC2B2AE3D))
         ^ (jnp.asarray(h).astype(jnp.uint32) * jnp.uint32(0x27D4EB2F))
         ^ jnp.asarray(seed).astype(jnp.uint32))
    u = u ^ (u >> 16)
    u = u * jnp.uint32(0x7FEB352D)
    u = u ^ (u >> 15)
    u = u * jnp.uint32(0x846CA68B)
    u = u ^ (u >> 16)
    return u >= jnp.uint32(min(int(round(rate * 2.0 ** 32)), 2 ** 32 - 1))


def _global_bh(bh, n_heads, seed_ref):
    """Global (batch, head) of local program id ``bh``: the shard's batch /
    head offsets ride in the prefetched seed array (0 when unsharded)."""
    return bh // n_heads + seed_ref[1], bh % n_heads + seed_ref[2]


def _tile_keep_scale(i_tile, j_tile, shape, *, block_q, block_k, b, h, seed,
                     rate, dtype=jnp.float32, transposed=False):
    """keep/(1-rate) multiplier tile for (q tile, kv tile): 0 where dropped.
    ``transposed``: the tile is [w, bq] (the backward's wq score layout) —
    same hash per (row, col), so masks are bit-identical to the qw form."""
    r_ax, c_ax = (1, 0) if transposed else (0, 1)
    rows = i_tile * block_q + jax.lax.broadcasted_iota(jnp.int32, shape, r_ax)
    cols = j_tile * block_k + jax.lax.broadcasted_iota(jnp.int32, shape, c_ax)
    keep = dropout_keep_mask(rows, cols, b, h, seed, rate)
    one = jnp.asarray(1.0 / (1.0 - rate), dtype)
    return jnp.where(keep, one, jnp.asarray(0.0, dtype))


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    imap_ref, jmap_ref, flags_ref, pat_ref, seed_ref,  # prefetched schedule
    q_ref, k_ref, v_ref, ks_ref, vs_ref,   # inputs (scales used if quantized)
    qseg_ref, kseg_ref,               # segment ids (dummies if not segmented)
    o_ref, lse_ref, m_out_ref,        # outputs
    acc_ref, m_ref, l_ref,            # VMEM scratch (l_ref only if not fold_l)
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d,
    n_heads, quantized, scaled, q_pack, dropout_rate, window, segmented,
    fast_exp, patterns,
):
    t = pl.program_id(1)
    bh = pl.program_id(0)   # hoisted: program_id inside pl.when bodies is
    flags = flags_ref[t]    # not substitutable by the interpreter
    pat = pat_ref[t]
    fold_l = l_ref is None
    # bf16 softmax tail: the exp2 (the dominant per-score VPU op) runs on
    # bf16 vectors — twice the lanes per vreg — and its output feeds the
    # P·V dot with no further cast.  Worst-case absolute error of
    # exp2(bf16(x)) vs bf16(exp2(x)) is max_x |2^x * ln2 * x * 2^-8|
    # ~= 1.4e-3 — the same order as the bf16 rounding of p itself, so
    # bf16-input parity (~8e-3 vs the fp32 oracle) is unchanged.  fp32
    # inputs never take this path (exact-parity mode).
    p_dtype = jnp.bfloat16 if fast_exp else jnp.float32

    @pl.when((flags & _FIRST) != 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        if not fold_l:
            l_ref[:] = jnp.zeros_like(l_ref)

    # The KV tile is shared by every packed Q sub-tile: prepare it once.
    # (On forced visits — groups with no live sub-tile, scheduled only so
    # the output block gets written — this computes on an arbitrary tile
    # and is discarded; such visits exist only for fully-masked groups.)
    if quantized:
        # Quantized KV arrives d-MAJOR ([d, bk] codes): full int8 tiles
        # (min int8 tile is 32x128 — the d-minor [bk, 64] form left every
        # tile half-populated) and long contiguous DMA rows (the d-minor
        # form streamed 64-BYTE rows, which is where the round-1 int8
        # overhead lived — bench/exp_int8_layout.py).  The critical path
        # between DMA arrival and the MXU is ONE int8->bf16 convert; the
        # per-position scales (``scaled``: per-token granularity) fold
        # onto the already-hidden VPU side (scores x kscale, p x vscale)
        # instead of dequantizing operands.  Per-CHANNEL granularity
        # (``not scaled``) has NO scale work in the kernel at all: the
        # entry folds K's [d] scale into Q before the call and V's into
        # the output epilogue, so this body is the unquantized body plus
        # one cast per tile — the "free dequant" form (VERDICT r4 #1).
        kt = cast_codes(k_ref[0], q_ref.dtype)      # [d, bk] codes
        vt = cast_codes(v_ref[0], q_ref.dtype)      # [d, bk] codes
        if scaled:
            kscale = ks_ref[0]                      # [1, bk] fp32
            vscale = vs_ref[0]                      # [1, bk] fp32
        else:
            # scale-free codes: the ones ROW (softmax-sum accumulator)
            # can ride the PV dot again, exactly like the fp path
            v_aug = _ones_row(vt) if fold_l else vt  # [d(+1), bk]
    else:
        kt = k_ref[0]                               # [bk, d]
        vt = v_ref[0]                               # [bk, d]
        v_aug = _ones_col(vt) if fold_l else vt

    def scores(h, w):
        # Fold softmax scale and the base-2 conversion into Q: one cheap
        # [bq, d] multiply instead of per-score work, then bf16 (or input
        # dtype) dots on the MXU with fp32 accumulation.  ``w`` is this
        # sub-tile's static width class: the dot runs on the first w KV
        # columns only (the rest are dead under the causal diagonal).
        sel = pl.ds(h * block_q, block_q)
        q = (q_ref[0, sel].astype(jnp.float32) * (scale * LOG2E)).astype(
            q_ref.dtype)                            # [bq, d]
        if quantized:
            s2 = _dot(q, kt[:, :w], ((1,), (0,)))   # [bq, w] code-space
            if scaled:
                s2 = s2 * kscale[:, :w]             # per-key dequant scale
            # channel granularity: K's scale is already inside q (entry
            # fold) — s2 IS the dequant-space score.
        else:
            s2 = _dot(q, kt[:w], ((1,), (1,)))      # [bq, w]
        if causal or padded_kv or segmented:
            s2 = _apply_mask(
                s2, imap_ref[t] * q_pack + h, jmap_ref[t],
                block_q=block_q, block_k=block_k, causal=causal,
                kv_len=kv_len, q_offset=q_offset, padded_kv=padded_kv,
                window=window,
                qseg=qseg_ref[0, sel] if segmented else None,
                kseg=kseg_ref[0][:, :w] if segmented else None)
        return s2

    def chain(s2, h, w):
        sel = pl.ds(h * block_q, block_q)
        m_prev = m_ref[sel]                         # [bq, 1]
        m_cur = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)            # rescale of the old state
        p = jnp.exp2((s2 - m_new).astype(p_dtype))  # [bq, w]

        if dropout_rate > 0.0:
            # Attention dropout: drop entries of the (normalized) P AFTER
            # the softmax — so the normalizer l accumulates the UNDROPPED p
            # (which is why fold_l is disabled under dropout) and only the
            # P·V accumulation sees the mask.  Regenerated identically in
            # the backward from the same (row, col, head, seed) hash.
            gb, gh = _global_bh(bh, n_heads, seed_ref)
            p_v = p * _tile_keep_scale(
                imap_ref[t] * q_pack + h, jmap_ref[t], s2.shape,
                block_q=block_q, block_k=block_k, b=gb, h=gh,
                seed=seed_ref[0], rate=dropout_rate, dtype=p.dtype)
        else:
            p_v = p
        if quantized and scaled:
            # vscale folds into p (hidden VPU side); codes feed the MXU raw
            pb = (p_v * vscale[:, :w].astype(p_v.dtype)).astype(vt.dtype)
            pv = _dot(pb, vt[:, :w], ((1,), (1,)))  # [bq, d] fp32
        elif quantized:
            # channel granularity: raw code-space PV dot (V's scale is
            # applied by the entry's output epilogue); the ones row rides.
            pb = p_v.astype(vt.dtype)
            pv = _dot(pb, v_aug[:, :w], ((1,), (1,)))   # [bq, d(+1)] fp32
        else:
            pb = p_v.astype(v_aug.dtype)
            # fold_l: ones column — rowsum(p) rides the same MXU pass.
            pv = _dot(pb, v_aug[:w], ((1,), (0,)))  # [bq, d(+1)] fp32
        acc_ref[sel] = acc_ref[sel] * alpha + pv
        if not fold_l:
            l_ref[sel] = (alpha * l_ref[sel]
                          + jnp.sum(p.astype(jnp.float32), axis=-1,
                                    keepdims=True))
        m_ref[sel] = m_new

    # One branch per distinct width vector in the schedule (usually 2-3:
    # the all-full pattern plus the diagonal group's).  Inside a branch,
    # sub-tile h+1's QK dot is issued before sub-tile h's softmax, so
    # independent chains' MXU and VPU phases overlap — the measured cure
    # for the serialized QK->softmax->PV chain of the single-tile body.
    # (Ordering matters: one pl.when per sub-tile, each containing its full
    # dot->softmax->PV chain, measures no faster than the unpacked kernel.)
    # The chains are software-pipelined one step ahead rather than all-dots-
    # first: at most TWO [bq, bk] fp32 score tiles are ever live, keeping
    # q_pack=4 within the 16 MB scoped-VMEM limit (all-dots-first OOM'd:
    # 4 x [512,1024] fp32 = 8 MB of scores alone).  Widths are static per
    # branch, so the diagonal pattern's dead columns are never computed.
    for pid, vec in enumerate(patterns):
        if not any(vec):
            continue        # forced visit: output write only (epilogue)

        @pl.when(pat == pid)
        def _branch(vec=vec):
            pending = None
            for h, w in enumerate(vec):
                if w == 0:
                    continue
                s2 = scores(h, w)
                if pending is not None:
                    chain(*pending)
                pending = (s2, h, w)
            if pending is not None:
                chain(*pending)

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
        if m_out_ref is not None:
            m_out_ref[0] = jnp.where(empty, -jnp.inf, m_nat)


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "q_pack",
                     "dropout_rate", "window", "q_offset", "kv_layout",
                     "kv_scale_mode", "fast_exp", "with_m", "interpret"),
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
    q_offset: int | None = None,
    kv_layout: str = "ld",
    kv_scale_mode: str = "token",
    fast_exp: bool | None = None,
    with_m: bool = False,
    interpret: bool | None = None,
):
    """Flash-attention forward over [B, H, L, d] inputs.

    ``q_offset`` overrides the causal-diagonal alignment (default
    ``Lk - Lq``, the bottom-right convention): query row r attends keys
    ``<= r + q_offset``.  Sequence-parallel ring attention passes the
    static chunk distance (``dist * chunk_len``) here so a PAST chunk's
    sliding-window band — keys in ``(r_glob - window, r_glob]`` — maps
    exactly onto the kernel's causal+window masks and its dead-tile
    schedule (parallel/sequence.py).

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

    ``k``/``v`` may be int8 (or fp8) codes with fp32 dequant scales — the
    quantized-KV training form: codes stream from HBM at half (bf16)
    bandwidth.  Two scale granularities (``kv_scale_mode``):

      * ``"token"``: scales [B, H, Lk] (one per key position).  The kernel
        casts codes once and folds the scales into the scores / softmax
        probabilities (the hidden VPU side — see the kernel comments).
      * ``"channel"``: scales [B, H, d] (one per head channel, amax over
        the sequence).  K's scale folds into Q BEFORE the kernel and V's
        folds into the output AFTER it — both plain XLA elementwise ops
        fused into the operand reshapes — so the kernel runs the
        unquantized body plus one code cast per tile, with zero per-tile
        scale work and the folded-l ones column restored ("free dequant",
        VERDICT r4 #1; quantization-error trade-off adjudicated by the MT
        kv-quant table, bench/RESULTS.md).

    The kernel consumes codes d-MAJOR ([B, H, d, Lk], full int8 tiles +
    long DMA rows); pass ``kv_layout="dl"`` if they are already transposed
    (the custom-vjp training path does this once for both fw and bw),
    otherwise the default ``"ld"`` ([B, H, Lk, d], same as unquantized) is
    transposed here.

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
    quantized = k_scale is not None
    if kv_scale_mode not in ("token", "channel"):
        raise ValueError(f"kv_scale_mode must be 'token' or 'channel', "
                         f"got {kv_scale_mode!r}")
    scaled = quantized and kv_scale_mode == "token"
    if kv_layout not in ("ld", "dl"):
        raise ValueError(f"kv_layout must be 'ld' or 'dl', got {kv_layout!r}")
    transposed_in = quantized and kv_layout == "dl"
    Lk = k.shape[-1] if transposed_in else k.shape[-2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    segmented = segment_ids is not None
    if segmented and Lq != Lk:
        raise ValueError("segment_ids requires Lq == Lk (packed training)")
    if quantized and not scaled:
        # Channel granularity: fold K's per-(head, d) scale into Q here
        # (one XLA elementwise, fused into the operand reshape below) so
        # the kernel sees scale-free codes.  GQA: each query head takes
        # its KV head's scale.
        ksb = jnp.repeat(k_scale, g, axis=1) if g > 1 else k_scale
        q = (q.astype(jnp.float32) * ksb[:, :, None, :]).astype(q.dtype)

    block_q = min(block_q, round_up(Lq, 8))
    block_k = min(block_k, round_up(Lk, 8))
    if q_pack is None:
        # Packing pays when the PV pass is MXU-underfilled (d=64-class heads,
        # the fold_l shapes) and the VPU softmax is a large fraction of the
        # chain; at full-width d=128 it measured ~neutral-to-negative.
        q_pack = DEFAULT_Q_PACK if _fold_l(d) else 1
    if jnp.dtype(q.dtype).itemsize >= 4:
        # Exact-fp32 dots (Precision.HIGHEST) carry multi-pass operand
        # splits in scoped VMEM: the pack-4 group OOM'd at 22.27M scoped
        # vmem (L=8192 fp32); two chains fit everywhere measured.
        q_pack = min(q_pack, 2)
    # Clamp the pack to the tiles that exist: a short sequence packs as
    # many sub-tiles as it has (round-2's clamp dropped straight to 1,
    # silently unpacking every L <= group_q call).
    q_pack = max(1, min(q_pack, round_up(Lq, block_q) // block_q))
    group_q = q_pack * block_q
    pLq, pLk = round_up(Lq, group_q), round_up(Lk, block_k)
    padded_kv = pLk != Lk
    if q_offset is None:
        q_offset = Lk - Lq

    # Native GQA: the grid runs over QUERY heads; K/V (and scale) index
    # maps fold the flat query-head index onto its KV head, so grouped
    # query heads share one stream of KV tiles — no materialized repeat,
    # and KV HBM traffic is divided by the group size.
    def kv_bh(bh):
        return (bh // H) * Hkv + (bh % H) // g

    qf = pad_to(q.reshape(B * H, Lq, d), 1, pLq)
    if quantized:
        # d-major codes (see the kernel comment): [B*Hkv, d, pLk] int8/fp8
        # + [B*Hkv, 1, pLk] scales (pad scales with 1.0 — padded columns
        # are masked, but 0-scales would poison reciprocal paths).
        if transposed_in:
            kdl, vdl = k.reshape(B * Hkv, d, Lk), v.reshape(B * Hkv, d, Lk)
        else:
            kdl = k.transpose(0, 1, 3, 2).reshape(B * Hkv, d, Lk)
            vdl = v.transpose(0, 1, 3, 2).reshape(B * Hkv, d, Lk)
        kf, vf = pad_to(kdl, 2, pLk), pad_to(vdl, 2, pLk)
        kv_block = (1, d, block_k)
        kv_index = lambda b, t, im, jm, *r: (kv_bh(b), 0, jm[t])
        if scaled:
            ksf = pad_to(k_scale.reshape(B * Hkv, 1, Lk), 2, pLk, fill=1.0)
            vsf = pad_to(v_scale.reshape(B * Hkv, 1, Lk), 2, pLk, fill=1.0)
            scale_block = (1, 1, block_k)
            scale_index = lambda b, t, im, jm, *r: (kv_bh(b), 0, jm[t])
        else:
            # channel mode: no scale operands enter the kernel at all
            ksf = vsf = None
            scale_block = scale_index = None
    else:
        kf = pad_to(k.reshape(B * Hkv, Lk, d), 1, pLk)
        vf = pad_to(v.reshape(B * Hkv, Lk, d), 1, pLk)
        kv_block = (1, block_k, d)
        kv_index = lambda b, t, im, jm, *r: (kv_bh(b), jm[t], 0)
        ksf = vsf = None
        scale_block = scale_index = None

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
        qsegf = ksegf = None
        qseg_block = kseg_block = qseg_index = kseg_index = None

    num_groups, num_kv = pLq // group_q, pLk // block_k
    imap, jmap, flags, patv, patterns = _packed_schedule(
        num_groups, num_kv, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, kv_len=Lk, q_pack=q_pack, window=window)
    # Under dropout the softmax normalizer must sum the UNDROPPED p, so it
    # cannot ride the P·V ones column; under per-TOKEN-scaled KV the PV
    # operand is raw codes with scales folded into p, so an exact ones
    # column cannot ride either — l falls back to the (hidden-VPU) rowsum.
    # Channel-scaled codes are scale-free in-kernel, so the column rides.
    fold_l = _fold_l(d) and dropout_rate == 0.0 and not scaled
    seed_arr = jnp.atleast_1d(jnp.asarray(dropout_seed, jnp.int32))
    if seed_arr.shape[0] < 3:
        # [seed, batch_offset, head_offset] — offsets are nonzero only when
        # an outer shard_map packs them so the dropout hash sees GLOBAL
        # (batch, head) indices (layout-independent masks).
        seed_arr = jnp.pad(seed_arr, (0, 3 - seed_arr.shape[0]))
    if fast_exp is None:
        # Measured neutral-to-slightly-negative at the headline shape
        # (bench/exp_fast_softmax.py: fw 0.418 -> 0.431 ms, bw 0.860 ->
        # 0.849): the VPU softmax tail is already fully hidden behind the
        # MXU dots (bench/exp_fw_ablate.py: mask+exp+max together ~5%), so
        # halving its width buys nothing.  Kept as an explicit knob for
        # sweeps; fp32 inputs must never take it (exact-parity mode).
        fast_exp = False
    elif fast_exp and jnp.dtype(q.dtype).itemsize >= 4:
        raise ValueError(
            "fast_exp=True degrades the softmax tail to bf16 — fp32 inputs "
            "are exact-parity mode and must not take it")

    kernel = functools.partial(
        _fwd_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset, d=d, n_heads=H,
        quantized=quantized, scaled=scaled, q_pack=q_pack,
        dropout_rate=dropout_rate, window=window, segmented=segmented,
        fast_exp=fast_exp, patterns=patterns,
    )
    # Specs and operands are built CONDITIONALLY: dummy scale/segment
    # blocks still cost per-grid-step pipeline bookkeeping on the scalar
    # core (~the 1.3 us/step fixed cost scales with spec count), so the
    # common unquantized/unsegmented call carries 3 inputs, not 7 — and
    # the m output (FA1 residual reporting only) is emitted on request.
    in_specs = [
        pl.BlockSpec((1, group_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
        pl.BlockSpec(kv_block, kv_index),
        pl.BlockSpec(kv_block, kv_index),
    ]
    operands = [qf, kf, vf]
    if scaled:
        in_specs += [pl.BlockSpec(scale_block, scale_index),
                     pl.BlockSpec(scale_block, scale_index)]
        operands += [ksf, vsf]
    if segmented:
        in_specs += [pl.BlockSpec(qseg_block, qseg_index),
                     pl.BlockSpec(kseg_block, kseg_index)]
        operands += [qsegf, ksegf]
    row_spec = pl.BlockSpec((1, group_q, 1),
                            lambda b, t, im, jm, *r: (b, im[t], 0))
    out_specs = [
        pl.BlockSpec((1, group_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
        row_spec,
    ] + ([row_spec] if with_m else [])
    out_shape = [
        jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
        jax.ShapeDtypeStruct((B * H, pLq, 1), jnp.float32),
    ] + ([jax.ShapeDtypeStruct((B * H, pLq, 1), jnp.float32)]
         if with_m else [])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B * H, len(imap)),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((group_q, d + 1 if fold_l else d), jnp.float32),
            pltpu.VMEM((group_q, 1), jnp.float32),
        ] + ([] if fold_l else [pltpu.VMEM((group_q, 1), jnp.float32)]),
    )

    def kernel_wrapper(im, jm, fl, pt, sd, *rest):
        rest = list(rest)
        q_r, k_r, v_r = rest[:3]
        i = 3
        ks_r = vs_r = qs_r = ks2_r = None
        if scaled:
            ks_r, vs_r = rest[i:i + 2]
            i += 2
        if segmented:
            qs_r, ks2_r = rest[i:i + 2]
            i += 2
        o_r, lse_r = rest[i:i + 2]
        i += 2
        m_r = None
        if with_m:
            m_r = rest[i]
            i += 1
        scratch = rest[i:]
        if fold_l:
            acc, m_s = scratch
            l_s = None
        else:
            acc, m_s, l_s = scratch
        kernel(im, jm, fl, pt, sd, q_r, k_r, v_r, ks_r, vs_r, qs_r,
               ks2_r, o_r, lse_r, m_r, acc, m_s, l_s)

    results = pl.pallas_call(
        kernel_wrapper,
        grid_spec=grid_spec,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(imap), jnp.asarray(jmap), jnp.asarray(flags),
      jnp.asarray(patv), seed_arr, *operands)

    out, lse = results[0], results[1]
    out = out[:, :Lq].reshape(B, H, Lq, d)
    if quantized and not scaled:
        # Channel granularity: V's per-(head, d) scale applies once to the
        # normalized output — exact, since a per-d scale commutes with the
        # row softmax normalization (and empty rows stay exactly 0).
        vsb = jnp.repeat(v_scale, g, axis=1) if g > 1 else v_scale
        out = (out.astype(jnp.float32) * vsb[:, :, None, :]).astype(q.dtype)
    lse = lse[:, :Lq, 0].reshape(B, H, Lq)
    if not with_m:
        return out, lse, None
    m = results[2][:, :Lq, 0].reshape(B, H, Lq)
    return out, lse, m


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_s2_dp(q, k, v, do, i, j, *, scale, causal, block_q, block_k,
               kv_len, padded_kv, q_offset, window=None,
               qseg=None, kseg=None, kscale=None, vscale=None, wq=False,
               dl=False):
    """First half of the backward recompute for one (q, kv) tile pair: the
    two leading MXU dots (masked base-2 scores ``s2`` and ``dp = dO Vᵀ``)
    — independent of the VPU exp/ds chain, so the packed fused kernel can
    issue sub-tile h+1's dots before finishing sub-tile h.

    ``wq=True``: TRANSPOSED score space — s2/dp come out [w, bq] instead
    of [bq, w].  The three accumulation dots then contract the score
    tiles on their LAST axis: the measured axis-0 (implicitly transposed)
    contraction penalty (67 vs 81-88 TF/s, bench/exp_bw_residual probe)
    moves from TWO dots (dV, dK) to ONE (dQ).  ``qseg`` must then be
    [1, bq], ``kseg`` [w, 1], and the scales [w, 1].

    ``dl=True``: k/v are d-major [d, w] code tiles WITHOUT per-key scales
    (channel-granularity quantization — the scales were folded into
    q/do by the entry, so the dots run raw and scale-free)."""
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    if wq:
        if kscale is not None:
            # d-major codes [d, w]: contract d (axis 0)
            s2 = _dot(k, qs, ((0,), (1,))) * kscale      # [w, bq]
        elif dl:
            s2 = _dot(k, qs, ((0,), (1,)))               # [w, bq]
        else:
            s2 = _dot(k, qs, ((1,), (1,)))               # [w, bq]
    elif kscale is not None:
        # quantized: k/v are d-major RAW code tiles [d, w]; the per-key
        # dequant scales fold into the scores / dp (hidden VPU side) —
        # see the forward kernel's layout comment.
        s2 = _dot(qs, k, ((1,), (0,))) * kscale
    elif dl:
        s2 = _dot(qs, k, ((1,), (0,)))
    else:
        s2 = _dot(qs, k, ((1,), (1,)))
    if causal or padded_kv or qseg is not None:
        s2 = _apply_mask(
            s2, i, j, block_q=block_q, block_k=block_k,
            causal=causal, kv_len=kv_len, q_offset=q_offset,
            padded_kv=padded_kv, window=window, qseg=qseg, kseg=kseg,
            transposed=wq)
    if wq:
        if vscale is not None:
            dp = _dot(v, do, ((0,), (1,))) * vscale      # [w, bq]
        elif dl:
            dp = _dot(v, do, ((0,), (1,)))               # [w, bq]
        else:
            dp = _dot(v, do, ((1,), (1,)))               # [w, bq]
    elif vscale is not None:
        dp = _dot(do, v, ((1,), (0,))) * vscale
    elif dl:
        dp = _dot(do, v, ((1,), (0,)))
    else:
        dp = _dot(do, v, ((1,), (1,)))
    return s2, dp


def _bwd_finish(s2, dp, lse, delta, i, j, *, block_q, block_k,
                dropout_rate=0.0, b=None, h=None, seed=None,
                fast_exp=False, wq=False):
    """Second half: the VPU exp/dropout/ds chain.  Returns ``(p_dv, ds)``.

    Rows with ``lse = -inf`` (empty attention: no visible keys under the
    causal mask, see the forward epilogue) contribute exactly zero:
    ``exp2(s - inf) == 0`` guards what would otherwise be ``exp2(+inf)``.

    ``wq=True``: s2/dp are [w, bq] and ``lse``/``delta`` arrive [1, bq]
    (broadcast down the key axis instead of across it).
    """
    lse2 = jnp.where(jnp.isneginf(lse), jnp.inf, lse * LOG2E)
    # fast_exp (bf16 inputs): the whole p/ds tail runs on bf16 vectors —
    # exp2 at double lanes, and p/ds feed the five MXU dots with no
    # further cast.  Same error budget as the forward's fast path (the
    # operands were cast to bf16 for the dots before anyway).
    p_dtype = jnp.bfloat16 if fast_exp else jnp.float32
    p = jnp.exp2((s2 - lse2).astype(p_dtype))       # [bq, bk] ([w, bq] wq)
    if dropout_rate > 0.0:
        # The keep mask scales dp BEFORE the delta subtraction
        # (ds = p ∘ (dP̃ - delta) with dP̃ = (dO Vᵀ)∘M/(1-r)).
        keep_scale = _tile_keep_scale(
            i, j, s2.shape, block_q=block_q, block_k=block_k, b=b, h=h,
            seed=seed, rate=dropout_rate, transposed=wq)
        dp = dp * keep_scale
        p_dv = p * keep_scale.astype(p_dtype)
    else:
        p_dv = p
    ds = p * (dp - delta).astype(p_dtype)
    return p_dv, ds


def _bwd_p_ds(q, k, v, do, lse, delta, i, j, *, scale, causal, block_q,
              block_k, kv_len, padded_kv, q_offset, d,
              dropout_rate=0.0, b=None, h=None, seed=None, window=None,
              qseg=None, kseg=None, fast_exp=False,
              kscale=None, vscale=None, dl=False):
    """Shared backward recompute for one (q, kv) tile pair: returns
    ``(p_dv, ds)`` — used identically by the fused, dK/dV and dQ kernels so
    the three cannot drift apart (the fused kernel calls the two halves
    directly to software-pipeline packed sub-tiles).  ``p_dv`` is the matrix
    that left-multiplies dO for dV: the plain softmax ``p`` without dropout,
    and the mask-scaled ``p * keep/(1-rate)`` with it.

    Dropout math (out = (P∘M/(1-r)) V with M the keep mask): the saved
    ``delta = rowsum(dO·O)`` already equals ``rowsum(P ∘ dP̃)`` for
    ``dP̃ = (dO Vᵀ)∘M/(1-r)``, so ``ds = p∘(dP̃ - delta)`` holds with the
    same delta — only dp and the dV operand pick up the regenerated mask.
    """
    s2, dp = _bwd_s2_dp(
        q, k, v, do, i, j, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=kv_len, padded_kv=padded_kv,
        q_offset=q_offset, window=window, qseg=qseg, kseg=kseg,
        kscale=kscale, vscale=vscale, dl=dl)
    return _bwd_finish(
        s2, dp, lse, delta, i, j, block_q=block_q, block_k=block_k,
        dropout_rate=dropout_rate, b=b, h=h, seed=seed, fast_exp=fast_exp)


def _bwd_dkv_kernel(
    imap_ref, jmap_ref, flags_ref, pat_ref, seed_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d, aug,
    n_heads, quantized, scaled, dropout_rate, window, segmented, fast_exp,
    q_pack, patterns,
):
    """dK/dV pass of the two-pass backward (engages when the fused form's
    full-sequence dQ scratch cannot fit VMEM, L>=16k bf16): the same
    packed KV-outer group body as the fused kernel, minus dQ."""
    _bwd_kv_outer_body(
        imap_ref, jmap_ref, flags_ref, pat_ref, seed_ref,
        q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
        do_ref, lse_ref, delta_ref,
        dk_ref, dv_ref, None, dk_acc, dv_acc, None,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=kv_len, padded_kv=padded_kv, q_offset=q_offset, d=d, aug=aug,
        n_steps=0, n_heads=n_heads, quantized=quantized, scaled=scaled,
        dropout_rate=dropout_rate, window=window, segmented=segmented,
        fast_exp=fast_exp, q_pack=q_pack, patterns=patterns)


def _bwd_dq_kernel(
    imap_ref, jmap_ref, flags_ref, wmap_ref, seed_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dq_ref,
    dq_acc,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d, aug,
    n_heads, quantized, scaled, dropout_rate, window, segmented, fast_exp,
    widths,
):
    t = pl.program_id(1)
    bh = pl.program_id(0)
    gb, gh = _global_bh(bh, n_heads, seed_ref)
    flags = flags_ref[t]
    wc = wmap_ref[t]

    @pl.when((flags & _FIRST) != 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    def _body(w):
        if quantized:
            kq = cast_codes(k_ref[0][:, :w], q_ref.dtype)   # [d, w] codes
            vq = cast_codes(v_ref[0][:, :w], q_ref.dtype)
            if scaled:
                kscale, vscale = ks_ref[0][:, :w], vs_ref[0][:, :w]
            else:
                kscale = vscale = None      # channel: entry-folded
        else:
            kq, vq = k_ref[0, :w], v_ref[0, :w]         # [w, d]
            kscale = vscale = None
        _, ds = _bwd_p_ds(
            q_ref[0], kq, vq, do_ref[0], lse_ref[0], delta_ref[0],
            imap_ref[t], jmap_ref[t], scale=scale, causal=causal,
            block_q=block_q, block_k=block_k, kv_len=kv_len,
            padded_kv=padded_kv, q_offset=q_offset, d=d,
            dropout_rate=dropout_rate, b=gb, h=gh,
            seed=seed_ref[0], window=window,
            qseg=qseg_ref[0] if segmented else None,
            kseg=kseg_ref[0][:, :w] if segmented else None,
            fast_exp=fast_exp, kscale=kscale, vscale=vscale,
            dl=quantized and not scaled)
        # dQ += dS K  (tau applied once at the end)
        # dQ (dequant space) = (dS ∘ kscale) · codes^T; the augmented
        # ones ROW keeps the N=65 output geometry (column discarded).
        # Channel granularity: plain code-space dS·codes^T (the entry
        # multiplies the dq OUTPUT by K's [d] scale).
        if quantized:
            dsk = ((ds * kscale.astype(ds.dtype)).astype(kq.dtype)
                   if scaled else ds.astype(kq.dtype))
            kq_op = (jnp.concatenate(
                [kq, jnp.ones((1, kq.shape[1]), kq.dtype)], axis=0)
                if aug else kq)                     # [d(+1), w]
            dq_upd = _dot(dsk, kq_op, ((1,), (1,)))
        else:
            dq_upd = _dot(ds.astype(kq.dtype),
                          _ones_col(kq) if aug else kq, ((1,), (0,)))
        dq_acc[:] += dq_upd

    for ci, w in enumerate(widths):
        @pl.when(((flags & _LIVE) != 0) & (wc == ci))
        def _live_body(w=w):
            _body(w)

    @pl.when((flags & _LAST) != 0)
    def _epilogue():
        dq_ref[0] = (scale * dq_acc[:, :d]).astype(dq_ref.dtype)


def _bwd_fused_kernel(
    imap_ref, jmap_ref, flags_ref, pat_ref, seed_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dq_ref,
    dk_acc, dv_acc, dq_acc, dq_stage=None, dq_sem=None,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d, aug,
    n_steps, n_heads, quantized, scaled, dropout_rate, window, segmented,
    fast_exp, q_pack, patterns, score_wq=False,
):
    """Single-pass backward: the packed KV-outer body with the dQ
    full-sequence accumulator enabled (``dq_stage``/``dq_sem`` present in
    the HBM-output mode)."""
    _bwd_kv_outer_body(
        imap_ref, jmap_ref, flags_ref, pat_ref, seed_ref,
        q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
        do_ref, lse_ref, delta_ref,
        dk_ref, dv_ref, dq_ref, dk_acc, dv_acc, dq_acc, dq_stage, dq_sem,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=kv_len, padded_kv=padded_kv, q_offset=q_offset, d=d, aug=aug,
        n_steps=n_steps, n_heads=n_heads, quantized=quantized,
        scaled=scaled, dropout_rate=dropout_rate, window=window,
        segmented=segmented, fast_exp=fast_exp, q_pack=q_pack,
        patterns=patterns, score_wq=score_wq)


def _bwd_kv_outer_body(
    imap_ref, jmap_ref, flags_ref, pat_ref, seed_ref,
    q_ref, k_ref, v_ref, ks_ref, vs_ref, qseg_ref, kseg_ref,
    do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dq_ref,
    dk_acc, dv_acc, dq_acc, dq_stage=None, dq_sem=None,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d, aug,
    n_steps, n_heads, quantized, scaled, dropout_rate, window, segmented,
    fast_exp, q_pack, patterns, score_wq=False,
):
    """Packed KV-outer backward body — dK/dV accumulate per KV tile; with
    ``dq_acc`` (the fused single-pass form) dQ additionally accumulates
    into a full-sequence fp32 VMEM scratch (``[pLq, d(+1)]``) indexed by
    the current Q sub-tile — the grid for one (batch, head) runs
    sequentially on a TensorCore, so this is the race-free TPU replacement
    for the reference's ``atomicAdd`` dQ (src/flash_attn2_bw.cpp:228) that
    also skips the entire second pass (and its recomputation of S and dP:
    5 MXU dots per tile pair instead of 7, plus one less read of
    Q/K/V/dO).  With ``dq_acc=None`` this is the dK/dV pass of the
    two-pass fallback.

    Like the forward, each grid step processes a GROUP of ``q_pack``
    consecutive Q sub-tiles against the current KV tile (amortizing the
    ~1.3 us fixed grid-step cost — the dominant backward residual at long
    L, see ``_packed_kv_schedule``), each sub-tile's dots at its static
    width class, with the chains software-pipelined one step ahead: sub-
    tile h+1's two leading dots (s2, dp) are issued before sub-tile h's
    VPU exp/ds chain and accumulation dots, so independent chains' MXU and
    VPU phases overlap while at most two sub-tiles' score tiles are live
    in scoped VMEM (all-dots-first would OOM exactly like the forward)."""
    t = pl.program_id(1)
    bh = pl.program_id(0)
    gb, gh = _global_bh(bh, n_heads, seed_ref)
    flags = flags_ref[t]
    pat = pat_ref[t]

    if dq_acc is not None:
        @pl.when(t == 0)
        def _init_dq():
            dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when((flags & _FIRST) != 0)
    def _init_kv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    def dots(h, w):
        """Sub-tile h's two leading MXU dots at width w."""
        sel = pl.ds(h * block_q, block_q)
        if quantized:
            kq = cast_codes(k_ref[0][:, :w], q_ref.dtype)   # [d, w] codes
            vq = cast_codes(v_ref[0][:, :w], q_ref.dtype)
            if not scaled:
                kscale = vscale = None      # channel: entry-folded scales
            elif score_wq:
                # [1, w] rows -> [w, 1] columns (4KB in-kernel transpose;
                # the column OPERAND layout would pad to 128 lanes)
                kscale = jnp.transpose(ks_ref[0][:, :w])
                vscale = jnp.transpose(vs_ref[0][:, :w])
            else:
                kscale, vscale = ks_ref[0][:, :w], vs_ref[0][:, :w]
        else:
            kq, vq = k_ref[0, :w], v_ref[0, :w]             # [w, d]
            kscale = vscale = None
        if segmented:
            qseg = (qseg_ref[0, :, sel] if score_wq        # [1, bq]
                    else qseg_ref[0, sel])                 # [bq, 1]
            kseg = (kseg_ref[0, :w] if score_wq            # [w, 1]
                    else kseg_ref[0][:, :w])               # [1, w]
        else:
            qseg = kseg = None
        s2, dp = _bwd_s2_dp(
            q_ref[0, sel], kq, vq, do_ref[0, sel],
            imap_ref[t] * q_pack + h, jmap_ref[t], scale=scale,
            causal=causal, block_q=block_q, block_k=block_k, kv_len=kv_len,
            padded_kv=padded_kv, q_offset=q_offset, window=window,
            qseg=qseg, kseg=kseg, kscale=kscale, vscale=vscale,
            wq=score_wq, dl=quantized and not scaled)
        return s2, dp, kq, kscale

    def finish(s2, dp, kq, kscale, h, w):
        """Sub-tile h's VPU chain + the three accumulation dots."""
        sel = pl.ds(h * block_q, block_q)
        if score_wq:
            lse, dl = lse_ref[0, :, sel], delta_ref[0, :, sel]   # [1, bq]
        else:
            lse, dl = lse_ref[0, sel], delta_ref[0, sel]         # [bq, 1]
        p, ds = _bwd_finish(
            s2, dp, lse, dl,
            imap_ref[t] * q_pack + h, jmap_ref[t], block_q=block_q,
            block_k=block_k, dropout_rate=dropout_rate, b=gb, h=gh,
            seed=seed_ref[0], fast_exp=fast_exp, wq=score_wq)
        q, do = q_ref[0, sel], do_ref[0, sel]
        if score_wq:
            # [w, bq] score tiles contract their LAST axis for dV/dK —
            # the natural (unpenalized) MXU form; dQ takes the one
            # remaining axis-0 contraction.
            dv_acc[0:w] += _dot(p.astype(do.dtype),
                                _ones_col(do) if aug else do, ((1,), (0,)))
            dk_acc[0:w] += _dot(ds.astype(q.dtype),
                                _ones_col(q) if aug else q, ((1,), (0,)))
        else:
            dv_acc[0:w] += _dot(p.astype(do.dtype),
                                _ones_col(do) if aug else do, ((0,), (0,)))
            dk_acc[0:w] += _dot(ds.astype(q.dtype),
                                _ones_col(q) if aug else q, ((0,), (0,)))
        if dq_acc is None:
            return
        row0 = pl.multiple_of((imap_ref[t] * q_pack + h) * block_q, block_q)
        # dQ (dequant space) = (dS ∘ kscale) · codes^T; the augmented
        # ones ROW keeps the N=65 output geometry (column discarded).
        # Channel granularity: code-space dS · codes^T raw (the entry
        # multiplies the dq OUTPUT by K's [d] scale — kscale is None).
        if score_wq:
            if quantized:
                dsk = ((ds * kscale.astype(ds.dtype)).astype(kq.dtype)
                       if scaled else ds.astype(kq.dtype))
                kq_op = (jnp.concatenate(
                    [kq, jnp.ones((1, kq.shape[1]), kq.dtype)], axis=0)
                    if aug else kq)                 # [d(+1), w]
                dq_upd = _dot(dsk, kq_op, ((0,), (1,)))      # [bq, d(+1)]
            else:
                dq_upd = _dot(ds.astype(kq.dtype),
                              _ones_col(kq) if aug else kq, ((0,), (0,)))
        elif quantized:
            dsk = ((ds * kscale.astype(ds.dtype)).astype(kq.dtype)
                   if scaled else ds.astype(kq.dtype))
            kq_op = (jnp.concatenate(
                [kq, jnp.ones((1, kq.shape[1]), kq.dtype)], axis=0)
                if aug else kq)                     # [d(+1), w]
            dq_upd = _dot(dsk, kq_op, ((1,), (1,)))
        else:
            dq_upd = _dot(ds.astype(kq.dtype),
                          _ones_col(kq) if aug else kq, ((1,), (0,)))
        dq_acc[pl.ds(row0, block_q), :] += dq_upd

    for pid, vec in enumerate(patterns):
        if not any(vec):
            continue        # forced visit: output write only (epilogue)

        @pl.when(((flags & _LIVE) != 0) & (pat == pid))
        def _branch(vec=vec):
            pending = None
            for h, w in enumerate(vec):
                if w == 0:
                    continue
                sd = dots(h, w)
                if pending is not None:
                    finish(*pending)
                pending = (*sd, h, w)
            if pending is not None:
                finish(*pending)

    @pl.when((flags & _LAST) != 0)
    def _epilogue_kv():
        dk_ref[0] = (scale * dk_acc[:, :d]).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:, :d].astype(dv_ref.dtype)

    if dq_acc is not None and dq_stage is not None:
        # dQ output lives in HBM (pl.ANY): no pipelined output block, so
        # the full-sequence configs whose triple-buffered dq output would
        # blow scoped VMEM (L>=16k) can still run the 5-dot single pass.
        # At this (b,h) row's last step, convert the fp32 scratch in
        # group-sized chunks through a small staging tile and DMA each to
        # its slice — ~1-3 us per (b,h), nothing against the row's compute.
        # The staging tile and the HBM array are LANE-PADDED to 128 (DMA
        # slices must align to the (8,128) tiling — a d=64 slice cannot
        # DMA; the wrapper slices the pad columns off outside).
        @pl.when(t == n_steps - 1)
        def _epilogue_dq_hbm():
            rows, dpad = dq_stage.shape
            n_chunks = dq_acc.shape[0] // rows
            if dpad > d:
                # pad lanes once; the loop only rewrites [:, :d]
                dq_stage[:, d:] = jnp.zeros((rows, dpad - d),
                                            dq_stage.dtype)

            # fori_loop, NOT a python loop: an unrolled chunk loop keeps
            # every chunk's conversion temp live (observed: +6M scoped
            # vmem at L=16k -> OOM); the sequential loop holds one.
            def chunk(c, carry):
                row0 = pl.multiple_of(c * rows, rows)
                dq_stage[:, :d] = (
                    scale * dq_acc[pl.ds(row0, rows), :d]
                ).astype(dq_stage.dtype)
                cp = pltpu.make_async_copy(
                    dq_stage, dq_ref.at[bh, pl.ds(row0, rows), :], dq_sem)
                cp.start()
                cp.wait()
                return carry

            jax.lax.fori_loop(0, n_chunks, chunk, 0)
    elif dq_acc is not None:
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


# Scoped-VMEM caps for the fused single-pass backward (round 1 gated it on
# a flat dQ-scratch budget; round 2 replaced that with the explicit
# footprint model in flash_attention_backward — block_k clamps until the
# modeled footprint fits the cap, and the two-pass form engages, keeping
# the wide tile, only when no block_k fits).  Calibrated against observed
# Mosaic outcomes; fp32 is tighter because HIGHEST-precision dots carry
# operand splits the model cannot see.
_FUSED_VMEM_CAP_BF16 = int(12.5 * 1024 * 1024)
_FUSED_VMEM_CAP_FP32 = int(9.5 * 1024 * 1024)


def select_bwd_fused_config(Lq, Lk, d, *, block_q, block_k, causal,
                            q_offset, itemsize, q_pack=None, window=None,
                            wq_cols=0):
    """Joint (block_q, q_pack, block_k) choice for the fused single-pass
    backward.

    Head-dim geometry rule (r5): d=64 dots stay PER-HEAD — stacking two
    heads block-diagonally into one K=128 contraction was measured
    (bench/exp_two_head_pack, fixed-GRID rerun 2026-08-21): the bf16
    score dot gains +7.7% row-stacked (94.8 -> 102.1 TF/s useful) but
    the PV dot LOSES 4% (95.9 -> 92.1) and the axis-0 accumulation dot
    is flat (87.3 -> 86.2), so a packed schedule nets ~+1.5% at best for
    doubled VMEM live state; in fp32 every packed form loses outright
    (16.6 -> 15.6 TF/s qk).  fp32 d=64's absolute rate is the
    Precision.HIGHEST multi-pass cost, not MXU fill: per-dot fp32 rates
    are 15-18 TF/s for ALL geometries and the production fp32 backward
    runs at 1.012x its executed-dot floor at L=1024
    (bench/exp_fp32_floor).

    The fused kernel's scoped-VMEM footprint grows with the KV tile
    (score-chain temps, dk/dv accumulators), the sequence (full-sequence
    dq scratch + buffered dq output) AND the Q-pack width (group-sized
    Q/dO tiles; a packed body keeps up to two sub-tiles' score chains
    live — the one-step-ahead pipeline).  Pick the candidate MINIMIZING
    GRID STEPS under the footprint cap: the ~1.3 us fixed per-step cost
    is the dominant backward residual at long L (576 unpacked steps at
    L=8192 ~= 0.75 ms of the ~2.5 ms backward —
    bench/exp_bw_residual.py).  Ties prefer the wider KV tile, then the
    NARROWER sub-tile (finer chains pipeline the VPU tail better and the
    finer width classes trim more causal-diagonal dot volume — the same
    findings as the forward's 8x256 retune).  ``block_q=None`` considers
    both 512- and 256-row sub-tiles.  If nothing fits, the two-pass form
    engages (its per-step footprint has no full-sequence terms).

    Returns ``(will_fuse, block_q, q_pack, block_k, pLq, dq_hbm)`` —
    ``dq_hbm`` selects the HBM dQ output (no pipelined output block, a
    staging tile + manual DMA instead): it frees the triple-buffered
    ``3*pLq*d`` output term, which is what unlocks the 5-dot single pass
    at L>=16k.
    """
    dwf = d + 1 if _fold_l(d) else d

    def footprint(bq, bk, pack, pLq_, hbm):
        # Calibrated against observed Mosaic scoped-vmem outcomes (round 2:
        # L=2048/bk=2048 compiles at model 12.1M, L=8192/bk=2048 OOMs at
        # 21.75M, L=16384/bk=512 OOMs at 19.75M -> two-pass).  The dq
        # output block is counted triple-buffered — that is what the
        # observed failures calibrate to.
        score_tiles = 2 if pack == 1 else 4   # pipelined: two chains live
        if hbm and pack == 1:
            # observed: 1x512x2048-hbm at L=8192 allocated 16.63M vs the
            # 2-tile model's 12.97M — without the packed pipeline
            # structure Mosaic keeps a third score-chain tile live
            score_tiles = 3
        # hbm: the staging tile (lane-padded) + one live fp32 conversion
        # temp in the sequential chunk loop + an observed EXTRA scratch-
        # sized allocation (L=16k 8x256x1024-hbm allocated 16.50M vs the
        # 11.6M base model — consistent with Mosaic double-buffering the
        # full-sequence dq scratch around the manual DMA)
        group_rows = min(pLq_, bq * pack)
        dq_out = (group_rows * round_up(d, 128) * itemsize
                  + group_rows * d * 4
                  + pLq_ * dwf * 4 if hbm
                  else 3 * pLq_ * d * itemsize)  # buffered output block
        return (score_tiles * bq * bk * 4   # live fp32 score-chain tiles
                + 2 * bk * dwf * 4          # dk/dv accumulators
                + pLq_ * dwf * 4            # full-sequence dq scratch
                + dq_out
                + 4 * bk * d * itemsize     # double-buffered K/V tiles
                + 4 * pack * bq * d * itemsize   # dbl-buf Q/dO groups
                # wq score layout: per-key column operands ([bk, 1]
                # scale/segment blocks) pad to 128 lanes in VMEM — an
                # observed ~3x-buffered 0.5M/block cost at bk=1024 that
                # OOM'd the int8-wq L=8192 form (16.16M vs the 16M limit)
                + wq_cols * 3 * bk * 128 * 4)

    # fp32 boundary observed between 8.9M (compiles) and 11.8M (OOMs);
    # bf16 between 12.1M (compiles) and 13.4M (OOMs) — see the module caps.
    cap = _FUSED_VMEM_CAP_FP32 if itemsize >= 4 else _FUSED_VMEM_CAP_BF16
    bq_candidates = ([block_q] if block_q is not None
                     else [min(b, round_up(Lq, 8)) for b in (512, 256)])
    best = None     # ((steps, -bk, bq, hbm), bq, pack, bk, pLq, hbm)
    for bq in dict.fromkeys(bq_candidates):
        num_q_tiles = round_up(Lq, bq) // bq
        if q_pack is not None:
            pack_candidates = [max(1, min(q_pack, num_q_tiles))]
        elif itemsize >= 4 and d >= 128:
            # fp32 d=128 packed fused measured 8.85 ms vs the round-2
            # unpacked form's 5.18 at L=2048 (bench/exp_fp32_configs
            # 2026-08-20) — HIGHEST-precision operand splits at the wide
            # head spill; d=64 fp32 packing measured a 17% WIN (L=1024
            # 1.576 -> 1.311 ms), so only the wide-head fp32 case unpacks.
            pack_candidates = [1]
        else:
            pack_candidates = [p for p in (8, 4, 2, 1) if p <= num_q_tiles]
        for pack in pack_candidates:
            pLq_p = round_up(Lq, bq * pack)
            # hbm is bf16-only: fp32 HIGHEST dots carry operand splits the
            # model cannot see (a 4x256x512-hbm fp32 L=8192 config modeled
            # 7.1M allocated 16.04M on-chip) — fp32 keeps the proven
            # pipelined-output forms
            # hbm is proven only at moderate sequence extents: every
            # L=16384 hbm config allocated 16.1-16.8M on-chip regardless
            # of tile sizes (an unmodeled ~pLq-scaled allocation), while
            # L=8192 hbm forms compile and run.  bf16-only, pLq<=8192.
            hbm_ok = itemsize == 2 and pLq_p <= 8192 and wq_cols == 0
            hbm_opts = (False, True) if hbm_ok else (False,)
            for hbm in hbm_opts:
                # the hbm model carries its own calibrated overhead terms,
                # so its residual error is small — judge it against a
                # nearer-hardware cap (16M) instead of the conservative
                # pipelined-mode cap
                cap_m = int(14.0 * 1024 * 1024) if hbm else cap
                bk_p = block_k
                while bk_p > 512 and \
                        footprint(bq, bk_p, pack, pLq_p, hbm) > cap_m:
                    bk_p //= 2
                if footprint(bq, bk_p, pack, pLq_p, hbm) > cap_m:
                    continue
                gmap_p, *_ = _packed_kv_schedule(
                    pLq_p // (bq * pack), round_up(Lk, bk_p) // bk_p,
                    block_q=bq, block_k=bk_p, causal=causal,
                    q_offset=q_offset, kv_len=Lk, q_pack=pack,
                    window=window)
                key = (len(gmap_p), -bk_p, bq, hbm)
                if best is None or key < best[0]:
                    best = (key, bq, pack, bk_p, pLq_p, hbm)
    if best is None:
        if q_pack is not None and q_pack > 1:
            # Sweep mode asked for a specific pack but no fused config
            # fits the footprint model: surface the fallback so a sweep
            # cannot silently record the unpacked two-pass time as
            # "q_pack=N" (ADVICE r4).
            import warnings
            warnings.warn(
                f"requested q_pack={q_pack} has no fused config under the "
                f"VMEM footprint model (Lq={Lq}, Lk={Lk}, d={d}, "
                f"itemsize={itemsize}); falling back to the UNPACKED "
                f"two-pass form", stacklevel=3)
        bq = block_q or DEFAULT_BLOCK_Q_BWD
        bq = min(bq, round_up(Lq, 8))
        return False, bq, 1, block_k, round_up(Lq, bq), False
    _, bq, pack, bk, pLq, hbm = best
    if q_pack is not None:      # explicit pack = sweep mode: honor it
        return True, bq, pack, bk, pLq, hbm

    # A fitting fused config is not automatically the right one: at
    # L=16k only narrow unpacked tiles fit (the full-sequence dq terms),
    # and their thousands of grid steps cost more than the two-pass
    # form's two extra dots.  Compare simple cost models — executed MACs
    # at the calibrated ~92 TF/s in-kernel d=64 rate (5 dots/pair fused,
    # 7 across the two passes) plus ~1.3 us per grid step — and fuse only
    # when fused wins.
    bq2 = min(block_q or DEFAULT_BLOCK_Q_BWD, round_up(Lq, 8))
    pack2, bk2, pLq2 = select_bwd_dkv_config(
        Lq, Lk, d, block_q=bq2, block_k=block_k, causal=causal,
        q_offset=q_offset, itemsize=itemsize, window=window)
    s_dkv, *_ = _packed_kv_schedule(
        pLq2 // (bq2 * pack2), round_up(Lk, bk2) // bk2, block_q=bq2,
        block_k=bk2, causal=causal, q_offset=q_offset, kv_len=Lk,
        q_pack=pack2, window=window)
    s_dq, _, _, _, _ = _tile_schedule(
        round_up(Lq, bq2) // bq2, round_up(Lk, block_k) // block_k,
        block_q=bq2, block_k=block_k, causal=causal, q_offset=q_offset,
        kv_len=Lk, kv_outer=False, window=window)
    gmap_f, _, fl_f, pat_f, patterns_f = _packed_kv_schedule(
        pLq // (bq * pack), round_up(Lk, bk) // bk, block_q=bq,
        block_k=bk, causal=causal, q_offset=q_offset, kv_len=Lk,
        q_pack=pack, window=window)
    macs = sum(bq * w * d
               for f, pv in zip(fl_f, pat_f) if int(f) & _LIVE
               for w in patterns_f[int(pv)]) * 2.0
    c_step, rate = 1.3e-6, 92e12 / 2.0     # MAC/s
    fused_cost = 5 * macs / rate + len(gmap_f) * c_step
    twopass_cost = 7 * macs / rate + (len(s_dkv) + len(s_dq)) * c_step
    if fused_cost > twopass_cost:
        return False, bq2, 1, block_k, round_up(Lq, bq2), False
    return True, bq, pack, bk, pLq, hbm


def select_bwd_dkv_config(Lq, Lk, d, *, block_q, block_k, causal, q_offset,
                          itemsize, window=None):
    """(q_pack, block_k) for the two-pass dK/dV kernel — same
    step-minimizing policy as the fused selector but with no
    full-sequence footprint terms (the two-pass form exists precisely
    because those don't fit).  Returns ``(q_pack, bk, pLq)``."""
    dwf = d + 1 if _fold_l(d) else d

    def footprint(bk, pack):
        score_tiles = 2 if pack == 1 else 4
        return (score_tiles * block_q * bk * 4
                + 2 * bk * dwf * 4              # dk/dv accumulators
                + 4 * bk * d * itemsize         # double-buffered K/V tiles
                + 6 * bk * d * itemsize         # dk/dv output blocks
                + 4 * pack * block_q * d * itemsize)

    cap = _FUSED_VMEM_CAP_FP32 if itemsize >= 4 else _FUSED_VMEM_CAP_BF16
    num_q_tiles = round_up(Lq, block_q) // block_q
    best = None
    # The two-pass dK/dV stays UNPACKED: packed-group variants measured
    # 2-8x SLOWER on-chip (bf16 L=16k 21.1 ms vs 11.7 unpacked; fp32
    # L=8k 30.7 vs 21.4) — the near-cap footprints apparently spill.
    # The packing machinery remains for future toolchains.
    packs = [1]
    for pack in [p for p in packs if p <= num_q_tiles]:
        bk_p = block_k
        while bk_p > 512 and footprint(bk_p, pack) > cap:
            bk_p //= 2
        if footprint(bk_p, pack) > cap:
            continue
        pLq_p = round_up(Lq, block_q * pack)
        gmap_p, *_ = _packed_kv_schedule(
            pLq_p // (block_q * pack), round_up(Lk, bk_p) // bk_p,
            block_q=block_q, block_k=bk_p, causal=causal,
            q_offset=q_offset, kv_len=Lk, q_pack=pack, window=window)
        key = (len(gmap_p), -bk_p)
        if best is None or key < best[0]:
            best = (key, pack, bk_p, pLq_p)
    if best is None:        # unpacked narrow tile always fits in practice
        return 1, min(block_k, 512), round_up(Lq, block_q)
    _, pack, bk, pLq = best
    return pack, bk, pLq


@functools.partial(
    jax.jit,
    static_argnames=("causal", "scale", "block_q", "block_k", "q_pack",
                     "dropout_rate", "window", "q_offset", "kv_layout",
                     "kv_scale_mode", "fast_exp", "score_layout",
                     "interpret"),
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
    block_q: int | None = None,
    block_k: int = DEFAULT_BLOCK_K_BWD,
    q_pack: int | None = None,
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int = 0,
    window: int | None = None,
    segment_ids: jax.Array | None = None,
    q_offset: int | None = None,
    kv_layout: str = "ld",
    kv_scale_mode: str = "token",
    fast_exp: bool | None = None,
    score_layout: str | None = None,
    interpret: bool | None = None,
):
    """Flash-attention backward: returns (dq, dk, dv) for [B, H, L, d] inputs.

    ``kv_scale_mode`` mirrors the forward: ``"token"`` scales ([B, H, Lk])
    fold per-tile inside the kernel; ``"channel"`` scales ([B, H, d]) fold
    into Q / dO before the kernel and un-fold on the outputs (dq·ks,
    dk/ks, dv/vs — all exact per-d rescalings in fp32), so the kernel
    bodies run completely scale-free ("free dequant", VERDICT r4 #1).

    Default: ONE race-free pass over the packed live-tile schedule — dK/dV
    accumulate per KV tile, dQ accumulates into a full-sequence VMEM scratch
    (see ``_bwd_fused_kernel``); sequences whose dQ scratch would overflow
    VMEM fall back to the classic two-pass (dK/dV then dQ) form.  Either way
    this replaces the reference's atomicAdd accumulation
    (src/flash_attn2_bw.cpp:228).  Works for both the FA1 and FA2 residual
    conventions because ``(1/l)·exp(S-m) == exp(S-lse)`` with
    ``lse = m + log l``.

    ``q_pack`` (None = auto): Q sub-tiles processed per grid step of the
    fused form.  Auto jointly picks (q_pack, block_k) minimizing grid
    steps under the scoped-VMEM footprint model — the fixed ~1.3 us/step
    cost dominates the backward residual at long L
    (bench/exp_bw_residual.py).
    """
    if interpret is None:
        interpret = default_interpret()
    B, H, Lq, d = q.shape
    Hkv = k.shape[1]
    if H % Hkv:
        raise ValueError(f"query heads ({H}) must be a multiple of KV "
                         f"heads ({Hkv})")
    g = H // Hkv
    quantized = k_scale is not None
    if kv_scale_mode not in ("token", "channel"):
        raise ValueError(f"kv_scale_mode must be 'token' or 'channel', "
                         f"got {kv_scale_mode!r}")
    scaled = quantized and kv_scale_mode == "token"
    if kv_layout not in ("ld", "dl"):
        raise ValueError(f"kv_layout must be 'ld' or 'dl', got {kv_layout!r}")
    transposed_in = quantized and kv_layout == "dl"
    Lk = k.shape[-1] if transposed_in else k.shape[-2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))
    if window is not None and not causal:
        raise ValueError("window requires causal=True")
    if fast_exp is None:
        # Measured neutral-to-slightly-negative at the headline shape
        # (bench/exp_fast_softmax.py: fw 0.418 -> 0.431 ms, bw 0.860 ->
        # 0.849): the VPU softmax tail is already fully hidden behind the
        # MXU dots (bench/exp_fw_ablate.py: mask+exp+max together ~5%), so
        # halving its width buys nothing.  Kept as an explicit knob for
        # sweeps; fp32 inputs must never take it (exact-parity mode).
        fast_exp = False
    elif fast_exp and jnp.dtype(q.dtype).itemsize >= 4:
        raise ValueError(
            "fast_exp=True degrades the softmax tail to bf16 — fp32 inputs "
            "are exact-parity mode and must not take it")

    if block_q is not None:
        block_q = min(block_q, round_up(Lq, 8))
    block_k = min(block_k, round_up(Lk, 8))
    if jnp.dtype(q.dtype).itemsize >= 4:
        # fp32 HIGHEST-precision dots hold multi-pass operand splits in
        # scoped VMEM on top of the fp32 score-chain temps — the wide
        # bf16-tuned KV tile does not fit (d=128 fp32 at bk=1024 still
        # demanded 18.53M); 512 is the round-1-proven fp32 tile.
        block_k = min(block_k, 512)
    if q_offset is None:
        q_offset = Lk - Lq

    ib = jnp.dtype(q.dtype).itemsize
    if score_layout not in (None, "qw", "wq"):
        # validate BEFORE the auto rule / selector consume it (ADVICE r4)
        raise ValueError(f"score_layout must be None, 'qw' or 'wq', got "
                         f"{score_layout!r}")
    if score_layout is None:
        # Measured auto rule (bench/exp_bw_residual wqx, 2026-08-20): the
        # transposed score space wins for unquantized bf16 (L=2048 bw
        # 0.731 -> 0.649 ms, L=8192 2.13 -> 1.95-2.03) but loses for
        # quantized KV (the [bk, 1] scale columns' lane padding forces a
        # narrower KV tile: int8 2.15 qw vs 2.24 wq) and is unmeasured
        # for fp32 — wq only for plain bf16.
        score_layout = ("wq" if ib == 2 and not quantized
                        and segment_ids is None else "qw")
    _wq_req = score_layout == "wq"
    _wq_cols = (1 if (_wq_req and segment_ids is not None) else 0)
    will_fuse, block_q, q_pack, bk_sel, pLq, dq_hbm = \
        select_bwd_fused_config(
            Lq, Lk, d, block_q=block_q, block_k=block_k, causal=causal,
            q_offset=q_offset, itemsize=ib, q_pack=q_pack, window=window,
            wq_cols=_wq_cols)
    if will_fuse:
        # the clamped tile only applies to the fused single-pass form; the
        # two-pass kernels have no full-sequence terms and keep the wide
        # tile (two-pass L=16k at bk=2048 measured 11.7 ms vs 13.7 at 512)
        block_k = bk_sel
        bk_dkv = bk_sel
    else:
        # Two-pass fallback: the dK/dV pass has no full-sequence VMEM
        # terms, so it packs Q groups exactly like the fused body (its own
        # (q_pack, bk) choice, step-minimizing); the dQ pass keeps
        # per-tile Q blocks and the wide KV tile.
        q_pack, bk_dkv, pLq = select_bwd_dkv_config(
            Lq, Lk, d, block_q=block_q, block_k=block_k, causal=causal,
            q_offset=q_offset, itemsize=ib, window=window)
    group_q = block_q * q_pack

    pLk = round_up(Lk, block_k)
    padded_kv = pLk != Lk

    # D_i = sum_d dO * O — plain XLA, fused into one pass over dO/O.
    # A cotangent on the logsumexp output folds in exactly here: the lse
    # contribution to dS is ``p * dlse_i`` and ``ds = p*(dp - (D - dlse))``,
    # so the kernels run unchanged with a shifted D.
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    if dlse is not None:
        delta = delta - dlse.astype(jnp.float32)

    if quantized and not scaled:
        # Channel granularity: delta above already consumed the RAW dO/O;
        # now fold K's [d] scale into Q (dequant-space scores) and V's
        # into dO (dequant-space dp) — XLA elementwise, fused into the
        # operand reshapes.  The kernels then run scale-free; the outputs
        # un-fold below (dq·ks, dk/ks, dv/vs).
        ksb = jnp.repeat(k_scale, g, axis=1) if g > 1 else k_scale
        vsb = jnp.repeat(v_scale, g, axis=1) if g > 1 else v_scale
        q = (q.astype(jnp.float32) * ksb[:, :, None, :]).astype(q.dtype)
        do = (do.astype(jnp.float32) * vsb[:, :, None, :]).astype(do.dtype)

        def _unfold_channel(dq, dk, dv):
            # dq came out in code space (dS · codes): times K's scale.
            # dk = dS^T · (q·ks) and dv = p^T · (do·vs): divide the folded
            # scale back out (scales are never 0 by construction).
            dq = (dq.astype(jnp.float32)
                  * ksb[:, :, None, :]).astype(dq.dtype)
            dk = (dk.astype(jnp.float32)
                  / k_scale[:, :, None, :]).astype(dk.dtype)
            dv = (dv.astype(jnp.float32)
                  / v_scale[:, :, None, :]).astype(dv.dtype)
            return dq, dk, dv
    else:
        _unfold_channel = None

    # Native GQA (see the forward): K/V reads fold onto the KV head; the
    # dK/dV OUTPUTS stay per-QUERY-head (each grid row accumulates its own
    # group member's contribution race-free) and are group-summed after.
    def kv_bh(bh):
        return (bh // H) * Hkv + (bh % H) // g

    # wq (transposed [w, bq] score space) applies to the fused form only
    score_wq = score_layout == "wq" and will_fuse

    qf = pad_to(q.reshape(B * H, Lq, d), 1, pLq)
    dof = pad_to(do.reshape(B * H, Lq, d), 1, pLq)
    if score_wq:
        # per-query vectors ride as [*, 1, pLq] rows (broadcast down the
        # key axis of the transposed score tiles)
        lsef = pad_to(lse.reshape(B * H, 1, Lq), 2, pLq)
        deltaf = pad_to(delta.reshape(B * H, 1, Lq), 2, pLq)
    else:
        lsef = pad_to(lse.reshape(B * H, Lq, 1), 1, pLq)
        deltaf = pad_to(delta.reshape(B * H, Lq, 1), 1, pLq)
    if quantized:
        # d-major codes + scale rows — see the forward entry comment.
        if transposed_in:
            kdl, vdl = k.reshape(B * Hkv, d, Lk), v.reshape(B * Hkv, d, Lk)
        else:
            kdl = k.transpose(0, 1, 3, 2).reshape(B * Hkv, d, Lk)
            vdl = v.transpose(0, 1, 3, 2).reshape(B * Hkv, d, Lk)
        kf, vf = pad_to(kdl, 2, pLk), pad_to(vdl, 2, pLk)
        kv_index = lambda b, t, im, jm, *r: (kv_bh(b), 0, jm[t])
        if scaled:
            # scales keep the [1, bk] ROW layout in both score layouts: a
            # [bk, 1] column block pads to 128 lanes in VMEM (~0.5M/buffer
            # at bk=1024 — what first OOM'd int8-wq); the wq kernel
            # transposes the 4KB row in-kernel instead.
            ksf = pad_to(k_scale.reshape(B * Hkv, 1, Lk), 2, pLk, fill=1.0)
            vsf = pad_to(v_scale.reshape(B * Hkv, 1, Lk), 2, pLk, fill=1.0)
            scale_index = lambda b, t, im, jm, *r: (kv_bh(b), 0, jm[t])
        else:
            ksf = vsf = None        # channel: scale-free kernels
            scale_index = None
    else:
        kf = pad_to(k.reshape(B * Hkv, Lk, d), 1, pLk)
        vf = pad_to(v.reshape(B * Hkv, Lk, d), 1, pLk)
        kv_index = lambda b, t, im, jm, *r: (kv_bh(b), jm[t], 0)
        ksf = vsf = None
        scale_index = None
    # gradients are w.r.t. the (dequantized) fp values
    grad_dtype = q.dtype
    seed_arr = jnp.atleast_1d(jnp.asarray(dropout_seed, jnp.int32))
    if seed_arr.shape[0] < 3:
        # [seed, batch_offset, head_offset] — offsets are nonzero only when
        # an outer shard_map packs them so the dropout hash sees GLOBAL
        # (batch, head) indices (layout-independent masks).
        seed_arr = jnp.pad(seed_arr, (0, 3 - seed_arr.shape[0]))
    segmented = segment_ids is not None
    if segmented:
        if Lq != Lk:
            raise ValueError("segment_ids requires Lq == Lk (packed training)")
        seg = segment_ids.astype(jnp.int32)
        if score_wq:
            qsegf = pad_to(seg[:, None, :], 2, pLq, fill=-1)
            ksegf = pad_to(seg[:, :, None], 1, pLk, fill=-1)
            qseg_index = lambda b, t, im, jm, *r: (b // H, 0, im[t])
            kseg_index = lambda b, t, im, jm, *r: (b // H, jm[t], 0)
        else:
            qsegf = pad_to(seg[:, :, None], 1, pLq, fill=-1)
            ksegf = pad_to(seg[:, None, :], 2, pLk, fill=-1)
            qseg_index = lambda b, t, im, jm, *r: (b // H, im[t], 0)
            kseg_index = lambda b, t, im, jm, *r: (b // H, 0, jm[t])
    else:
        qsegf = ksegf = qseg_index = kseg_index = None

    num_q, num_kv = pLq // block_q, pLk // block_k

    aug = _fold_l(d)
    dw = d + 1 if aug else d
    # Single-pass (5 dots/pair) whenever the modeled footprint fits; the
    # model replaced round 1's flat pLq budget.  At L>=16k bf16 no block_k
    # fits (the full-sequence dq terms dominate) and the two-pass form
    # engages with the wide tile.
    fused = will_fuse

    # Dummy scale/segment specs cost per-grid-step pipeline bookkeeping
    # (like the forward): only live operands ride the spec list; a shared
    # wrapper reinserts None refs for the kernel signatures.  Q-side blocks
    # are GROUP-sized (``im`` is in group units); the index maps are in
    # block units so the same maps serve any (qrows, bk) combination.
    def _in_specs(qrows, bk, wq=False):
        kv_blk = (1, d, bk) if quantized else (1, bk, d)
        row_blk = (1, 1, qrows) if wq else (1, qrows, 1)
        row_idx = (lambda b, t, im, jm, *r: (b, 0, im[t])) if wq else \
                  (lambda b, t, im, jm, *r: (b, im[t], 0))
        specs = [
            pl.BlockSpec((1, qrows, d),
                         lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec(kv_blk, kv_index),
            pl.BlockSpec(kv_blk, kv_index),
        ]
        if scaled:
            specs += [pl.BlockSpec((1, 1, bk), scale_index)] * 2
        if segmented:
            kseg_blk = (1, bk, 1) if wq else (1, 1, bk)
            qseg_blk = (1, 1, qrows) if wq else (1, qrows, 1)
            specs += [
                pl.BlockSpec(qseg_blk, qseg_index),
                pl.BlockSpec(kseg_blk, kseg_index),
            ]
        specs += [
            pl.BlockSpec((1, qrows, d),
                         lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec(row_blk, row_idx),
            pl.BlockSpec(row_blk, row_idx),
        ]
        return specs

    common_in_specs = _in_specs(group_q, block_k, wq=score_wq)
    common_operands = [qf, kf, vf]
    if scaled:
        common_operands += [ksf, vsf]
    if segmented:
        common_operands += [qsegf, ksegf]
    common_operands += [dof, lsef, deltaf]

    def _wrap_bwd(kernel_fn):
        def wrapper(im, jm, fl, wm, sd, *rest):
            rest = list(rest)
            q_r, k_r, v_r = rest[:3]
            i = 3
            ks_r = vs_r = qs_r = ks2_r = None
            if scaled:
                ks_r, vs_r = rest[i:i + 2]
                i += 2
            if segmented:
                qs_r, ks2_r = rest[i:i + 2]
                i += 2
            do_r, lse_r, dl_r = rest[i:i + 3]
            i += 3
            kernel_fn(im, jm, fl, wm, sd, q_r, k_r, v_r, ks_r, vs_r,
                      qs_r, ks2_r, do_r, lse_r, dl_r, *rest[i:])
        return wrapper
    kv_out_specs = [
        pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, *r: (b, jm[t], 0)),
        pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, *r: (b, jm[t], 0)),
    ]

    if fused:
        gmap, gjmap, gflags, gpat, gpatterns = _packed_kv_schedule(
            pLq // group_q, num_kv, block_q=block_q, block_k=block_k,
            causal=causal, q_offset=q_offset, kv_len=Lk, q_pack=q_pack,
            window=window)
        fused_kernel = functools.partial(
            _bwd_fused_kernel,
            scale=scale, causal=causal, block_q=block_q, block_k=block_k,
            kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset, d=d, aug=aug,
            n_steps=len(gmap), n_heads=H, quantized=quantized,
            scaled=scaled, dropout_rate=dropout_rate, window=window,
            segmented=segmented, fast_exp=fast_exp, q_pack=q_pack,
            patterns=gpatterns, score_wq=score_wq,
        )
        dpad = round_up(d, 128)     # DMA lane alignment (see epilogue)
        dq_out_spec = (
            pl.BlockSpec(memory_space=pl.ANY) if dq_hbm else
            pl.BlockSpec((1, pLq, d), lambda b, t, im, jm, *r: (b, 0, 0)))
        scratch = [
            pltpu.VMEM((block_k, dw), jnp.float32),
            pltpu.VMEM((block_k, dw), jnp.float32),
            pltpu.VMEM((pLq, dw), jnp.float32),
        ]
        if dq_hbm:
            scratch += [pltpu.VMEM((min(pLq, group_q), dpad), q.dtype),
                        pltpu.SemaphoreType.DMA]
        fused_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=(B * H, len(gmap)),
            in_specs=common_in_specs,
            out_specs=kv_out_specs + [dq_out_spec],
            scratch_shapes=scratch,
        )
        dk, dv, dq = pl.pallas_call(
            _wrap_bwd(fused_kernel),
            grid_spec=fused_spec,
            out_shape=[
                jax.ShapeDtypeStruct((B * H, pLk, d), grad_dtype),
                jax.ShapeDtypeStruct((B * H, pLk, d), grad_dtype),
                jax.ShapeDtypeStruct(
                    (B * H, pLq, dpad if dq_hbm else d), q.dtype),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(jnp.asarray(gmap), jnp.asarray(gjmap), jnp.asarray(gflags),
          jnp.asarray(gpat), seed_arr, *common_operands)
        dq = dq[:, :Lq, :d].reshape(B, H, Lq, d)
        dk, dv = (_group_sum(x[:, :Lk], B, Hkv, g, Lk, d) for x in (dk, dv))
        if _unfold_channel is not None:
            dq, dk, dv = _unfold_channel(dq, dk, dv)
        return dq, dk, dv

    # dK/dV pass: packed KV-outer groups (the fused body with dQ disabled)
    # at its own step-minimizing (q_pack, bk_dkv) — at L=16k bf16 this cuts
    # 272 grid steps/(b,h) (unpacked 512x1024) to 40 (8x512x1024).
    num_kv_dkv = round_up(Lk, bk_dkv) // bk_dkv
    padded_kv_dkv = round_up(Lk, bk_dkv) != Lk
    gmap, gjmap, gflags, gpat, gpatterns = _packed_kv_schedule(
        pLq // group_q, num_kv_dkv, block_q=block_q, block_k=bk_dkv,
        causal=causal, q_offset=q_offset, kv_len=Lk, q_pack=q_pack,
        window=window)
    dkv_kernel = functools.partial(
        _bwd_dkv_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=bk_dkv,
        kv_len=Lk, padded_kv=padded_kv_dkv, q_offset=q_offset, d=d, aug=aug,
        n_heads=H, quantized=quantized, scaled=scaled,
        dropout_rate=dropout_rate, window=window,
        segmented=segmented, fast_exp=fast_exp, q_pack=q_pack,
        patterns=gpatterns,
    )
    dkv_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B * H, len(gmap)),
        in_specs=_in_specs(group_q, bk_dkv),
        out_specs=[
            pl.BlockSpec((1, bk_dkv, d),
                         lambda b, t, im, jm, *r: (b, jm[t], 0)),
            pl.BlockSpec((1, bk_dkv, d),
                         lambda b, t, im, jm, *r: (b, jm[t], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((bk_dkv, dw), jnp.float32),
            pltpu.VMEM((bk_dkv, dw), jnp.float32),
        ],
    )
    dk, dv = pl.pallas_call(
        _wrap_bwd(dkv_kernel),
        grid_spec=dkv_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLk, d), grad_dtype),
            jax.ShapeDtypeStruct((B * H, pLk, d), grad_dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(gmap), jnp.asarray(gjmap), jnp.asarray(gflags),
      jnp.asarray(gpat), seed_arr, *common_operands)

    q_imap, q_jmap, q_flags, q_wmap, q_widths = _tile_schedule(
        num_q, num_kv, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, kv_len=Lk, kv_outer=False, window=window)
    dq_kernel = functools.partial(
        _bwd_dq_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset, d=d, aug=aug,
        n_heads=H, quantized=quantized, scaled=scaled,
        dropout_rate=dropout_rate, window=window,
        segmented=segmented, fast_exp=fast_exp, widths=q_widths,
    )
    dq_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(B * H, len(q_imap)),
        in_specs=_in_specs(block_q, block_k),
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, dw), jnp.float32),
        ],
    )
    (dq,) = pl.pallas_call(
        _wrap_bwd(dq_kernel),
        grid_spec=dq_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(jnp.asarray(q_imap), jnp.asarray(q_jmap), jnp.asarray(q_flags),
      jnp.asarray(q_wmap), seed_arr, *common_operands)

    dq = dq[:, :Lq].reshape(B, H, Lq, d)
    dk, dv = (_group_sum(x[:, :Lk], B, Hkv, g, Lk, d) for x in (dk, dv))
    if _unfold_channel is not None:
        dq, dk, dv = _unfold_channel(dq, dk, dv)
    return dq, dk, dv
