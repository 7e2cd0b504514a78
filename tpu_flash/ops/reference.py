"""Pure-jnp reference oracles for every fused op in the framework.

These are the executable specs the Pallas kernels are tested against — the
same role ``kernel_tests/flash_attn_python.py`` (reference repo) plays for the
CUDA kernels.  The tiled flash-attention math follows the FlashAttention-1 /
FlashAttention-2 algorithms exactly as the reference implements them:

  * FA1 fw:  running row-max ``m`` and row-sum ``l`` with rescale-and-
    accumulate of the *normalized* output per K/V tile
    (reference: src/flash_attn_fw.cpp:225-276).
  * FA2 fw:  unnormalized output accumulator rescaled by ``exp(m_prev-m_new)``
    per tile, one final division by ``l``; saves logsumexp ``L = m + log l``
    (reference: src/flash_attn2_fw.cpp:255-294).
  * FA1 bw:  recompute ``P = (1/l) * exp(S - m)`` from saved ``l, m``
    (reference: src/flash_attn_bw.cpp:161-169).
  * FA2 bw:  recompute ``P = exp(S - L)`` from saved logsumexp
    (reference: src/flash_attn2_bw.cpp:163-171).

Numerics intentionally match the reference's idiosyncrasies (SURVEY.md §7
"hard parts" #2): causal masking adds ``-1e7`` (not -inf), the fused softmax
adds ``1e-8`` to the denominator, and LayerNorm uses ``eps = 1e-8`` and
returns ``(y, mean, var)``.

Everything here is plain functional jnp: small, obviously-correct, and
differentiable with stock ``jax.grad`` — which is what the property tests use
to cross-check the hand-derived backward passes.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Reference in-tile causal mask value (src/flash_attn_fw.cpp:152-159 uses -1e7;
# the model-level mask uses -FLT_MAX — both vanish under exp after the row-max
# subtraction, we standardize on -1e7).
MASK_VALUE = -1e7
SOFTMAX_EPS = 1e-8  # src/softmax_kernel.cu:12 EPSILON added to the denominator
LN_EPS = 1e-8       # src/layernorm_kernel.cu:13 LN_EPSILON


def default_scale(head_dim: int) -> float:
    """tau = sqrt(1/d), as the reference computes it (src/flash_attn_fw.cpp:37).

    Computed in plain Python so it stays a static constant under jit.
    """
    import math

    return 1.0 / math.sqrt(head_dim)


# ---------------------------------------------------------------------------
# Naive attention (the baseline path of MultiHeadAttention.self_attention)
# ---------------------------------------------------------------------------

def causal_mask(seq_q: int, seq_k: int, dtype=jnp.float32) -> jax.Array:
    """Additive causal mask: 0 on/below the diagonal, MASK_VALUE above.

    Mirrors MultiHeadAttention.create_causal_mask
    (reference: minitorch/modules_transfomer.py:59-65) with -1e7 instead of
    -FLT_MAX so fp32 arithmetic never overflows.
    """
    q_ids = jnp.arange(seq_q)[:, None] + (seq_k - seq_q)
    k_ids = jnp.arange(seq_k)[None, :]
    return jnp.where(k_ids <= q_ids, 0.0, MASK_VALUE).astype(dtype)


def naive_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    *,
    causal: bool = False,
    mask: jax.Array | None = None,
    scale: float | None = None,
) -> jax.Array:
    """Materialized softmax(q k^T * tau + mask) v over [..., L, d] inputs.

    The reference's "baseline" attention path
    (minitorch/modules_transfomer.py:121-128).  ``mask`` is additive and
    broadcastable against the [..., Lq, Lk] score matrix.
    """
    if scale is None:
        scale = default_scale(q.shape[-1])
    s = jnp.einsum("...qd,...kd->...qk", q, k) * scale
    if causal:
        s = s + causal_mask(q.shape[-2], k.shape[-2], s.dtype)
    if mask is not None:
        s = s + mask
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("...qk,...kd->...qd", p, v)


# ---------------------------------------------------------------------------
# Tiled FlashAttention-1  (forward + backward)
# ---------------------------------------------------------------------------

class FA1Residuals(NamedTuple):
    out: jax.Array  # [B, H, L, d]
    l: jax.Array    # [B, H, L] running row-sum of exp
    m: jax.Array    # [B, H, L] running row-max


def _tile_causal_mask(i0: int, j0: int, br: int, bc: int) -> jax.Array:
    """In-tile additive causal mask for a (br x bc) score tile whose global
    row/col offsets are i0/j0 (reference: src/flash_attn_fw.cpp:152-159)."""
    rows = i0 + jnp.arange(br)[:, None]
    cols = j0 + jnp.arange(bc)[None, :]
    return jnp.where(cols <= rows, 0.0, MASK_VALUE).astype(jnp.float32)


def flash_attention1_fw_reference(
    q: jax.Array, k: jax.Array, v: jax.Array,
    *, causal: bool = False, block_q: int = 16, block_k: int = 16,
) -> FA1Residuals:
    """FA1 forward: outer loop over K/V tiles, inner over Q tiles, with the
    rescale-and-accumulate update of the already-normalized output.

    Direct jnp transcription of the FA1 algorithm the reference implements
    (src/flash_attn_fw.cpp:67-276). Shapes: q,k,v [B,H,L,d]; static Python
    tile loops — this is a test oracle, not a production path.
    """
    B, H, L, d = q.shape
    scale = default_scale(d)
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))

    o = jnp.zeros_like(q)
    l = jnp.zeros((B, H, L), jnp.float32)
    m = jnp.full((B, H, L), -jnp.inf, jnp.float32)

    for j0 in range(0, L, block_k):
        kj = k[..., j0:j0 + block_k, :]
        vj = v[..., j0:j0 + block_k, :]
        for i0 in range(0, L, block_q):
            if causal and j0 > i0 + block_q - 1:
                # whole tile above the diagonal — block-sparse skip
                # (src/flash_attn_fw.cpp:88-92, -DCAUSAL_BLOCKSPARSE build)
                continue
            qi = q[..., i0:i0 + block_q, :]
            s = jnp.einsum("bhqd,bhkd->bhqk", qi, kj) * scale
            if causal:
                s = s + _tile_causal_mask(i0, j0, s.shape[-2], s.shape[-1])
            mij = jnp.max(s, axis=-1)                      # [B,H,br]
            pij = jnp.exp(s - mij[..., None])
            lij = jnp.sum(pij, axis=-1)

            mi = m[..., i0:i0 + block_q]
            li = l[..., i0:i0 + block_q]
            mi_new = jnp.maximum(mi, mij)
            alpha = jnp.exp(mi - mi_new)      # rescale of old accumulator
            beta = jnp.exp(mij - mi_new)      # rescale of this tile
            li_new = alpha * li + beta * lij

            oi = o[..., i0:i0 + block_q, :]
            pv = jnp.einsum("bhqk,bhkd->bhqd", pij, vj)
            oi_new = (li * alpha)[..., None] * oi + beta[..., None] * pv
            oi_new = oi_new / li_new[..., None]

            o = o.at[..., i0:i0 + block_q, :].set(oi_new)
            l = l.at[..., i0:i0 + block_q].set(li_new)
            m = m.at[..., i0:i0 + block_q].set(mi_new)
    return FA1Residuals(o, l, m)


def flash_attention1_bw_reference(
    q: jax.Array, k: jax.Array, v: jax.Array,
    o: jax.Array, l: jax.Array, m: jax.Array, do: jax.Array,
    *, causal: bool = False, block_q: int = 16, block_k: int = 16,
):
    """FA1 backward: recompute S and P=(1/l)exp(S-m) per tile from saved l,m
    (src/flash_attn_bw.cpp:141-257). Returns (dq, dk, dv)."""
    B, H, L, d = q.shape
    scale = default_scale(d)
    q, k, v, o, do = (x.astype(jnp.float32) for x in (q, k, v, o, do))

    dq = jnp.zeros_like(q)
    dk = jnp.zeros_like(k)
    dv = jnp.zeros_like(v)
    D = jnp.sum(do * o, axis=-1)  # [B,H,L]  (src/flash_attn_bw.cpp:187-202)

    for j0 in range(0, L, block_k):
        kj = k[..., j0:j0 + block_k, :]
        vj = v[..., j0:j0 + block_k, :]
        for i0 in range(0, L, block_q):
            if causal and j0 > i0 + block_q - 1:
                continue
            qi = q[..., i0:i0 + block_q, :]
            s = jnp.einsum("bhqd,bhkd->bhqk", qi, kj) * scale
            if causal:
                s = s + _tile_causal_mask(i0, j0, s.shape[-2], s.shape[-1])
            mi = m[..., i0:i0 + block_q]
            li = l[..., i0:i0 + block_q]
            p = jnp.exp(s - mi[..., None]) / li[..., None]

            doi = do[..., i0:i0 + block_q, :]
            dv = dv.at[..., j0:j0 + block_k, :].add(
                jnp.einsum("bhqk,bhqd->bhkd", p, doi))
            dp = jnp.einsum("bhqd,bhkd->bhqk", doi, vj)
            ds = p * (dp - D[..., i0:i0 + block_q, None])
            dq = dq.at[..., i0:i0 + block_q, :].add(
                scale * jnp.einsum("bhqk,bhkd->bhqd", ds, kj))
            dk = dk.at[..., j0:j0 + block_k, :].add(
                scale * jnp.einsum("bhqk,bhqd->bhkd", ds, qi))
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Tiled FlashAttention-2  (forward + backward)
# ---------------------------------------------------------------------------

class FA2Residuals(NamedTuple):
    out: jax.Array  # [B, H, L, d]
    lse: jax.Array  # [B, H, L] logsumexp L = m + log(l)


def flash_attention2_fw_reference(
    q: jax.Array, k: jax.Array, v: jax.Array,
    *, causal: bool = False, block_q: int = 16, block_k: int = 16,
) -> FA2Residuals:
    """FA2 forward: per Q tile, stream K/V tiles with an unnormalized output
    accumulator; epilogue divides by l and stores logsumexp
    (src/flash_attn2_fw.cpp:93-294)."""
    B, H, L, d = q.shape
    scale = default_scale(d)
    q, k, v = (x.astype(jnp.float32) for x in (q, k, v))

    out = jnp.zeros_like(q)
    lse = jnp.zeros((B, H, L), jnp.float32)

    for i0 in range(0, L, block_q):
        qi = q[..., i0:i0 + block_q, :]
        br = qi.shape[-2]
        oi = jnp.zeros((B, H, br, d), jnp.float32)
        li = jnp.zeros((B, H, br), jnp.float32)
        mi = jnp.full((B, H, br), -jnp.inf, jnp.float32)
        for j0 in range(0, L, block_k):
            if causal and j0 > i0 + block_q - 1:
                continue  # causal block skip (src/flash_attn2_fw.cpp:95-99)
            kj = k[..., j0:j0 + block_k, :]
            vj = v[..., j0:j0 + block_k, :]
            s = jnp.einsum("bhqd,bhkd->bhqk", qi, kj) * scale
            if causal:
                s = s + _tile_causal_mask(i0, j0, s.shape[-2], s.shape[-1])
            mi_new = jnp.maximum(mi, jnp.max(s, axis=-1))
            p = jnp.exp(s - mi_new[..., None])
            alpha = jnp.exp(mi - mi_new)
            li = alpha * li + jnp.sum(p, axis=-1)
            oi = alpha[..., None] * oi + jnp.einsum("bhqk,bhkd->bhqd", p, vj)
            mi = mi_new
        out = out.at[..., i0:i0 + block_q, :].set(oi / li[..., None])
        lse = lse.at[..., i0:i0 + block_q].set(mi + jnp.log(li))
    return FA2Residuals(out, lse)


def flash_attention2_bw_reference(
    q: jax.Array, k: jax.Array, v: jax.Array,
    o: jax.Array, lse: jax.Array, do: jax.Array,
    *, causal: bool = False, block_q: int = 16, block_k: int = 16,
):
    """FA2 backward: P = exp(S - LSE); loops organized per K tile (the
    reference parallelizes the grid over K tiles and atomically accumulates
    dQ, src/flash_attn2_bw.cpp:70-259 — here plain functional adds)."""
    B, H, L, d = q.shape
    scale = default_scale(d)
    q, k, v, o, do = (x.astype(jnp.float32) for x in (q, k, v, o, do))

    dq = jnp.zeros_like(q)
    dk = jnp.zeros_like(k)
    dv = jnp.zeros_like(v)
    D = jnp.sum(do * o, axis=-1)

    for j0 in range(0, L, block_k):
        kj = k[..., j0:j0 + block_k, :]
        vj = v[..., j0:j0 + block_k, :]
        for i0 in range(0, L, block_q):
            if causal and j0 > i0 + block_q - 1:
                continue
            qi = q[..., i0:i0 + block_q, :]
            s = jnp.einsum("bhqd,bhkd->bhqk", qi, kj) * scale
            if causal:
                s = s + _tile_causal_mask(i0, j0, s.shape[-2], s.shape[-1])
            p = jnp.exp(s - lse[..., i0:i0 + block_q, None])
            doi = do[..., i0:i0 + block_q, :]
            dv = dv.at[..., j0:j0 + block_k, :].add(
                jnp.einsum("bhqk,bhqd->bhkd", p, doi))
            dp = jnp.einsum("bhqd,bhkd->bhqk", doi, vj)
            ds = p * (dp - D[..., i0:i0 + block_q, None])
            dq = dq.at[..., i0:i0 + block_q, :].add(
                scale * jnp.einsum("bhqk,bhkd->bhqd", ds, kj))
            dk = dk.at[..., j0:j0 + block_k, :].add(
                scale * jnp.einsum("bhqk,bhqd->bhkd", ds, qi))
    return dq, dk, dv


# ---------------------------------------------------------------------------
# Fused masked attention-softmax  (LightSeq-style, src/softmax_kernel.cu)
# ---------------------------------------------------------------------------

def attn_softmax_reference(
    x: jax.Array,
    pad_mask: jax.Array | None = None,
    *,
    mask_future: bool = False,
) -> jax.Array:
    """Masked softmax over the last axis of [B, H, Lq, Lk] scores.

    ``pad_mask`` is the additive [B, Lk] padding mask broadcast over heads and
    query positions; ``mask_future`` adds the causal mask — exactly the
    semantics of launch_attn_softmax (src/softmax_kernel.cu:52-88).  A 1e-8
    epsilon is added to the denominator as the CUDA kernel does
    (src/softmax_kernel.cu:114,211).
    """
    x = x.astype(jnp.float32)
    if pad_mask is not None:
        x = x + pad_mask[:, None, None, :].astype(jnp.float32)
    if mask_future:
        x = x + causal_mask(x.shape[-2], x.shape[-1])
    m = jnp.max(x, axis=-1, keepdims=True)
    e = jnp.exp(x - m)
    return e / (jnp.sum(e, axis=-1, keepdims=True) + SOFTMAX_EPS)


def attn_softmax_bw_reference(prob: jax.Array, dprob: jax.Array) -> jax.Array:
    """dx = P * (dP - sum(dP * P)) per row (src/softmax_kernel.cu:321-346)."""
    row = jnp.sum(dprob * prob, axis=-1, keepdims=True)
    return prob * (dprob - row)


# ---------------------------------------------------------------------------
# Fused LayerNorm  (src/layernorm_kernel.cu)
# ---------------------------------------------------------------------------

class LNResiduals(NamedTuple):
    out: jax.Array
    mean: jax.Array
    var: jax.Array


def layernorm_fw_reference(x: jax.Array, gamma: jax.Array, beta: jax.Array) -> LNResiduals:
    """Row LayerNorm over the last axis returning (y, mean, var) — the same
    triple launch_layernorm emits (src/layernorm_kernel.cu:117-177)."""
    x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=-1)
    var = jnp.mean(jnp.square(x), axis=-1) - jnp.square(mean)
    xhat = (x - mean[..., None]) * jax.lax.rsqrt(var[..., None] + LN_EPS)
    return LNResiduals(xhat * gamma + beta, mean, var)


def layernorm_bw_reference(
    dy: jax.Array, x: jax.Array, gamma: jax.Array,
    mean: jax.Array, var: jax.Array,
):
    """Backward of row LayerNorm from saved (mean, var):
    dx = (dxhat - (sum(dxhat) + xhat * sum(dxhat*xhat)) / H) * rsqrt(var+eps)
    (src/layernorm_kernel.cu:317-377); dgamma/dbeta are column reductions
    over all rows (src/layernorm_kernel.cu:223-271). Returns (dx, dgamma, dbeta)."""
    x = x.astype(jnp.float32)
    dy = dy.astype(jnp.float32)
    H = x.shape[-1]
    rstd = jax.lax.rsqrt(var[..., None] + LN_EPS)
    xhat = (x - mean[..., None]) * rstd
    dxhat = dy * gamma
    dx = (dxhat - (jnp.sum(dxhat, axis=-1, keepdims=True)
                   + xhat * jnp.sum(dxhat * xhat, axis=-1, keepdims=True)) / H) * rstd
    reduce_axes = tuple(range(x.ndim - 1))
    dgamma = jnp.sum(dy * xhat, axis=reduce_axes)
    dbeta = jnp.sum(dy, axis=reduce_axes)
    return dx, dgamma, dbeta


def dropout_keep_oracle(B, H, Lq, Lk, seed, rate):
    """The attention-dropout keep/(1-rate) multiplier for the FULL
    [B, H, Lq, Lk] probability tensor — the dense-oracle twin of the
    in-kernel tile mask (kernels/flash_attention.dropout_keep_mask with
    global row/col/batch/head indices), used by the "xla" impl and by the
    parity tests to reproduce the kernel's masks bit-exactly.  ``seed`` may
    be the packed [seed, batch_offset, head_offset] vector the shard_map
    wrapper builds (ops/attention.py) — the offsets shift the global
    (batch, head) grid the same way the kernel does."""
    from tpu_flash.kernels.flash_attention import dropout_keep_mask

    seed = jnp.atleast_1d(jnp.asarray(seed, jnp.int32))
    if seed.shape[0] < 3:
        seed = jnp.pad(seed, (0, 3 - seed.shape[0]))
    rows = jnp.arange(Lq, dtype=jnp.int32)[:, None]
    cols = jnp.arange(Lk, dtype=jnp.int32)[None, :]
    bs = jnp.arange(B, dtype=jnp.int32) + seed[1]
    hs = jnp.arange(H, dtype=jnp.int32) + seed[2]
    keep = jax.vmap(lambda b: jax.vmap(
        lambda h: dropout_keep_mask(rows, cols, b, h, seed[0], rate))(hs))(bs)
    return jnp.where(keep, jnp.float32(1.0 / (1.0 - rate)),
                     jnp.float32(0.0))


def apply_segment_mask(s, seg):
    """Set cross-segment scores of ``s`` [B, H, Lq, Lk] to MASK_VALUE given
    segment ids ``seg`` [B, L] (packed-sequence attention; SET rather than
    add, matching the kernel's in-tile masking)."""
    same = seg[:, None, :, None] == seg[:, None, None, :]
    return jnp.where(same, s, jnp.asarray(MASK_VALUE, s.dtype))


def window_mask(seq_q, seq_k, window, dtype=jnp.float32):
    """Additive sliding-window lower-bound mask (combine with causal_mask):
    bottom-right-aligned row r attends keys in (r + offset - window,
    r + offset]."""
    offset = seq_k - seq_q
    rows = jnp.arange(seq_q)[:, None] + offset
    cols = jnp.arange(seq_k)[None, :]
    return jnp.where(cols > rows - window, 0.0, -1e9).astype(dtype)
