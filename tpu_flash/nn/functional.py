"""Functional NN ops — the analog of minitorch/nn.py:105-274.

All ops are plain jnp (XLA fuses them); semantics match the reference where
it is idiosyncratic:
  * GELU is the tanh approximation (nn.py:208-214);
  * softmax_loss is ``logsumexp(logits) - sum(one_hot * logits)``
    (nn.py:256-274);
  * dropout: the reference ships two variants — the functional one is a
    plain binomial mask with no rescale (nn.py:168-186) while the Dropout
    module does inverted dropout with the 1/(1-p) rescale
    (modules_basic.py:57-81).  ``rescale`` selects between them; the module
    default (rescale=True) is what the transformer uses.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np


def softmax(x: jax.Array, axis: int = -1) -> jax.Array:
    m = jnp.max(x, axis=axis, keepdims=True)
    e = jnp.exp(x - m)
    return e / jnp.sum(e, axis=axis, keepdims=True)


def logsumexp(x: jax.Array, axis: int = -1) -> jax.Array:
    """Numerically-stable logsumexp (nn.py:217-233)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    return jnp.squeeze(m, axis) + jnp.log(
        jnp.sum(jnp.exp(x - m), axis=axis))


def logsoftmax(x: jax.Array, axis: int = -1) -> jax.Array:
    return x - logsumexp(x, axis)[..., None] if axis == -1 else (
        x - jnp.expand_dims(logsumexp(x, axis), axis))


def gelu(x: jax.Array) -> jax.Array:
    """Tanh-approximate GELU, exactly the reference's formula (nn.py:208-214)."""
    c = math.sqrt(2.0 / math.pi)
    return 0.5 * x * (1.0 + jnp.tanh(c * (x + 0.044715 * x ** 3)))


def one_hot(ids: jax.Array, num_classes: int, dtype=jnp.float32) -> jax.Array:
    """One-hot encoding (nn.py:236-253 builds it in numpy on the host; here
    it is a device-side op so it can live under jit)."""
    return jax.nn.one_hot(ids, num_classes, dtype=dtype)


def dropout(
    x: jax.Array,
    p: float,
    *,
    key: jax.Array | None = None,
    training: bool = True,
    rescale: bool = True,
) -> jax.Array:
    """Dropout. Identity when not training, p == 0, or no key is given."""
    if not training or p <= 0.0 or key is None:
        return x
    keep = jax.random.bernoulli(key, 1.0 - p, x.shape)
    y = jnp.where(keep, x, jnp.zeros_like(x))
    if rescale:
        y = y / (1.0 - p)
    return y


def softmax_loss(logits: jax.Array, target_ids: jax.Array) -> jax.Array:
    """Per-example cross-entropy: logsumexp(logits) - logits[target]
    (nn.py:256-274, which materializes the one-hot; here a gather)."""
    lse = logsumexp(logits, axis=-1)
    picked = jnp.take_along_axis(
        logits, target_ids[..., None].astype(jnp.int32), axis=-1)[..., 0]
    return lse - picked


def chunked_softmax_loss(hidden: jax.Array, weight: jax.Array,
                         bias: jax.Array | None, labels: jax.Array,
                         *, n_chunks: int = 8,
                         axis_name: str | None = None,
                         batch_axis: str | None = None) -> jax.Array:
    """Fused lm_head + cross-entropy without materializing [B, L, V] logits.

    Numerically equal (fp32) to ``softmax_loss(hidden @ weight + bias,
    labels)`` — the reference's loss (minitorch/nn.py:256-274) applied to
    the lm_head output — but the [N, V] logits tensor never exists: the
    vocab axis is processed in ``n_chunks`` slices with an online
    logsumexp (the flash-attention trick applied to the loss), and the
    backward recomputes each chunk's logits from the same slices.  Peak
    memory drops from O(N·V) to O(N·V/n_chunks) — at production vocab
    sizes (100k+) the logits tensor dwarfs every activation, and XLA
    cannot fuse away a tensor that custom_vjp residuals or the loss's
    consumer keep alive.

    ``hidden`` [B, L, E] (or [N, E]), ``weight`` [E, V] (Linear's layout),
    ``bias`` [V] or None, ``labels`` int [B, L] (or [N]).  Returns
    per-token losses shaped like ``labels``.

    ``axis_name`` (inside a ``shard_map`` region) enables the Megatron-style
    vocab-parallel form: ``weight``/``bias`` are this shard's vocab slice
    (global columns ``[axis_index * V_local, ...)``, V_local divisible by
    ``n_chunks`` — callers pre-pad, see parallel/vocab_loss.py), ``labels``
    are global ids, and the per-shard online (max, sumexp, picked) triple is
    merged across the axis with one pmax + two psums — the full-vocab logits
    row never exists on ANY shard.

    ``batch_axis`` names the mesh axis the TOKENS are sharded over (data
    parallelism inside the same shard_map): the weight/bias are replicated
    over it, so their gradients must be psummed across it in the backward.

    The ``axis_name``/``batch_axis`` form is only correct when the whole
    ``jax.grad`` runs INSIDE the shard_map body (manual-SPMD training
    loops).  Differentiating THROUGH a ``check_vma=False`` shard_map whose
    body calls this would compose these manual psums with shard_map's
    transpose machinery (cotangent division by unmentioned out-spec axes +
    defensive psum over unmentioned in-spec axes — shard_map.py
    ``_shard_map_transpose``), double-counting in mesh-dependent ways.  For
    that pattern use ``parallel.vocab_parallel_softmax_loss``, whose
    custom_vjp sits OUTSIDE the shard_map.
    """
    V = weight.shape[1]
    lead = labels.shape
    x = hidden.reshape(-1, hidden.shape[-1])
    y = labels.reshape(-1).astype(jnp.int32)
    n_chunks = max(int(n_chunks), 1)
    if axis_name is None:
        C = -(-V // n_chunks)                 # ceil; pad the last chunk
        pad = n_chunks * C - V
        w = jnp.pad(weight, ((0, 0), (0, pad))) if pad else weight
        b = jnp.zeros((V,), jnp.float32) if bias is None else (
            bias.astype(jnp.float32))
        if pad:
            # padded columns get -inf bias -> exp() exactly 0 under the
            # online lse
            b = jnp.pad(b, (0, pad), constant_values=-jnp.inf)
        base = jnp.int32(0)
    else:
        if V % n_chunks:
            raise ValueError(
                f"n_chunks={n_chunks} must divide this shard's local vocab "
                f"{V}; pad the global vocab before shard_map "
                f"(parallel/vocab_loss.py does)")
        w = weight
        b = (jnp.zeros((V,), jnp.float32) if bias is None
             else bias.astype(jnp.float32))
        base = (jax.lax.axis_index(axis_name) * V).astype(jnp.int32)
    out = _chunked_softmax_loss(axis_name, batch_axis, n_chunks, x, w, b, y,
                                base)
    return out.reshape(lead)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2))
def _chunked_softmax_loss(axis_name, batch_axis, n_chunks, x, w, b, y, base):
    loss, _ = _chunked_fwd(axis_name, n_chunks, x, w, b, y, base)
    return loss


def _chunk_slice(w, b, i, C):
    """Vocab slice i of the weight/bias IN PLACE — dynamic_slice keeps the
    original [E, V] layout (no [n_chunks, E, C] relayout copy of a tensor
    that is the model's single largest parameter)."""
    return (jax.lax.dynamic_slice_in_dim(w, i * C, C, axis=1),
            jax.lax.dynamic_slice_in_dim(b, i * C, C, axis=0))


def _chunk_logits(x, wc, bc):
    """One vocab slice's logits in fp32 (MXU dot with fp32 accumulation)."""
    return jnp.dot(x, wc, preferred_element_type=jnp.float32) + bc


def _chunked_fwd(axis_name, n_chunks, x, w, b, y, base):
    C = w.shape[1] // n_chunks
    N = x.shape[0]

    def body(carry, i):
        m, s, picked = carry
        wc, bc = _chunk_slice(w, b, i, C)
        c0 = base + i * C
        logits = _chunk_logits(x, wc, bc)                       # [N, C]
        new_m = jnp.maximum(m, jnp.max(logits, axis=-1))
        # A shard whose columns are ALL padding (vocab-parallel, global pad
        # shorter than one shard) keeps new_m = -inf; exp(m - new_m) would
        # be exp(-inf - -inf) = nan.  Shift by a finite 0 instead — the
        # all-(-inf) logits still contribute exactly 0 to s.
        shift = jnp.where(jnp.isneginf(new_m), 0.0, new_m)
        s = s * jnp.exp(m - shift) + jnp.sum(
            jnp.exp(logits - shift[:, None]), axis=-1)
        rel = y - c0
        inside = (rel >= 0) & (rel < C)
        pc = jnp.take_along_axis(
            logits, jnp.clip(rel, 0, C - 1)[:, None], axis=-1)[:, 0]
        picked = jnp.where(inside, pc, picked)
        return (new_m, s, picked), None

    init = (jnp.full((N,), -jnp.inf, jnp.float32),
            jnp.zeros((N,), jnp.float32),
            jnp.zeros((N,), jnp.float32))
    (m, s, picked), _ = jax.lax.scan(
        body, init, jnp.arange(n_chunks, dtype=jnp.int32))
    if axis_name is not None:
        # Merge the per-shard online triples: global max, rescaled sumexp,
        # and the picked logit (exactly one shard saw the label -> sum).
        m_all = jax.lax.pmax(m, axis_name)
        shift = jnp.where(jnp.isneginf(m), 0.0, m_all)
        s = jax.lax.psum(s * jnp.exp(m - shift), axis_name)
        picked = jax.lax.psum(picked, axis_name)
        m = m_all
    lse = m + jnp.log(s)
    return lse - picked, lse


def _chunked_vjp_fwd(axis_name, batch_axis, n_chunks, x, w, b, y, base):
    loss, lse = _chunked_fwd(axis_name, n_chunks, x, w, b, y, base)
    return loss, (x, w, b, y, base, lse)


def _chunked_bwd_scan(n_chunks, x, w, b, y, base, lse, gf):
    """Shard-local backward of the chunked loss: recompute each vocab
    slice's logits from the residual-free inputs and accumulate (dx, dw,
    db) with NO collectives — callers add the psums their sharding needs
    (parallel/vocab_loss.py sums dx over the model axis and dw/db over the
    data axis inside its own backward shard_map).  Each chunk writes a
    DISJOINT column slice of dw/db (dynamic_update_slice, no accumulation),
    so the dw carry can live in the weight's own dtype with no precision
    loss — each slice is computed once in fp32 and cast once."""
    C = w.shape[1] // n_chunks

    def body(carry, i):
        dx, dw, db = carry
        wc, bc = _chunk_slice(w, b, i, C)
        c0 = base + i * C
        logits = _chunk_logits(x, wc, bc)
        p = jnp.exp(logits - lse[:, None])                      # softmax
        rel = y - c0
        inside = (rel >= 0) & (rel < C)
        onehot = (jnp.arange(C, dtype=jnp.int32)[None, :]
                  == jnp.clip(rel, 0, C - 1)[:, None]) & inside[:, None]
        dlogits = (p - onehot.astype(p.dtype)) * gf[:, None]
        dx = dx + jnp.dot(dlogits, wc.T,
                          preferred_element_type=jnp.float32)
        dwc = jnp.dot(x.T, dlogits.astype(x.dtype),
                      preferred_element_type=jnp.float32)
        dw = jax.lax.dynamic_update_slice_in_dim(
            dw, dwc.astype(dw.dtype), i * C, axis=1)
        db = jax.lax.dynamic_update_slice_in_dim(
            db, jnp.sum(dlogits, axis=0), i * C, axis=0)
        return (dx, dw, db), None

    init = (jnp.zeros(x.shape, jnp.float32),
            jnp.zeros(w.shape, w.dtype),
            jnp.zeros((w.shape[1],), jnp.float32))
    (dx, dw, db), _ = jax.lax.scan(body, init,
                                   jnp.arange(n_chunks, dtype=jnp.int32))
    return dx, dw, db


def _chunked_vjp_bwd(axis_name, batch_axis, n_chunks, res, g):
    x, w, b, y, base, lse = res
    dx, dw, db = _chunked_bwd_scan(n_chunks, x, w, b, y, base, lse,
                                   g.astype(jnp.float32))
    if axis_name is not None:
        # dx sums each shard's dlogits @ w_local.T partial (dw/db stay
        # shard-local, matching the vocab-sharded weight layout).
        dx = jax.lax.psum(dx, axis_name)
    if batch_axis is not None:
        # weight/bias are replicated over the token (data) axis; their
        # cotangents sum each data-shard's contribution.
        dw = jax.lax.psum(dw, batch_axis)
        db = jax.lax.psum(db, batch_axis)
    return (dx.astype(x.dtype), dw, db,
            np.zeros(y.shape, jax.dtypes.float0),
            np.zeros((), jax.dtypes.float0))


_chunked_softmax_loss.defvjp(_chunked_vjp_fwd, _chunked_vjp_bwd)


# ---------------------------------------------------------------------------
# Pooling and convolution (parity with the reference's course tracks:
# minitorch/nn.py:13-165 tile/avgpool2d/maxpool2d and minitorch/fast_conv.py
# conv1d/conv2d). On TPU these are thin wrappers over XLA's native
# reduce_window / conv_general_dilated, which map directly onto the MXU.
# ---------------------------------------------------------------------------

def tile(x: jax.Array, kernel: tuple[int, int]):
    """Reshape [B, C, H, W] into [B, C, H/kh, W/kw, kh*kw] tiles
    (minitorch/nn.py:13-49's layout)."""
    B, C, H, W = x.shape
    kh, kw = kernel
    assert H % kh == 0 and W % kw == 0
    x = x.reshape(B, C, H // kh, kh, W // kw, kw)
    x = x.transpose(0, 1, 2, 4, 3, 5).reshape(
        B, C, H // kh, W // kw, kh * kw)
    return x, H // kh, W // kw


def avgpool2d(x: jax.Array, kernel: tuple[int, int]) -> jax.Array:
    """[B, C, H, W] average pooling (minitorch/nn.py:52-78)."""
    t, nh, nw = tile(x, kernel)
    return jnp.mean(t, axis=-1)


def maxpool2d(x: jax.Array, kernel: tuple[int, int]) -> jax.Array:
    """[B, C, H, W] max pooling (minitorch/nn.py:133-165)."""
    t, nh, nw = tile(x, kernel)
    return jnp.max(t, axis=-1)


def argmax(x: jax.Array, axis: int = -1) -> jax.Array:
    """One-hot argmax (minitorch/nn.py:65-80 returns a one-hot tensor)."""
    return one_hot(jnp.argmax(x, axis=axis),
                   x.shape[axis]).swapaxes(-1, axis) if axis != -1 else \
        one_hot(jnp.argmax(x, axis=-1), x.shape[-1])


def conv1d(x: jax.Array, weight: jax.Array) -> jax.Array:
    """'Same-start' 1-D convolution matching minitorch's semantics
    (fast_conv.py:27-150): input [B, Cin, T], weight [Cout, Cin, K],
    output [B, Cout, T] where out[..., t] sums over taps t..t+K-1 with
    zero padding past the end (i.e. cross-correlation, right-padded)."""
    K = weight.shape[-1]
    return jax.lax.conv_general_dilated(
        x, weight, window_strides=(1,), padding=[(0, K - 1)],
        dimension_numbers=("NCH", "OIH", "NCH"))


def conv2d(x: jax.Array, weight: jax.Array) -> jax.Array:
    """2-D analog of conv1d (fast_conv.py:153-308): input [B, Cin, H, W],
    weight [Cout, Cin, KH, KW], output [B, Cout, H, W], kernel anchored
    top-left with zero padding beyond the bottom/right edges."""
    KH, KW = weight.shape[-2:]
    return jax.lax.conv_general_dilated(
        x, weight, window_strides=(1, 1),
        padding=[(0, KH - 1), (0, KW - 1)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"))


def apply_rope(x: jax.Array, positions: jax.Array,
               base: float = 10_000.0) -> jax.Array:
    """Rotary position embedding over [B, H, L, d] (new capability — the
    reference uses learned absolute embeddings only).

    Rotates interleaved-half pairs (x[..., :d/2], x[..., d/2:]) by
    position-dependent angles; ``positions`` is [B, L] (absolute token
    positions, so incremental decode passes the cache offset).
    """
    B, H, L, d = x.shape
    half = d // 2
    freqs = base ** (-jnp.arange(0, half, dtype=jnp.float32) / half)
    angles = positions[:, None, :, None].astype(jnp.float32) * freqs  # B1Lh
    cos, sin = jnp.cos(angles), jnp.sin(angles)
    x1, x2 = x[..., :half].astype(jnp.float32), x[..., half:].astype(
        jnp.float32)
    out = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos],
                          axis=-1)
    return out.astype(x.dtype)
