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

import math

import jax
import jax.numpy as jnp


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
