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
