"""The user-facing grad_check (reference minitorch.grad_check parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_flash
from tpu_flash import grad_check


def test_simple_ops(rng):
    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    assert grad_check(lambda a, b: a * b + jnp.tanh(a), x, y)


def test_flash_attention(rng):
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 64, 64)) * 0.3,
                           jnp.float32) for _ in range(3))
    assert grad_check(
        lambda *a: tpu_flash.flash_attention(*a, causal=True), q, k, v,
        n_samples=3)


def test_layer_norm(rng):
    x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(64), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(64), jnp.float32)
    assert grad_check(tpu_flash.layer_norm, x, g, b)


def test_detects_wrong_vjp(rng):
    """A deliberately broken custom gradient must be caught."""

    @jax.custom_vjp
    def bad_square(x):
        return x * x

    bad_square.defvjp(lambda x: (x * x, x),
                      lambda x, g: (g * x,))  # should be 2*g*x

    x = jnp.asarray(1.0 + rng.random((3, 3)), jnp.float32)
    with pytest.raises(AssertionError, match="grad_check failed"):
        grad_check(bad_square, x)


def test_integer_args_skipped():
    ids = jnp.arange(6).reshape(2, 3)
    w = jnp.asarray(np.linspace(-1, 1, 30).reshape(10, 3), jnp.float32)
    assert grad_check(lambda table, i: jnp.sum(table[i] ** 2), w, ids)
