"""Central-difference gradient checks — the reference's grad_check oracle
(minitorch/tensor_functions.py:670-709 uses float64 torch central
differences); here the same protocol validates the custom VJPs directly,
independently of jax.grad-vs-jax.grad cross-checks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def central_difference_grad(f, args, index, eps=1e-3):
    """d f / d args[index] by elementwise central differences (fp32 inputs;
    the reference uses eps=1e-6 in float64 — fp32 needs a coarser step)."""
    x = np.asarray(args[index], np.float64)
    grad = np.zeros_like(x)
    it = np.nditer(x, flags=["multi_index"])
    while not it.finished:
        idx = it.multi_index
        for sign in (+1, -1):
            xp = x.copy()
            xp[idx] += sign * eps
            new_args = list(args)
            new_args[index] = jnp.asarray(xp, jnp.float32)
            val = float(f(*new_args))
            grad[idx] += sign * val / (2 * eps)
        it.iternext()
    return grad


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_vjp_vs_central_difference(rng, causal):
    from tpu_flash.ops.attention import flash_attention

    B, H, L, d = 1, 1, 8, 4
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)) * 0.5,
                           jnp.float32) for _ in range(3))
    w = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal,
                                       impl="pallas") * w)

    grads = jax.grad(loss, (0, 1, 2))(q, k, v)
    for i, g in enumerate(grads):
        num = central_difference_grad(loss, (q, k, v), i)
        np.testing.assert_allclose(np.asarray(g), num, atol=1e-2, rtol=1e-2)


def test_layer_norm_vjp_vs_central_difference(rng):
    from tpu_flash.ops import layer_norm

    x = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    g = jnp.ones((8,), jnp.float32) * 1.3
    b = jnp.zeros((8,), jnp.float32)
    w = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)

    def loss(x, g, b):
        return jnp.sum(layer_norm(x, g, b) * w)

    grads = jax.grad(loss, (0, 1, 2))(x, g, b)
    for i, gr in enumerate(grads):
        num = central_difference_grad(loss, (x, g, b), i)
        np.testing.assert_allclose(np.asarray(gr), num, atol=1e-2, rtol=1e-2)
