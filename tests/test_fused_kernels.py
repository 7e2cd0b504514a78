"""Pallas fused masked-softmax and LayerNorm kernel parity vs the jnp oracles
and stock jax.grad — the analog of kernel_tests/test_softmax_{fw,bw}.py and
kernel_tests/test_layernorm_{fw,bw}.py in the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.kernels.layernorm import layernorm_backward, layernorm_forward
from tpu_flash.kernels.softmax import attn_softmax_backward, attn_softmax_forward
from tpu_flash.ops import attn_softmax, layer_norm, layer_norm_with_stats
from tpu_flash.ops import reference as ref

TOL = dict(atol=1e-5, rtol=1e-5)


def rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


# ---------------------------------------------------------------------------
# attn_softmax
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(2, 2, 16, 32), (1, 4, 64, 128), (2, 1, 40, 200)])
@pytest.mark.parametrize("mask_future", [False, True])
@pytest.mark.parametrize("with_pad", [False, True])
def test_softmax_forward(rng, shape, mask_future, with_pad):
    B, H, Lq, Lk = shape
    x = rand(rng, shape)
    pad = None
    if with_pad:
        keep = rng.integers(Lk // 2, Lk)
        pad = jnp.where(jnp.arange(Lk)[None, :] < keep, 0.0, -1e9)
        pad = jnp.tile(pad.astype(jnp.float32), (B, 1))
    out = attn_softmax_forward(x, pad, mask_future=mask_future)
    expected = ref.attn_softmax_reference(x, pad, mask_future=mask_future)
    np.testing.assert_allclose(out, expected, **TOL)


@pytest.mark.parametrize("shape", [(2, 2, 16, 32), (1, 4, 64, 200)])
def test_softmax_backward(rng, shape):
    prob = jax.nn.softmax(rand(rng, shape), axis=-1)
    dprob = rand(rng, shape)
    dx = attn_softmax_backward(prob, dprob)
    expected = ref.attn_softmax_bw_reference(prob, dprob)
    np.testing.assert_allclose(dx, expected, **TOL)


def test_softmax_custom_vjp(rng):
    shape = (1, 2, 16, 32)
    x = rand(rng, shape)
    dout = rand(rng, shape)

    def f(x):
        return jnp.sum(attn_softmax(x, mask_future=True, impl="pallas") * dout)

    def f_ref(x):
        return jnp.sum(ref.attn_softmax_reference(x, mask_future=True) * dout)

    np.testing.assert_allclose(jax.grad(f)(x), jax.grad(f_ref)(x), atol=1e-5, rtol=1e-4)


def test_softmax_long_rows_beyond_reference_cap(rng):
    """The CUDA kernel throws for to_len > 1024 (src/softmax_kernel.cu:277);
    the Pallas kernel must not."""
    x = rand(rng, (1, 1, 8, 3000))
    out = attn_softmax_forward(x, None, mask_future=False)
    expected = ref.attn_softmax_reference(x)
    np.testing.assert_allclose(out, expected, **TOL)


# ---------------------------------------------------------------------------
# layernorm
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("shape", [(8, 64), (4, 10, 256), (3, 5, 100)])
def test_layernorm_forward(rng, shape):
    x = rand(rng, shape)
    g = rand(rng, shape[-1:])
    b = rand(rng, shape[-1:])
    y, mean, var = layernorm_forward(x, g, b)
    y_e, mean_e, var_e = ref.layernorm_fw_reference(x, g, b)
    np.testing.assert_allclose(y, y_e, **TOL)
    np.testing.assert_allclose(mean, mean_e, **TOL)
    np.testing.assert_allclose(var, var_e, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("shape", [(8, 64), (4, 10, 256)])
def test_layernorm_backward(rng, shape):
    x = rand(rng, shape)
    g = rand(rng, shape[-1:])
    b = rand(rng, shape[-1:])
    dy = rand(rng, shape)
    _, mean, var = layernorm_forward(x, g, b)
    dx, dg, db = layernorm_backward(dy, x, g, mean, var)
    dx_e, dg_e, db_e = ref.layernorm_bw_reference(dy, x, g, mean, var)
    np.testing.assert_allclose(dx, dx_e, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(dg, dg_e, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(db, db_e, atol=1e-4, rtol=1e-4)


def test_layernorm_custom_vjp_matches_autodiff(rng):
    shape = (4, 8, 64)
    x = rand(rng, shape)
    g = rand(rng, shape[-1:])
    b = rand(rng, shape[-1:])
    dy = rand(rng, shape)

    def f(x, g, b):
        return jnp.sum(layer_norm(x, g, b, impl="pallas") * dy)

    def f_ref(x, g, b):
        y, _, _ = ref.layernorm_fw_reference(x, g, b)
        return jnp.sum(y * dy)

    got = jax.grad(f, argnums=(0, 1, 2))(x, g, b)
    exp = jax.grad(f_ref, argnums=(0, 1, 2))(x, g, b)
    for a, e in zip(got, exp):
        np.testing.assert_allclose(a, e, atol=1e-4, rtol=1e-4)


def test_layernorm_stats_triple(rng):
    """layer_norm_with_stats returns (y, mean, var) like launch_layernorm."""
    x = rand(rng, (6, 32))
    g = jnp.ones((32,))
    b = jnp.zeros((32,))
    y, mean, var = layer_norm_with_stats(x, g, b, impl="pallas")
    np.testing.assert_allclose(mean, jnp.mean(x, -1), atol=1e-5)
    np.testing.assert_allclose(var, jnp.var(x, -1), atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(jnp.mean(y, -1), jnp.zeros(6), atol=1e-5)
