"""Oracle self-consistency: the tiled FA1/FA2 reference implementations must
agree with naive attention (forward) and with stock jax.grad through the naive
graph (backward) — the same cross-check strategy the reference uses between
kernel_tests/flash_attn_python.py and its minitorch baseline graph
(kernel_tests/test_flashattn_fw.py:60-76, test_flashattn_bw.py:152-210)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.ops import reference as ref

SHAPES = [(1, 2, 32, 16), (2, 4, 64, 32), (1, 8, 128, 64)]
FW_TOL = dict(atol=1e-3, rtol=1e-3)   # kernel_tests/test_flashattn_fw.py:23
BW_TOL = dict(atol=1e-2, rtol=1e-3)   # kernel_tests/test_flashattn_bw.py:19


def make_qkv(rng, shape):
    q = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    k = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    return q, k, v


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("causal", [False, True])
def test_fa1_forward_matches_naive(rng, shape, causal):
    q, k, v = make_qkv(rng, shape)
    out, l, m = ref.flash_attention1_fw_reference(q, k, v, causal=causal)
    expected = ref.naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(out, expected, **FW_TOL)
    # l/m sanity: softmax normalizer reconstructable
    assert l.shape == shape[:3] and m.shape == shape[:3]
    assert bool(jnp.all(l > 0))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("causal", [False, True])
def test_fa2_forward_matches_naive(rng, shape, causal):
    q, k, v = make_qkv(rng, shape)
    out, lse = ref.flash_attention2_fw_reference(q, k, v, causal=causal)
    expected = ref.naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(out, expected, **FW_TOL)
    # lse must equal the exact logsumexp of the scores
    scale = ref.default_scale(shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        s = s + ref.causal_mask(shape[2], shape[2])
    np.testing.assert_allclose(lse, jax.nn.logsumexp(s, axis=-1), **FW_TOL)


@pytest.mark.parametrize("shape", SHAPES[:2])
@pytest.mark.parametrize("causal", [False, True])
@pytest.mark.parametrize("version", [1, 2])
def test_fa_backward_matches_autodiff(rng, shape, causal, version):
    q, k, v = make_qkv(rng, shape)
    do = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def loss(q, k, v):
        return jnp.sum(ref.naive_attention(q, k, v, causal=causal) * do)

    dq_e, dk_e, dv_e = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    if version == 1:
        out, l, m = ref.flash_attention1_fw_reference(q, k, v, causal=causal)
        dq, dk, dv = ref.flash_attention1_bw_reference(
            q, k, v, out, l, m, do, causal=causal)
    else:
        out, lse = ref.flash_attention2_fw_reference(q, k, v, causal=causal)
        dq, dk, dv = ref.flash_attention2_bw_reference(
            q, k, v, out, lse, do, causal=causal)

    np.testing.assert_allclose(dq, dq_e, **BW_TOL)
    np.testing.assert_allclose(dk, dk_e, **BW_TOL)
    np.testing.assert_allclose(dv, dv_e, **BW_TOL)


def test_attn_softmax_reference(rng):
    B, H, Lq, Lk = 2, 3, 16, 24
    x = jnp.asarray(rng.standard_normal((B, H, Lq, Lk)), jnp.float32)
    pad = jnp.where(jnp.arange(Lk)[None, :] < 20, 0.0, -1e9).astype(jnp.float32)
    pad = jnp.tile(pad, (B, 1))
    prob = ref.attn_softmax_reference(x, pad, mask_future=True)
    # rows sum to ~1, padded & future cols ~0
    np.testing.assert_allclose(jnp.sum(prob, -1), jnp.ones((B, H, Lq)), atol=1e-5)
    assert float(jnp.max(prob[..., 20:])) < 1e-6
    future = jnp.triu(jnp.ones((Lq, Lk)), k=1 + (Lk - Lq))
    assert float(jnp.max(prob * future)) < 1e-6


def test_attn_softmax_bw_matches_autodiff(rng):
    B, H, Lq, Lk = 1, 2, 8, 16
    x = jnp.asarray(rng.standard_normal((B, H, Lq, Lk)), jnp.float32)
    dprob = jnp.asarray(rng.standard_normal((B, H, Lq, Lk)), jnp.float32)

    def f(x):
        return jnp.sum(ref.attn_softmax_reference(x) * dprob)

    dx_e = jax.grad(f)(x)
    prob = ref.attn_softmax_reference(x)
    dx = ref.attn_softmax_bw_reference(prob, dprob)
    np.testing.assert_allclose(dx, dx_e, atol=1e-5, rtol=1e-4)


def test_layernorm_reference(rng):
    x = jnp.asarray(rng.standard_normal((4, 6, 32)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)), jnp.float32)
    y, mean, var = ref.layernorm_fw_reference(x, g, b)
    np.testing.assert_allclose(mean, jnp.mean(x, -1), atol=1e-6)
    np.testing.assert_allclose(var, jnp.var(x, -1), atol=1e-5)

    dy = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)

    def f(x, g, b):
        y, _, _ = ref.layernorm_fw_reference(x, g, b)
        return jnp.sum(y * dy)

    dx_e, dg_e, db_e = jax.grad(f, argnums=(0, 1, 2))(x, g, b)
    dx, dg, db = ref.layernorm_bw_reference(dy, x, g, mean, var)
    np.testing.assert_allclose(dx, dx_e, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(dg, dg_e, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(db, db_e, atol=1e-4, rtol=1e-4)
