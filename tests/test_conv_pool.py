"""conv1d/conv2d and pooling vs explicit-loop oracles — the analog of the
reference's tests/test_conv.py and tests/test_nn.py for fast_conv.py
(minitorch semantics: kernel anchored at the output position, zero padding
past the end) and tile/avgpool2d/maxpool2d."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.nn import functional as F


def _conv1d_loops(x, w):
    B, Cin, T = x.shape
    Cout, _, K = w.shape
    out = np.zeros((B, Cout, T), np.float32)
    for b in range(B):
        for co in range(Cout):
            for t in range(T):
                for ci in range(Cin):
                    for k in range(K):
                        if t + k < T:
                            out[b, co, t] += x[b, ci, t + k] * w[co, ci, k]
    return out


def _conv2d_loops(x, w):
    B, Cin, H, W = x.shape
    Cout, _, KH, KW = w.shape
    out = np.zeros((B, Cout, H, W), np.float32)
    for b in range(B):
        for co in range(Cout):
            for i in range(H):
                for j in range(W):
                    for ci in range(Cin):
                        for ki in range(KH):
                            for kj in range(KW):
                                if i + ki < H and j + kj < W:
                                    out[b, co, i, j] += (
                                        x[b, ci, i + ki, j + kj]
                                        * w[co, ci, ki, kj])
    return out


def test_conv1d_matches_loops(rng):
    x = np.asarray(rng.standard_normal((2, 3, 9)), np.float32)
    w = np.asarray(rng.standard_normal((4, 3, 3)), np.float32)
    out = F.conv1d(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), _conv1d_loops(x, w),
                               atol=1e-5, rtol=1e-5)


def test_conv2d_matches_loops(rng):
    x = np.asarray(rng.standard_normal((2, 2, 6, 5)), np.float32)
    w = np.asarray(rng.standard_normal((3, 2, 2, 3)), np.float32)
    out = F.conv2d(jnp.asarray(x), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(out), _conv2d_loops(x, w),
                               atol=1e-5, rtol=1e-5)


def test_conv_gradients_finite(rng):
    x = jnp.asarray(rng.standard_normal((1, 2, 8)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((2, 2, 3)), jnp.float32)
    gx, gw = jax.grad(lambda x, w: jnp.sum(F.conv1d(x, w) ** 2), (0, 1))(x, w)
    assert np.isfinite(np.asarray(gx)).all()
    assert np.isfinite(np.asarray(gw)).all()


@pytest.mark.parametrize("kernel", [(2, 2), (2, 3)])
def test_pooling_matches_loops(rng, kernel):
    kh, kw = kernel
    x = np.asarray(rng.standard_normal((2, 3, 4, 6)), np.float32)
    avg = np.asarray(F.avgpool2d(jnp.asarray(x), kernel))
    mx = np.asarray(F.maxpool2d(jnp.asarray(x), kernel))
    H2, W2 = 4 // kh, 6 // kw
    for b in range(2):
        for c in range(3):
            for i in range(H2):
                for j in range(W2):
                    blk = x[b, c, i * kh:(i + 1) * kh, j * kw:(j + 1) * kw]
                    np.testing.assert_allclose(avg[b, c, i, j], blk.mean(),
                                               atol=1e-6)
                    np.testing.assert_allclose(mx[b, c, i, j], blk.max(),
                                               atol=1e-6)
