"""Hypothesis property tests — the analog of the reference's Oracle A
(tests/test_tensor_general.py + minitorch/testing.py op zoo driven by
hypothesis strategies): tensor-semantics parity against numpy, algebraic
properties of the functional ops, and flash-vs-naive attention parity over
randomized shapes.

The reference hand-built strided storage/broadcasting and so property-tested
map/zip/reduce/permute against pure-python loops; here jnp provides those,
and the properties assert jnp == numpy on the same data — plus the
framework-specific invariants (softmax normalization/shift-invariance,
logsumexp identity, flash == naive attention) on hypothesis-drawn shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

import tpu_flash
from tpu_flash.nn import functional as F

SETTINGS = dict(max_examples=50, deadline=None)


def arrays(draw, shape, lo=-5.0, hi=5.0):
    n = int(np.prod(shape))
    vals = draw(st.lists(
        st.floats(lo, hi, width=32, allow_nan=False, allow_subnormal=False),
        min_size=n, max_size=n))
    arr = np.asarray(vals, np.float32).reshape(shape)
    # XLA flushes subnormals to zero (hardware FTZ) while numpy keeps them —
    # a real semantic difference, but not one any framework op is expected
    # to preserve.  Snap tiny magnitudes to 0 so no drawn value NOR any
    # product of two drawn values (>= 1e-30 > 2^-126) lands subnormal.
    arr[np.abs(arr) < 1e-15] = 0.0
    return arr


small_shapes = st.lists(st.integers(1, 5), min_size=1, max_size=4).map(tuple)


@st.composite
def shaped_array(draw):
    return arrays(draw, draw(small_shapes))


@st.composite
def two_broadcastable(draw):
    """A shape and a right-aligned broadcastable partner (dims shrunk to 1
    or dropped) — the reference's shape_broadcast semantics."""
    shape = draw(small_shapes)
    start = draw(st.integers(0, len(shape)))
    partner = tuple(
        d if draw(st.booleans()) else 1 for d in shape[start:]) or (1,)
    return arrays(draw, shape), arrays(draw, partner)


@given(two_broadcastable())
@settings(**SETTINGS)
def test_broadcast_zip_matches_numpy(pair):
    x, y = pair
    for jf, nf in [(jnp.add, np.add), (jnp.multiply, np.multiply),
                   (jnp.maximum, np.maximum)]:
        np.testing.assert_allclose(jf(x, y), nf(x, y), rtol=1e-6)


@given(shaped_array(), st.data())
@settings(**SETTINGS)
def test_permute_reduce_matches_numpy(x, data):
    perm = data.draw(st.permutations(range(x.ndim)))
    axis = data.draw(st.integers(0, x.ndim - 1))
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(x, perm).sum(axis)),
        np.transpose(x, perm).sum(axis), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(x, perm).max(axis)),
        np.transpose(x, perm).max(axis), rtol=1e-6)


@given(st.integers(1, 4), st.integers(1, 6), st.integers(1, 6),
       st.integers(1, 5), st.data())
@settings(**SETTINGS)
def test_matmul_matches_numpy(b, m, k, n, data):
    xs = data.draw(st.lists(st.floats(-3, 3, width=32, allow_nan=False),
                            min_size=b * m * k, max_size=b * m * k))
    ys = data.draw(st.lists(st.floats(-3, 3, width=32, allow_nan=False),
                            min_size=b * k * n, max_size=b * k * n))
    x = np.asarray(xs, np.float32).reshape(b, m, k)
    y = np.asarray(ys, np.float32).reshape(b, k, n)
    with jax.default_matmul_precision("highest"):
        np.testing.assert_allclose(
            np.asarray(jnp.matmul(x, y)), np.matmul(x, y),
            rtol=1e-5, atol=1e-5)


@given(shaped_array(), st.floats(-10, 10, width=32, allow_nan=False))
@settings(**SETTINGS)
def test_softmax_properties(x, shift):
    p = F.softmax(x, axis=-1)
    np.testing.assert_allclose(np.asarray(p.sum(-1)), 1.0, rtol=1e-5)
    # shift invariance
    np.testing.assert_allclose(
        np.asarray(F.softmax(x + shift, axis=-1)), np.asarray(p),
        rtol=1e-4, atol=1e-6)


@given(shaped_array())
@settings(**SETTINGS)
def test_logsumexp_identity(x):
    lse = F.logsumexp(x, axis=-1)
    np.testing.assert_allclose(
        np.asarray(lse),
        np.log(np.exp(x.astype(np.float64)).sum(-1)),
        rtol=1e-5, atol=1e-5)


@given(st.integers(1, 2), st.integers(1, 3), st.integers(1, 40),
       st.integers(1, 40), st.sampled_from([4, 8, 16]), st.booleans(),
       st.randoms(use_true_random=False))
@settings(max_examples=20, deadline=None)
def test_flash_matches_naive_random_shapes(b, h, lq, lk, d, causal, rnd):
    """Flash kernel == naive attention on arbitrary (unaligned) shapes.

    Causal uses the bottom-right-aligned convention, which requires
    lq <= lk for every query row to see at least one key (rows with no
    visible keys use the out=0 empty convention — tested separately in
    test_flash_kernels)."""
    if causal and lq > lk:
        lq, lk = lk, lq
    rng = np.random.default_rng(rnd.randint(0, 2**31))
    q = jnp.asarray(rng.standard_normal((b, h, lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, lk, d)), jnp.float32)
    with jax.default_matmul_precision("highest"):
        out = tpu_flash.flash_attention(q, k, v, causal=causal)
        ref = tpu_flash.naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-3, atol=1e-3)


@st.composite
def strided_view(draw):
    """A non-contiguous, permuted view of a larger buffer — the analog of
    the reference's random-strides/permutes strategies
    (tests/tensor_strategies.py:23-127): ops must be layout-independent."""
    shape = draw(st.lists(st.integers(1, 4), min_size=1, max_size=3)
                 .map(tuple))
    steps = tuple(draw(st.integers(1, 3)) for _ in shape)
    big = arrays(draw, tuple(d * s for d, s in zip(shape, steps)))
    view = big[tuple(slice(None, None, s) for s in steps)]
    perm = draw(st.permutations(range(len(shape))))
    return np.transpose(view, perm)


@given(strided_view(), st.data())
@settings(**SETTINGS)
def test_strided_permuted_views_match_numpy(x, data):
    """jnp ops on strided+permuted numpy views == numpy on the same view
    (storage layout must never leak into op semantics)."""
    axis = data.draw(st.integers(0, x.ndim - 1))
    np.testing.assert_allclose(np.asarray(jnp.sum(x, axis)), x.sum(axis),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.exp(x)),
                               np.exp(x), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(jnp.asarray(x).T),
                               x.T, rtol=0)
    # reductions after an on-device permute equal numpy on the host view
    perm = data.draw(st.permutations(range(x.ndim)))
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(jnp.asarray(x), perm).min(axis)),
        np.transpose(x, perm).min(axis), rtol=1e-6)


@given(strided_view(), strided_view())
@settings(**SETTINGS)
def test_strided_binary_broadcast_matches_numpy(x, y):
    """Binary ops between two independently-strided views broadcast (or
    refuse) exactly like numpy."""
    try:
        expected = np.add(x, y)
    except ValueError:
        return  # not broadcastable — jnp raising too is vacuously fine
    np.testing.assert_allclose(np.asarray(jnp.add(x, y)), expected,
                               rtol=1e-6)
