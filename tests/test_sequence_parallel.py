"""Sequence/context parallelism vs single-device flash attention.

Runs on the 8-virtual-device CPU mesh (conftest.py); the Pallas kernels
execute in interpreter mode inside the shard_map regions, so these tests
exercise the exact collective + merge structure used on a real slice.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

from tpu_flash.ops.attention import flash_attention
from tpu_flash.parallel.sequence import sequence_parallel_attention

SEQ_AXIS = "seq"


def _mesh(n):
    return Mesh(np.asarray(jax.devices()[:n]), (SEQ_AXIS,))


def _spmd(fn, mesh):
    spec = P(None, None, SEQ_AXIS, None)
    return jax.jit(jax.shard_map(
        fn, mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec,
        check_vma=False))


@pytest.mark.parametrize("strategy", ["allgather", "ring"])
@pytest.mark.parametrize("n_dev", [2, 4])
def test_sequence_parallel_forward(rng, strategy, n_dev):
    B, H, L, d = 2, 2, 256, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    ref = flash_attention(q, k, v, causal=True, impl="pallas")

    mesh = _mesh(n_dev)
    fn = _spmd(
        lambda q, k, v: sequence_parallel_attention(
            q, k, v, axis_name=SEQ_AXIS, strategy=strategy), mesh)
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("strategy", ["allgather", "ring"])
def test_sequence_parallel_backward(rng, strategy):
    """Gradients through the sharded attention (incl. the lse cotangent of
    the online-softmax merge) match the single-device custom VJP."""
    B, H, L, d = 1, 2, 128, 16
    n_dev = 4
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    w = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       impl="pallas") * w)
    g_ref = jax.grad(loss_ref, (0, 1, 2))(q, k, v)

    mesh = _mesh(n_dev)
    spec = P(None, None, SEQ_AXIS, None)

    def loss_sp(q, k, v):
        fn = jax.shard_map(
            lambda q, k, v, w: jax.lax.psum(
                jnp.sum(sequence_parallel_attention(
                    q, k, v, axis_name=SEQ_AXIS, strategy=strategy) * w),
                SEQ_AXIS),
            mesh=mesh, in_specs=(spec, spec, spec, spec), out_specs=P(),
            check_vma=False)
        return fn(q, k, v, w)

    g_sp = jax.jit(jax.grad(loss_sp, (0, 1, 2)))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_allgather_matches_ring(rng):
    B, H, L, d = 1, 2, 192, 16   # L not a multiple of 128: block clamping
    n_dev = 4                    # L_loc = 48
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    mesh = _mesh(n_dev)
    outs = {}
    for strategy in ("allgather", "ring"):
        fn = _spmd(
            lambda q, k, v, s=strategy: sequence_parallel_attention(
                q, k, v, axis_name=SEQ_AXIS, strategy=s), mesh)
        outs[strategy] = np.asarray(fn(q, k, v))
    np.testing.assert_allclose(outs["allgather"], outs["ring"],
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("strategy", ["allgather", "ring"])
@pytest.mark.parametrize("window", [40, 96, 200])
def test_windowed_sp_matches_single_device(rng, strategy, window):
    """Sliding-window sequence parallelism: window smaller than a chunk
    (ring truncates to 2 hops), spanning several chunks, and larger than
    the sequence (degenerates to plain causal) — all must match the
    single-device windowed flash kernel, forward and grad."""
    B, H, L, d = 1, 2, 256, 16
    n_dev = 4                    # L_loc = 64
    q, k, v, w = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
                  for _ in range(4))
    mesh = _mesh(n_dev)
    spec = P(None, None, SEQ_AXIS, None)

    ref = flash_attention(q, k, v, causal=True, window=window)
    fn = _spmd(
        lambda q, k, v: sequence_parallel_attention(
            q, k, v, axis_name=SEQ_AXIS, strategy=strategy, window=window),
        mesh)
    out = fn(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    def loss_ref(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True,
                                       window=window) * w)

    def loss_sp(q, k, v):
        f = jax.shard_map(
            lambda q, k, v, w: jax.lax.psum(
                jnp.sum(sequence_parallel_attention(
                    q, k, v, axis_name=SEQ_AXIS, strategy=strategy,
                    window=window) * w),
                SEQ_AXIS),
            mesh=mesh, in_specs=(spec, spec, spec, spec), out_specs=P(),
            check_vma=False)
        return f(q, k, v, w)

    g_ref = jax.jit(jax.grad(loss_ref, (0, 1, 2)))(q, k, v)
    g_sp = jax.jit(jax.grad(loss_sp, (0, 1, 2)))(q, k, v)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_ring_window_truncates():
    """With window <= chunk_len the ring stops after 2 hops — the
    O(window) communication claim, asserted on the schedule itself."""
    from tpu_flash.parallel.sequence import _window_steps
    assert _window_steps(8, 64, None) == 8
    assert _window_steps(8, 64, 64) == 2
    assert _window_steps(8, 64, 65) == 3
    assert _window_steps(8, 64, 1024) == 8


def test_attention_with_lse_oracle_respects_causal_flag(rng):
    """The dense-oracle branch (non-pallas impl with q_offset set) must
    honor causal=False instead of masking unconditionally (ADVICE round 2).
    """
    from tpu_flash.parallel.sequence import _attention_with_lse

    q = jnp.asarray(rng.standard_normal((1, 2, 16, 32)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 16, 32)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 16, 32)), jnp.float32)
    out, lse = _attention_with_lse(q, k, v, causal=False, impl="reference",
                                   q_offset=0)
    # non-causal with q_offset=0 over equal lengths == plain dense attention
    from tpu_flash.ops.reference import naive_attention

    expected = naive_attention(q, k, v, causal=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                               atol=1e-5, rtol=1e-5)
