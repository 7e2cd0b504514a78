"""In-kernel attention dropout (hash-mask, recomputed in backward).

New capability vs the reference (its flash kernels have no dropout and its
model-level attention dropout is never applied, modules_transfomer.py:56);
BASELINE.md measured config (2) is "causal+dropout".
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_flash
from tpu_flash.ops import reference as ref


def make_qkv(rng, B=2, H=2, Lq=192, Lk=192, d=64, dtype=jnp.float32):
    return tuple(
        jnp.asarray(rng.standard_normal((B, H, L, d)) * 0.5, dtype)
        for L in (Lq, Lk, Lk))


def test_rate_zero_is_identity(rng):
    q, k, v = make_qkv(rng)
    a = tpu_flash.flash_attention(q, k, v, causal=True)
    b = tpu_flash.flash_attention(q, k, v, causal=True, dropout_rate=0.0,
                                  dropout_seed=7)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("causal", [False, True])
def test_matches_dense_oracle(rng, causal):
    """Kernel output == dense softmax with the SAME hash mask applied."""
    q, k, v = make_qkv(rng)
    rate, seed = 0.25, 1234
    out = tpu_flash.flash_attention(
        q, k, v, causal=causal, dropout_rate=rate, dropout_seed=seed)
    oracle = tpu_flash.flash_attention(
        q, k, v, causal=causal, dropout_rate=rate, dropout_seed=seed,
        impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_deterministic_and_seed_sensitive(rng):
    q, k, v = make_qkv(rng)
    a = tpu_flash.flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=5)
    b = tpu_flash.flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=5)
    c = tpu_flash.flash_attention(q, k, v, dropout_rate=0.3, dropout_seed=6)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a - c))) > 0.0


def test_drop_fraction():
    keep = ref.dropout_keep_oracle(2, 2, 256, 256, jnp.int32(42), 0.25)
    frac_dropped = float(jnp.mean(keep == 0.0))
    assert abs(frac_dropped - 0.25) < 0.01
    # kept entries carry the 1/(1-rate) scale
    assert np.isclose(float(jnp.max(keep)), 1.0 / 0.75, rtol=1e-6)


def test_mean_preserving():
    # E[dropout(P)] = P: averaged over many rows, out ~= no-dropout out.
    rng = np.random.default_rng(0)
    q, k, v = make_qkv(rng, B=4, H=4, Lq=256, Lk=256)
    drop = tpu_flash.flash_attention(q, k, v, dropout_rate=0.1,
                                     dropout_seed=9)
    base = tpu_flash.flash_attention(q, k, v)
    diff = float(jnp.mean(jnp.abs(drop - base)))
    scale = float(jnp.mean(jnp.abs(base)))
    assert diff < 0.5 * scale  # noisy but centered


@pytest.mark.parametrize("causal", [False, True])
def test_backward_central_difference(rng, causal):
    """The regenerated-mask backward against central differences (the mask
    is seed-deterministic, so the dropped objective is differentiable)."""
    q, k, v = make_qkv(rng, B=1, H=2, Lq=96, Lk=96)
    fn = lambda q, k, v: tpu_flash.flash_attention(
        q, k, v, causal=causal, dropout_rate=0.2, dropout_seed=11)
    assert tpu_flash.grad_check(fn, q, k, v, n_samples=3,
                                rtol=2e-2, atol=2e-2)


def test_backward_matches_oracle_grad(rng):
    """Pallas VJP == jax.grad through the dense oracle with the same mask."""
    q, k, v = make_qkv(rng, B=1, H=2, Lq=128, Lk=128)
    do = jnp.asarray(np.random.default_rng(1).standard_normal(q.shape),
                     jnp.float32)
    rate, seed = 0.15, 3

    def pallas_loss(q, k, v):
        out = tpu_flash.flash_attention(
            q, k, v, causal=True, dropout_rate=rate, dropout_seed=seed,
            impl="pallas")
        return jnp.sum(out * do)

    def dense_loss(q, k, v):
        # raw-jnp dense attention with the same hash mask: jax.grad
        # differentiates through it natively (no custom_vjp).
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * ref.default_scale(
            q.shape[-1])
        s = s + ref.causal_mask(q.shape[-2], k.shape[-2], s.dtype)
        probs = jax.nn.softmax(s, axis=-1) * ref.dropout_keep_oracle(
            q.shape[0], q.shape[1], q.shape[2], k.shape[2],
            jnp.int32(seed), rate)
        return jnp.sum(jnp.einsum("bhqk,bhkd->bhqd", probs, v) * do)

    with jax.default_matmul_precision("highest"):
        g_pallas = jax.grad(pallas_loss, (0, 1, 2))(q, k, v)
        g_oracle = jax.grad(dense_loss, (0, 1, 2))(q, k, v)
    for a, b in zip(g_pallas, g_oracle):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("kind", ["flash", "naive", "fused"])
def test_model_level_attn_dropout(rng, kind):
    """DecoderConfig.attn_dropout changes training forward (on EVERY
    attention path), not eval."""
    from tpu_flash import nn

    cfg = nn.DecoderConfig(n_vocab=64, n_embd=32, n_head=2, n_layer=1,
                           p_dropout=0.0, attn_dropout=0.3,
                           attention_kind=kind,
                           use_fused_kernel=(kind == "fused"))
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)))
    key = jax.random.key(1)
    train_a = model(params, ids, key=key, training=True)
    train_b = model(params, ids, key=key, training=True)
    train_c = model(params, ids, key=jax.random.key(2), training=True)
    eval_out = model(params, ids, training=False)
    eval_out2 = model(params, ids, training=False)
    np.testing.assert_array_equal(np.asarray(train_a), np.asarray(train_b))
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(eval_out2))
    assert float(jnp.max(jnp.abs(train_a - train_c))) > 0.0
    assert float(jnp.max(jnp.abs(train_a - eval_out))) > 0.0


def test_dropout_with_int8_kv(rng):
    """dropout composes with quantized-KV training attention."""
    q, k, v = make_qkv(rng, B=1, H=2, Lq=128, Lk=128)
    out = tpu_flash.flash_attention(
        q, k, v, causal=True, kv_quant="int8", dropout_rate=0.2,
        dropout_seed=21)
    base = tpu_flash.flash_attention(q, k, v, causal=True, kv_quant="int8")
    assert out.shape == base.shape
    assert float(jnp.max(jnp.abs(out - base))) > 0.0
    do = jnp.asarray(np.random.default_rng(2).standard_normal(q.shape),
                     jnp.float32)
    g = jax.grad(lambda *a: jnp.sum(tpu_flash.flash_attention(
        *a, causal=True, kv_quant="int8", dropout_rate=0.2,
        dropout_seed=21) * do), (0, 1, 2))(q, k, v)
    assert all(bool(jnp.all(jnp.isfinite(x))) for x in g)
    # int8+dropout grads track the fp+dropout grads (quantization noise only)
    g_fp = jax.grad(lambda *a: jnp.sum(tpu_flash.flash_attention(
        *a, causal=True, dropout_rate=0.2, dropout_seed=21) * do),
        (0, 1, 2))(q, k, v)
    for a, b in zip(g, g_fp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0.2, atol=0.05)


def test_xla_impl_dropout_differentiable(rng):
    """The dense fallback (impl='xla', e.g. indivisible shapes under a
    parallel context) must be differentiable with dropout on."""
    q, k, v = make_qkv(rng, B=1, H=1, Lq=64, Lk=64, d=16)
    g = jax.grad(lambda q: jnp.sum(tpu_flash.flash_attention(
        q, k, v, causal=True, dropout_rate=0.2, dropout_seed=5,
        impl="xla")))(q)
    assert bool(jnp.all(jnp.isfinite(g)))
    # and it matches the pallas backward on the same mask
    g_p = jax.grad(lambda q: jnp.sum(tpu_flash.flash_attention(
        q, k, v, causal=True, dropout_rate=0.2, dropout_seed=5,
        impl="pallas")))(q)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_p),
                               rtol=1e-3, atol=1e-3)
