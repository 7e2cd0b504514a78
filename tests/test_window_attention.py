"""Sliding-window (local) attention — new capability vs the reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpu_flash
from tpu_flash.ops import reference as ref


def dense_window(q, k, v, window):
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * ref.default_scale(q.shape[-1])
    s = s + ref.causal_mask(q.shape[-2], k.shape[-2], s.dtype)
    s = s + ref.window_mask(q.shape[-2], k.shape[-2], window, s.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(s, axis=-1), v)


@pytest.mark.parametrize("L,window", [(256, 64), (256, 100), (300, 128),
                                      (512, 512), (128, 1)])
def test_forward_matches_dense(rng, L, window):
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, L, 64)) * 0.5,
                           jnp.float32) for _ in range(3))
    with jax.default_matmul_precision("highest"):
        out = tpu_flash.flash_attention(q, k, v, causal=True, window=window)
        want = dense_window(q, k, v, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_window_breaks_suffix_liveness_case(rng):
    """A shape where a LOWER q sub-tile attends a KV tile the upper one has
    slid past (the packed kernel's per-sub-tile partial branches)."""
    L, window = 2048, 512   # block_q=512 pairs, block_k=1024
    q, k, v = (jnp.asarray(rng.standard_normal((1, 1, L, 64)) * 0.5,
                           jnp.float32) for _ in range(3))
    with jax.default_matmul_precision("highest"):
        out = tpu_flash.flash_attention(q, k, v, causal=True, window=window)
        want = dense_window(q, k, v, window)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)


def test_backward_matches_dense_grad(rng):
    L, window = 256, 96
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, L, 64)) * 0.5,
                           jnp.float32) for _ in range(3))
    do = jnp.asarray(rng.standard_normal(q.shape), jnp.float32)

    def pallas_loss(q, k, v):
        return jnp.sum(tpu_flash.flash_attention(
            q, k, v, causal=True, window=window) * do)

    def dense_loss(q, k, v):
        return jnp.sum(dense_window(q, k, v, window) * do)

    with jax.default_matmul_precision("highest"):
        gp = jax.grad(pallas_loss, (0, 1, 2))(q, k, v)
        gd = jax.grad(dense_loss, (0, 1, 2))(q, k, v)
    for a, b in zip(gp, gd):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-3)


def test_window_with_dropout(rng):
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 192, 64)) * 0.5,
                           jnp.float32) for _ in range(3))
    out = tpu_flash.flash_attention(q, k, v, causal=True, window=64,
                                    dropout_rate=0.2, dropout_seed=4)
    oracle = tpu_flash.flash_attention(q, k, v, causal=True, window=64,
                                       dropout_rate=0.2, dropout_seed=4,
                                       impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle),
                               rtol=1e-4, atol=1e-4)


def test_window_tile_skip(rng):
    """The schedule visits O(L*window) tiles, not O(L^2/2)."""
    from tpu_flash.kernels.flash_attention import _packed_schedule

    im_full, *_ = _packed_schedule(
        8, 16, block_q=128, block_k=128, causal=True, q_offset=0,
        kv_len=2048, q_pack=2)
    im_win, *_ = _packed_schedule(
        8, 16, block_q=128, block_k=128, causal=True, q_offset=0,
        kv_len=2048, q_pack=2, window=256)
    assert len(im_win) < len(im_full) / 2


def test_window_requires_causal(rng):
    q = k = v = jnp.zeros((1, 1, 64, 64), jnp.float32)
    with pytest.raises(ValueError):
        tpu_flash.flash_attention(q, k, v, causal=False, window=16)


def test_decode_window_matches_dense(rng):
    from tpu_flash.kernels.decode import flash_decode_attention

    B, H, S, d, window = 2, 2, 512, 64, 96
    q = jnp.asarray(rng.standard_normal((B, H, 1, d)) * 0.5, jnp.float32)
    kc = jnp.asarray(rng.standard_normal((B, H, S, d)) * 0.5, jnp.float32)
    vc = jnp.asarray(rng.standard_normal((B, H, S, d)) * 0.5, jnp.float32)
    lengths = jnp.asarray([S, 200], jnp.int32)
    with jax.default_matmul_precision("highest"):
        out = flash_decode_attention(q, kc, vc, lengths, window=window)
        # dense: softmax over the last `window` valid keys per sequence
        for b in range(B):
            L = int(lengths[b])
            lo = max(0, L - window)
            s = jnp.einsum("hd,hkd->hk", q[b, :, 0], kc[b, :, lo:L]) \
                * ref.default_scale(d)
            p = jax.nn.softmax(s, axis=-1)
            want = jnp.einsum("hk,hkd->hd", p, vc[b, :, lo:L])
            np.testing.assert_allclose(np.asarray(out[b, :, 0]),
                                       np.asarray(want),
                                       rtol=1e-4, atol=1e-4)


def test_model_window_paths_agree(rng):
    """DecoderConfig.window: flash == naive forward; cached decode matches
    the uncached forward."""
    from tpu_flash import nn

    outs = {}
    ids = jnp.asarray(rng.integers(0, 64, (2, 24)))
    for kind in ("flash", "naive"):
        cfg = nn.DecoderConfig(n_vocab=64, n_embd=32, n_head=2, n_layer=1,
                               p_dropout=0.0, attention_kind=kind, window=8)
        model = nn.DecoderLM(cfg)
        params = model.init(jax.random.key(0))
        outs[kind] = model(params, ids)
    np.testing.assert_allclose(np.asarray(outs["flash"]),
                               np.asarray(outs["naive"]),
                               rtol=2e-3, atol=2e-3)

    # cached single-token decode with window == full forward's last position
    from tpu_flash.inference import make_caches
    cfg = nn.DecoderConfig(n_vocab=64, n_embd=32, n_head=2, n_layer=1,
                           p_dropout=0.0, attention_kind="naive", window=8)
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    ids = np.asarray(rng.integers(0, 64, (1, 16)))
    full = model(params, jnp.asarray(ids))
    caches = make_caches(model, 1, 32)
    # prefill all but last token, then decode the last one
    logits, caches = model(params, jnp.asarray(ids[:, :-1]),
                           kv_caches=caches,
                           positions=jnp.arange(15, dtype=jnp.int32)[None])
    step, caches = model(params, jnp.asarray(ids[:, -1:]),
                         kv_caches=caches,
                         positions=jnp.asarray([[15]], jnp.int32))
    np.testing.assert_allclose(np.asarray(step[0, 0]),
                               np.asarray(full[0, -1]),
                               rtol=2e-3, atol=2e-3)


def test_window_with_int8_kv(rng):
    q, k, v = (jnp.asarray(rng.standard_normal((1, 2, 192, 64)) * 0.5,
                           jnp.float32) for _ in range(3))
    out = tpu_flash.flash_attention(q, k, v, causal=True, window=64,
                                    kv_quant="int8")
    base = tpu_flash.flash_attention(q, k, v, causal=True, window=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                               atol=5e-2, rtol=5e-2)
    g = jax.grad(lambda q: jnp.sum(tpu_flash.flash_attention(
        q, k, v, causal=True, window=64, kv_quant="int8")))(q)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_window_zero_rejected(rng):
    """window=0 (a plausible 'disabled' spelling) would silently zero every
    attention output via the empty-band/empty-row convention — it must raise
    instead, at both the op and the config level."""
    q = k = v = jnp.zeros((1, 1, 64, 64), jnp.float32)
    with pytest.raises(ValueError):
        tpu_flash.flash_attention(q, k, v, causal=True, window=0)
    with pytest.raises(ValueError):
        tpu_flash.flash_attention(q, k, v, causal=True, window=-3)
    from tpu_flash import nn
    with pytest.raises(ValueError):
        nn.DecoderConfig(window=0)
    with pytest.raises(ValueError):
        nn.DecoderConfig(causal=False, window=8)
