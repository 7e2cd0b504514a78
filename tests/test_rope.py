"""Rotary position embeddings (optional positional mode, new capability)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.inference.sampler import make_caches
from tpu_flash.nn.functional import apply_rope


def test_rope_math_matches_manual(rng):
    B, H, L, d = 1, 1, 4, 8
    x = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    out = np.asarray(apply_rope(x, pos))
    half = d // 2
    for t in range(L):
        for i in range(half):
            theta = t * (10_000.0 ** (-i / half))
            c, s = np.cos(theta), np.sin(theta)
            x1 = float(x[0, 0, t, i]); x2 = float(x[0, 0, t, half + i])
            np.testing.assert_allclose(out[0, 0, t, i], x1 * c - x2 * s,
                                       atol=1e-5)
            np.testing.assert_allclose(out[0, 0, t, half + i],
                                       x1 * s + x2 * c, atol=1e-5)


def test_rope_relative_shift_invariance(rng):
    """q_t . k_s after RoPE depends only on (t - s): shifting all positions
    by a constant leaves the attention scores unchanged."""
    B, H, L, d = 1, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    pos = jnp.arange(L, dtype=jnp.int32)[None, :]
    s0 = jnp.einsum("bhqd,bhkd->bhqk", apply_rope(q, pos),
                    apply_rope(k, pos))
    s1 = jnp.einsum("bhqd,bhkd->bhqk", apply_rope(q, pos + 37),
                    apply_rope(k, pos + 37))
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               atol=1e-4, rtol=1e-4)


def _model(positional):
    cfg = nn.DecoderConfig(
        n_vocab=64, n_embd=32, n_head=2, n_positions=64, n_layer=2,
        p_dropout=0.0, attention_kind="flash", positional=positional)
    model = nn.DecoderLM(cfg)
    return model, model.init(jax.random.key(0))


def test_rope_has_no_learned_position_params():
    _, params = _model("rope")
    assert "position_embeddings" not in params
    _, params = _model("learned")
    assert "position_embeddings" in params


def test_rope_cached_decode_matches_full_forward(rng):
    model, params = _model("rope")
    B, L = 2, 12
    ids = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)
    full = model(params, ids)
    caches = make_caches(model, B, 32)
    logits, caches = model(params, ids[:, :4], kv_caches=caches,
                           positions=jnp.arange(4)[None, :].repeat(B, 0))
    np.testing.assert_allclose(np.asarray(logits), np.asarray(full[:, :4]),
                               atol=1e-4, rtol=1e-4)
    for t in range(4, L):
        logits, caches = model(
            params, ids[:, t:t + 1], kv_caches=caches,
            positions=jnp.full((B, 1), t, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full[:, t]),
            atol=1e-4, rtol=1e-4, err_msg=f"step {t}")


def test_rope_model_trains(rng):
    model, params = _model("rope")
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)
    loss, grads = jax.value_and_grad(
        lambda p: jnp.mean(nn.functional.softmax_loss(model(p, ids), tgt))
    )(params)
    assert np.isfinite(float(loss))
    gn = sum(float(jnp.sum(g * g))
             for g in jax.tree_util.tree_leaves(grads))
    assert np.isfinite(gn) and gn > 0


def test_top_p_sampling_masks_tail(rng):
    from tpu_flash.inference.sampler import SamplingConfig, _sample_token
    logits = jnp.asarray([[10.0, 9.0, -20.0, -20.0, -20.0]], jnp.float32)
    cfg = SamplingConfig(temperature=1.0, top_p=0.5)
    toks = [int(_sample_token(logits, cfg, jax.random.key(i))[0])
            for i in range(20)]
    assert set(toks) == {0}   # p(token0)=0.73 > 0.5: nucleus is {0}
    cfg = SamplingConfig(temperature=1.0, top_p=0.9)
    toks = [int(_sample_token(logits, cfg, jax.random.key(i))[0])
            for i in range(50)]
    assert set(toks) == {0, 1}
