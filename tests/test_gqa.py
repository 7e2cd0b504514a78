"""Grouped-query / multi-query attention (new capability vs the reference's
MHA-only design): training-path equivalence with manually expanded KV heads,
and decode-path parity between the grouped kernel and full forward."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.inference.sampler import make_caches


def _model(n_kv_head):
    cfg = nn.DecoderConfig(
        n_vocab=64, n_embd=64, n_head=4, n_kv_head=n_kv_head,
        n_positions=64, n_layer=2, p_dropout=0.0, attention_kind="flash")
    model = nn.DecoderLM(cfg)
    return model, model.init(jax.random.key(0))


@pytest.mark.parametrize("n_kv_head", [1, 2])
def test_gqa_param_shapes(n_kv_head):
    model, params = _model(n_kv_head)
    kvp = params["layers"]["0"]["attention"]["k_projection"]["weight"]
    assert kvp.shape == (64, n_kv_head * 16)


@pytest.mark.parametrize("n_kv_head", [1, 2, 4])
def test_gqa_matches_expanded_mha(rng, n_kv_head):
    """GQA forward == MHA forward whose k/v projections are the GQA ones
    tiled across each query group."""
    gqa, params = _model(n_kv_head)
    mha, _ = _model(4)
    g = 4 // n_kv_head

    import copy
    mparams = copy.deepcopy(params)
    for li in range(2):
        att = mparams["layers"][str(li)]["attention"]
        for proj in ("k_projection", "v_projection"):
            w = att[proj]["weight"].reshape(64, n_kv_head, 16)
            att[proj]["weight"] = jnp.repeat(w, g, axis=1).reshape(64, 64)
            b = att[proj]["bias"].reshape(n_kv_head, 16)
            att[proj]["bias"] = jnp.repeat(b, g, axis=0).reshape(64)

    ids = jnp.asarray(rng.integers(0, 64, (2, 32)), jnp.int32)
    np.testing.assert_allclose(
        np.asarray(gqa(params, ids)), np.asarray(mha(mparams, ids)),
        atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_gqa_cached_decode_matches_full_forward(rng, quant):
    model, params = _model(2)
    B, L = 2, 12
    ids = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)
    full = model(params, ids)

    caches = make_caches(model, B, 32, quant=quant)
    logits, caches = model(params, ids[:, :4], kv_caches=caches,
                           positions=jnp.arange(4)[None, :].repeat(B, 0))
    tol = dict(atol=1e-4, rtol=1e-4) if quant == "none" else \
        dict(atol=0.2, rtol=0.2)
    np.testing.assert_allclose(np.asarray(logits),
                               np.asarray(full[:, :4]), **tol)
    for t in range(4, L):
        logits, caches = model(
            params, ids[:, t:t + 1], kv_caches=caches,
            positions=jnp.full((B, 1), t, jnp.int32))
        np.testing.assert_allclose(
            np.asarray(logits[:, 0]), np.asarray(full[:, t]), **tol,
            err_msg=f"step {t}")


def test_training_kernel_native_gqa_fwd_bwd(rng):
    """flash_attention with Hkv < Hq (no repeat) == repeated-KV MHA, both
    forward and grads (dk/dv group-summed)."""
    import tpu_flash

    B, Hq, Hkv, L, d = 1, 4, 2, 192, 64
    q = jnp.asarray(rng.standard_normal((B, Hq, L, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, d)) * 0.5, jnp.float32)
    do = jnp.asarray(rng.standard_normal((B, Hq, L, d)), jnp.float32)
    kr = jnp.repeat(k, 2, axis=1)
    vr = jnp.repeat(v, 2, axis=1)

    with jax.default_matmul_precision("highest"):
        out = tpu_flash.flash_attention(q, k, v, causal=True, impl="pallas")
        want = tpu_flash.flash_attention(q, kr, vr, causal=True,
                                         impl="pallas")
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

        g_gqa = jax.grad(lambda q, k, v: jnp.sum(tpu_flash.flash_attention(
            q, k, v, causal=True, impl="pallas") * do), (0, 1, 2))(q, k, v)
        g_rep = jax.grad(lambda q, k, v: jnp.sum(tpu_flash.flash_attention(
            q, k, v, causal=True, impl="pallas") * do), (0, 1, 2))(q, kr, vr)
    np.testing.assert_allclose(np.asarray(g_gqa[0]), np.asarray(g_rep[0]),
                               rtol=1e-4, atol=1e-5)
    # repeated-KV dk summed over groups == native GQA dk
    for i in (1, 2):
        summed = np.asarray(g_rep[i]).reshape(B, Hkv, 2, L, d).sum(2)
        np.testing.assert_allclose(np.asarray(g_gqa[i]), summed,
                                   rtol=1e-4, atol=1e-4)


def test_training_kernel_gqa_with_window_and_dropout(rng):
    import tpu_flash

    B, Hq, Hkv, L, d = 1, 4, 2, 256, 64
    q = jnp.asarray(rng.standard_normal((B, Hq, L, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, d)) * 0.5, jnp.float32)
    out = tpu_flash.flash_attention(q, k, v, causal=True, window=64,
                                    impl="pallas")
    want = tpu_flash.flash_attention(q, jnp.repeat(k, 2, 1),
                                     jnp.repeat(v, 2, 1), causal=True,
                                     window=64, impl="pallas")
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-4, atol=1e-4)
