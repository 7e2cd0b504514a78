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
