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


def test_gqa_xla_impl_grads_match_pallas(rng):
    """The non-pallas fallback must differentiate GQA shapes: its residuals
    hold the unrepeated Hkv-head k/v, so the backward repeats them for the
    tiled oracle and group-sums dk/dv (regression: it used to crash with an
    einsum shape error)."""
    from tpu_flash.ops import flash_attention

    B, Hq, Hkv, L, d = 1, 4, 2, 64, 32
    q = jnp.asarray(rng.standard_normal((B, Hq, L, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hkv, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hkv, L, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((B, Hq, L, d)), jnp.float32)

    def loss(impl):
        return lambda q, k, v: jnp.sum(
            flash_attention(q, k, v, causal=True, impl=impl) * do)

    gx = jax.grad(loss("xla"), (0, 1, 2))(q, k, v)
    gp = jax.grad(loss("pallas"), (0, 1, 2))(q, k, v)
    for a, b in zip(gx, gp):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_mqa_trains_under_tensor_parallel(rng):
    """MQA (Hkv=1) under a model-parallel context: the single KV head cannot
    shard over model_size>1, so attention must fall back to the
    GSPMD-partitioned graph — the train step runs and matches the unsharded
    loss (regression: the shard_map guard only checked query heads and
    crashed on the k/v specs)."""
    from tpu_flash import parallel

    model, params = _model(1)
    ids = jnp.asarray(rng.integers(0, 64, (4, 32)), jnp.int32)

    def loss_fn(params):
        logits = model(params, ids)
        return jnp.mean(logits.astype(jnp.float32) ** 2)

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params)

    ctx = parallel.make_mesh(data=2, model=2, devices=jax.devices()[:4])
    try:
        parallel.set_parallel_context(ctx)
        loss, grads = jax.value_and_grad(loss_fn)(params)
    finally:
        parallel.set_parallel_context(None)
    np.testing.assert_allclose(float(loss), float(ref_loss),
                               atol=1e-5, rtol=1e-5)
    a = jax.tree_util.tree_leaves(grads)[0]
    b = jax.tree_util.tree_leaves(ref_grads)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               atol=1e-4, rtol=1e-4)
