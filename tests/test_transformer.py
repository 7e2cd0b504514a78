"""Transformer parity tests — the analog of tests/test_modules_transformer.py:
MultiHeadAttention vs a torch.nn.MultiheadAttention oracle with copied
weights, path-equivalence between the flash / fused / naive attention
switches, and DecoderLM shape + gradient smoke tests."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpu_flash import nn


def cfg(**kw):
    base = dict(n_vocab=100, n_embd=64, n_head=4, n_positions=64, n_layer=2,
                p_dropout=0.0, attention_kind="naive")
    base.update(kw)
    return nn.DecoderConfig(**base)


def rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_mha_vs_torch(rng):
    c = cfg(causal=True)
    mha = nn.MultiHeadAttention(c)
    params = mha.init(jax.random.key(0))
    B, L, E = 2, 16, c.n_embd
    x = rng.standard_normal((B, L, E)).astype(np.float32)

    t = torch.nn.MultiheadAttention(E, c.n_head, bias=True, batch_first=True)
    qw = np.asarray(params["q_projection"]["weight"]).T
    kw = np.asarray(params["k_projection"]["weight"]).T
    vw = np.asarray(params["v_projection"]["weight"]).T
    qb = np.asarray(params["q_projection"]["bias"])
    kb = np.asarray(params["k_projection"]["bias"])
    vb = np.asarray(params["v_projection"]["bias"])
    with torch.no_grad():
        t.in_proj_weight.copy_(torch.from_numpy(np.concatenate([qw, kw, vw], 0)))
        t.in_proj_bias.copy_(torch.from_numpy(np.concatenate([qb, kb, vb], 0)))
        t.out_proj.weight.copy_(
            torch.from_numpy(np.asarray(params["out_projection"]["weight"]).T))
        t.out_proj.bias.copy_(
            torch.from_numpy(np.asarray(params["out_projection"]["bias"])))

    causal = torch.triu(torch.ones(L, L, dtype=torch.bool), 1)
    exp, _ = t(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
               attn_mask=causal, need_weights=False)
    got = mha(params, jnp.asarray(x))
    np.testing.assert_allclose(got, exp.detach().numpy(), atol=1e-5, rtol=1e-4)


@pytest.mark.parametrize("kind", ["flash", "fused"])
def test_attention_paths_agree(rng, kind):
    """flash/fused paths must match the naive composed graph
    (the reference's kernel_tests strategy at the module level)."""
    B, L = 2, 32
    x = rand(rng, (B, L, 64))
    naive = nn.MultiHeadAttention(cfg(attention_kind="naive", causal=True))
    other = nn.MultiHeadAttention(cfg(attention_kind=kind, causal=True))
    params = naive.init(jax.random.key(1))
    np.testing.assert_allclose(
        naive(params, x), other(params, x), atol=1e-3, rtol=1e-3)


def test_transformer_layer_vs_torch(rng):
    """Pre-LN layer vs torch TransformerEncoderLayer(norm_first=True) with
    gelu-tanh activation and copied weights (test_modules_transformer.py:123-207
    strategy). Torch's FF hidden dim equals our ff_middle_dim."""
    c = cfg(causal=True, ff_middle_dim=256, ln_eps=1e-5)
    layer = nn.TransformerLayer(c)
    params = layer.init(jax.random.key(3))
    B, L, E = 2, 12, c.n_embd
    x = rng.standard_normal((B, L, E)).astype(np.float32)

    t = torch.nn.TransformerEncoderLayer(
        E, c.n_head, dim_feedforward=256, dropout=0.0,
        activation=lambda y: torch.nn.functional.gelu(y, approximate="tanh"),
        batch_first=True, norm_first=True, layer_norm_eps=1e-5)
    ap = params["attention"]
    with torch.no_grad():
        t.self_attn.in_proj_weight.copy_(torch.from_numpy(np.concatenate([
            np.asarray(ap["q_projection"]["weight"]).T,
            np.asarray(ap["k_projection"]["weight"]).T,
            np.asarray(ap["v_projection"]["weight"]).T], 0)))
        t.self_attn.in_proj_bias.copy_(torch.from_numpy(np.concatenate([
            np.asarray(ap["q_projection"]["bias"]),
            np.asarray(ap["k_projection"]["bias"]),
            np.asarray(ap["v_projection"]["bias"])], 0)))
        t.self_attn.out_proj.weight.copy_(
            torch.from_numpy(np.asarray(ap["out_projection"]["weight"]).T))
        t.self_attn.out_proj.bias.copy_(
            torch.from_numpy(np.asarray(ap["out_projection"]["bias"])))
        t.linear1.weight.copy_(torch.from_numpy(
            np.asarray(params["ff"]["linear_in"]["weight"]).T))
        t.linear1.bias.copy_(torch.from_numpy(
            np.asarray(params["ff"]["linear_in"]["bias"])))
        t.linear2.weight.copy_(torch.from_numpy(
            np.asarray(params["ff"]["linear_out"]["weight"]).T))
        t.linear2.bias.copy_(torch.from_numpy(
            np.asarray(params["ff"]["linear_out"]["bias"])))
        t.norm1.weight.copy_(torch.from_numpy(np.asarray(params["ln_1"]["gamma"])))
        t.norm1.bias.copy_(torch.from_numpy(np.asarray(params["ln_1"]["beta"])))
        t.norm2.weight.copy_(torch.from_numpy(np.asarray(params["ln_2"]["gamma"])))
        t.norm2.bias.copy_(torch.from_numpy(np.asarray(params["ln_2"]["beta"])))

    causal = torch.triu(torch.ones(L, L, dtype=torch.bool), 1)
    exp = t(torch.from_numpy(x), src_mask=causal).detach().numpy()
    got = layer(params, jnp.asarray(x))
    np.testing.assert_allclose(got, exp, atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("kind", ["naive", "flash", "fused"])
def test_decoder_lm_shapes_and_grad(rng, kind):
    c = cfg(attention_kind=kind, use_fused_kernel=(kind == "fused"))
    model = nn.DecoderLM(c)
    params = model.init(jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, c.n_vocab, (2, 16)), jnp.int32)
    logits = model(params, ids)
    assert logits.shape == (2, 16, c.n_vocab)

    def loss(params):
        lg = model(params, ids)
        return jnp.mean(nn.functional.softmax_loss(lg[:, :-1], ids[:, 1:]))

    val, grads = jax.value_and_grad(loss)(params)
    assert np.isfinite(float(val))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for _, g in nn.named_parameters(grads))
    assert gnorm > 0


def test_decoder_paths_agree(rng):
    """Same params, all three attention paths: logits must match."""
    ids = jnp.asarray(rng.integers(0, 100, (2, 24)), jnp.int32)
    models = {}
    for kind in ["naive", "flash", "fused"]:
        models[kind] = nn.DecoderLM(cfg(attention_kind=kind))
    params = models["naive"].init(jax.random.key(7))
    outs = {k: m(params, ids) for k, m in models.items()}
    np.testing.assert_allclose(outs["naive"], outs["flash"], atol=2e-3, rtol=1e-3)
    np.testing.assert_allclose(outs["naive"], outs["fused"], atol=2e-3, rtol=1e-3)


def test_remat_matches(rng):
    ids = jnp.asarray(rng.integers(0, 100, (1, 16)), jnp.int32)
    m1 = nn.DecoderLM(cfg(attention_kind="naive"))
    m2 = nn.DecoderLM(cfg(attention_kind="naive", remat=True))
    params = m1.init(jax.random.key(0))
    np.testing.assert_allclose(m1(params, ids), m2(params, ids), atol=1e-5, rtol=1e-5)

    def loss(m):
        def f(params):
            return jnp.sum(m(params, ids) ** 2)
        return f
    g1 = jax.grad(loss(m1))(params)
    g2 = jax.grad(loss(m2))(params)
    for (n1, a), (n2, b) in zip(nn.named_parameters(g1), nn.named_parameters(g2)):
        np.testing.assert_allclose(a, b, atol=1e-4, rtol=1e-3, err_msg=n1)


def test_training_dropout_path(rng):
    c = cfg(p_dropout=0.5)
    model = nn.DecoderLM(c)
    params = model.init(jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, c.n_vocab, (2, 8)), jnp.int32)
    l1 = model(params, ids, key=jax.random.key(1), training=True)
    l2 = model(params, ids, key=jax.random.key(2), training=True)
    l3 = model(params, ids, training=False)
    assert not np.allclose(l1, l2)   # different dropout masks
    assert np.all(np.isfinite(np.asarray(l1)))
    np.testing.assert_array_equal(l3, model(params, ids, training=False))


def test_auto_attention_kind_matches_flash_and_naive(rng, monkeypatch):
    """'auto' dispatches by L*d but must be numerically equivalent to the
    explicit kinds on both sides of the threshold."""
    import jax.numpy as jnp
    from tpu_flash import nn
    from tpu_flash.nn import transformer as tr

    # Put the threshold between the two L values so both dispatch branches
    # (naive below, flash at/above) are exercised.
    monkeypatch.setattr(tr, "_FLASH_AUTO_MIN_L", 32)
    for L in (16, 32):
        cfg_auto = nn.DecoderConfig(
            n_vocab=64, n_embd=32, n_head=2, n_positions=64, n_layer=1,
            p_dropout=0.0, attention_kind="auto")
        cfg_naive = nn.DecoderConfig(
            n_vocab=64, n_embd=32, n_head=2, n_positions=64, n_layer=1,
            p_dropout=0.0, attention_kind="naive")
        m_auto, m_naive = nn.DecoderLM(cfg_auto), nn.DecoderLM(cfg_naive)
        params = m_auto.init(jax.random.key(0))
        ids = jnp.asarray(rng.integers(0, 64, (2, L)), jnp.int32)
        np.testing.assert_allclose(
            np.asarray(m_auto(params, ids)),
            np.asarray(m_naive(params, ids)), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_decoder_kv_quant_training(rng, mode):
    """DecoderConfig.kv_quant plumbs quantized-KV attention into the full
    model: forward close to the unquantized model (within quantization
    error), gradients flow to every parameter, and a train step reduces
    the loss (BASELINE measured config 4 training leg)."""
    base = cfg(attention_kind="flash", causal=True)
    qc = dataclasses.replace(base, kv_quant=mode)
    model, qmodel = nn.DecoderLM(base), nn.DecoderLM(qc)
    params = model.init(jax.random.key(0))
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 32)),
                      jnp.int32)
    out = model(params, ids)
    qout = qmodel(params, ids)
    rel = float(jnp.linalg.norm(qout - out) / jnp.linalg.norm(out))
    assert rel < 0.05, rel

    tgt = jnp.asarray(np.random.default_rng(1).integers(0, 100, (2, 32)),
                      jnp.int32)

    def loss_fn(p):
        return jnp.mean(nn.functional.softmax_loss(qmodel(p, ids), tgt))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaf)))
    # q-projection gradient must be nonzero (flows through the kernel)
    gq = grads["layers"]["0"]["attention"]["q_projection"]["weight"]
    assert float(jnp.max(jnp.abs(gq))) > 0.0

    opt = nn.adam(lr=1e-2)
    opt_state = opt.init(params)
    p2, _ = opt.update(grads, opt_state, params)
    assert float(loss_fn(p2)) < float(loss)


def test_kv_quant_rejects_dense_paths():
    with pytest.raises(ValueError, match="kv_quant requires the flash"):
        cfg(attention_kind="naive", kv_quant="int8")
    with pytest.raises(ValueError, match="kv_quant"):
        cfg(attention_kind="flash", kv_quant="int4")
