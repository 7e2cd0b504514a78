"""INT8 weight-only matmul kernel and quantized-model tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.kernels.quant import (
    QuantizedLinearWeights,
    int8_linear,
    int8_matmul,
    quantize_weight,
)


def rand(rng, shape, scale=1.0):
    return jnp.asarray(rng.standard_normal(shape) * scale, jnp.float32)


@pytest.mark.parametrize("M,K,N", [(8, 64, 128), (100, 256, 300), (1, 512, 512)])
def test_int8_matmul_matches_dequant(rng, M, K, N):
    x = rand(rng, (M, K))
    w = rand(rng, (K, N))
    codes, scales = quantize_weight(w)
    out = int8_matmul(x, codes, scales)
    dequant = codes.astype(jnp.float32) * scales
    expected = x @ dequant
    np.testing.assert_allclose(out, expected, atol=1e-2, rtol=1e-2)
    # and close to the unquantized matmul within int8 error
    rel = float(jnp.linalg.norm(out - x @ w) / jnp.linalg.norm(x @ w))
    assert rel < 0.02, rel


def test_quantize_weight_roundtrip(rng):
    w = rand(rng, (64, 32), scale=3.0)
    codes, scales = quantize_weight(w)
    assert codes.dtype == jnp.int8
    w2 = codes.astype(jnp.float32) * scales
    assert float(jnp.max(jnp.abs(w - w2))) < float(jnp.max(jnp.abs(w))) / 100


def test_int8_linear_grad_flows(rng):
    x = rand(rng, (4, 6, 32))
    w = rand(rng, (32, 16))
    b = rand(rng, (16,))
    codes, scales = quantize_weight(w)
    qw = QuantizedLinearWeights(codes, scales, b)

    def f(x):
        return jnp.sum(int8_linear(x, qw) ** 2)

    g = jax.grad(f)(x)
    # compare against autodiff through the dequantized dense graph
    dequant = codes.astype(jnp.float32) * scales

    def f_ref(x):
        return jnp.sum((x @ dequant + b) ** 2)

    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(g, g_ref, atol=1e-2, rtol=1e-2)


def test_quantized_decoder_close_to_fp(rng):
    cfg = nn.DecoderConfig(n_vocab=100, n_embd=64, n_head=4, n_positions=32,
                           n_layer=2, p_dropout=0.0, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    qparams = nn.quantize_model_linears(params)
    # embeddings/LN untouched, projections quantized
    assert "codes" in qparams["layers"]["0"]["attention"]["q_projection"]
    assert "weight" in qparams["token_embeddings"]
    assert "gamma" in qparams["ln"]

    ids = jnp.asarray(rng.integers(0, 100, (2, 16)), jnp.int32)
    fp = model(params, ids)
    q8 = model(qparams, ids)
    # logits drift bounded by int8 error accumulation
    rel = float(jnp.linalg.norm(q8 - fp) / jnp.linalg.norm(fp))
    assert rel < 0.05, rel
    # argmax predictions mostly agree
    agree = float(jnp.mean((jnp.argmax(fp, -1) == jnp.argmax(q8, -1))
                           .astype(jnp.float32)))
    assert agree > 0.9, agree


def test_quantized_generate(rng):
    from tpu_flash.inference import SamplingConfig, generate

    cfg = nn.DecoderConfig(n_vocab=64, n_embd=32, n_head=4, n_positions=64,
                           n_layer=2, p_dropout=0.0, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    qparams = nn.quantize_model_linears(params)
    prompts = jnp.asarray([[3, 4, 5]], jnp.int32)
    toks, _ = generate(model, qparams, prompts, jnp.asarray([3]),
                       SamplingConfig(max_new_tokens=4), max_len=16,
                       pad_id=0, kv_quant="int8")
    assert toks.shape == (1, 4)
    assert np.all(np.asarray(toks) >= 0)
