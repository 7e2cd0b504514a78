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


@pytest.mark.parametrize("M,K,N", [(8, 64, 128), (100, 255, 300),
                                   (1, 512, 512)])
def test_int4_matmul_matches_dequant(rng, M, K, N):
    from tpu_flash.kernels.quant import (int4_matmul, quantize_weight_int4,
                                         unpack_int4)

    x = rand(rng, (M, K))
    w = rand(rng, (K, N))
    packed, scales, k_dim = quantize_weight_int4(w)
    assert packed.dtype == jnp.uint8 and k_dim == K
    out = int4_matmul(x, packed, scales, k_dim=K)
    dequant = unpack_int4(packed, K).astype(jnp.float32) * scales
    expected = x @ dequant
    np.testing.assert_allclose(out, expected, atol=1e-2, rtol=1e-2)
    # within int4 error of the unquantized matmul: per-channel symmetric
    # int4 on N(0,1) weights has elementwise error std ~= (amax/7)/sqrt(12)
    # ~= 0.11 of the weight std -> matmul rel error ~0.11-0.14 at these
    # sizes (this is inherent to 4-bit, not a kernel defect; group-wise
    # scales would shrink it)
    rel = float(jnp.linalg.norm(out - x @ w) / jnp.linalg.norm(x @ w))
    assert rel < 0.2, rel


def test_int4_linear_grad_flows(rng):
    from tpu_flash.kernels.quant import (QuantizedLinearWeights4,
                                         int4_linear, quantize_weight_int4,
                                         unpack_int4)

    x = rand(rng, (4, 6, 64))
    w = rand(rng, (64, 96))
    b = rand(rng, (96,))
    packed, scales, k_dim = quantize_weight_int4(w)
    qw = QuantizedLinearWeights4(packed, scales, k_dim, b)
    dequant = unpack_int4(packed, k_dim).astype(jnp.float32) * scales

    def f(x):
        return jnp.sum(int4_linear(x, qw) ** 2)

    def f_ref(x):
        return jnp.sum((x @ dequant + b) ** 2)

    np.testing.assert_allclose(float(f(x)), float(f_ref(x)), rtol=1e-4)
    g = jax.grad(f)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-2, rtol=2e-2)


@pytest.mark.parametrize("g", [64, 128])
def test_int4_matmul_groupwise(rng, g):
    """Group-wise scales: exact vs the group-dequantized oracle, and
    measurably tighter than per-channel int4 against the fp32 matmul."""
    from tpu_flash.kernels.quant import (int4_matmul, quantize_weight_int4,
                                         unpack_int4)

    M, K, N = 16, 512, 256
    x = rand(rng, (M, K))
    w = rand(rng, (K, N))
    packed, scales, k_dim = quantize_weight_int4(
        w, group_size=g, allow_small_groups=True)
    assert scales.shape == (K // g, N)
    out = int4_matmul(x, packed, scales, k_dim=K)
    dequant = unpack_int4(packed, K).astype(jnp.float32) * jnp.repeat(
        scales, g, axis=0)
    expected = x @ dequant
    np.testing.assert_allclose(out, expected, atol=1e-2, rtol=1e-2)

    pc_packed, pc_scales, _ = quantize_weight_int4(w)
    pc_out = int4_matmul(x, pc_packed, pc_scales, k_dim=K)
    ref = x @ w
    rel_g = float(jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref))
    rel_pc = float(jnp.linalg.norm(pc_out - ref) / jnp.linalg.norm(ref))
    assert rel_g < rel_pc, (rel_g, rel_pc)


def test_int4_linear_groupwise_grad(rng):
    from tpu_flash.kernels.quant import (QuantizedLinearWeights4,
                                         int4_linear, quantize_weight_int4,
                                         unpack_int4)

    x = rand(rng, (4, 128))
    w = rand(rng, (128, 96))
    packed, scales, k_dim = quantize_weight_int4(
        w, group_size=32, allow_small_groups=True)
    qw = QuantizedLinearWeights4(packed, scales, k_dim)
    dequant = unpack_int4(packed, k_dim).astype(jnp.float32) * jnp.repeat(
        scales, 32, axis=0)

    def f(x):
        return jnp.sum(int4_linear(x, qw) ** 2)

    def f_ref(x):
        return jnp.sum((x @ dequant) ** 2)

    np.testing.assert_allclose(float(f(x)), float(f_ref(x)), rtol=1e-4)
    g = jax.grad(f)(x)
    g_ref = jax.grad(f_ref)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               atol=2e-2, rtol=2e-2)


def test_quantized_decoder_int4(rng):
    cfg = nn.DecoderConfig(n_vocab=100, n_embd=64, n_head=4, n_positions=32,
                           n_layer=2, p_dropout=0.0, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    qparams = nn.quantize_model_linears(params, bits=4, group_size=16,
                                        allow_small_groups=True)
    assert "codes4" in qparams["layers"]["0"]["attention"]["q_projection"]
    assert "weight" in qparams["token_embeddings"]

    ids = jnp.asarray(rng.integers(0, 100, (2, 16)), jnp.int32)
    fp = model(params, ids)
    q4 = model(qparams, ids)
    rel = float(jnp.linalg.norm(q4 - fp) / jnp.linalg.norm(fp))
    assert rel < 0.15, rel
    agree = float(jnp.mean((jnp.argmax(fp, -1) == jnp.argmax(q4, -1))
                           .astype(jnp.float32)))
    assert agree > 0.7, agree


def test_fp8_bit_reconstruction_maps_nan_codes():
    """e4m3fn NaN codes (em == 0x7F) must decode to bf16 NaN, not +/-448
    (ADVICE round 2: a NaN slipping into a quantized cache must surface)."""
    from tpu_flash.kernels.common import fp8_e4m3_to_bf16

    codes = jnp.asarray(
        np.array([0x7F, 0xFF, 0x00, 0x80, 0x3C, 0xBC], np.uint8).view(
            np.dtype(jnp.float8_e4m3fn)))
    out = fp8_e4m3_to_bf16(codes)
    exact = codes.astype(jnp.bfloat16)
    assert bool(jnp.isnan(out[0])) and bool(jnp.isnan(out[1]))
    np.testing.assert_array_equal(
        np.asarray(out[2:], np.float32), np.asarray(exact[2:], np.float32))


def test_fast_exp_rejected_for_fp32():
    """Explicit fast_exp=True with fp32 inputs must raise (exact-parity
    mode must never silently degrade its softmax tail to bf16)."""
    from tpu_flash.kernels.flash_attention import (
        flash_attention_backward,
        flash_attention_forward,
    )

    q = jnp.zeros((1, 1, 128, 64), jnp.float32)
    with pytest.raises(ValueError, match="fast_exp"):
        flash_attention_forward(q, q, q, causal=True, fast_exp=True)
    o = jnp.zeros_like(q)
    lse = jnp.zeros((1, 1, 128), jnp.float32)
    with pytest.raises(ValueError, match="fast_exp"):
        flash_attention_backward(q, q, q, o, lse, o, causal=True,
                                 fast_exp=True)


@pytest.mark.parametrize("mode", ["int8", "fp8", "int8_channel",
                                  "fp8_channel"])
def test_kv_quant_auto_below_crossover_matches_kernel(mode):
    """attention_kind="auto" with kv_quant at L below the flash crossover
    takes the dense XLA path on straight-through dequantized K/V — the
    same quantization math as the kernel path, so the two forms must
    agree within kernel tolerance (and gradients must flow)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_flash import nn

    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, (2, 48)), jnp.int32)

    outs = {}
    for kind in ("auto", "flash"):
        cfg = nn.DecoderConfig(
            n_vocab=64, n_embd=64, n_head=4, n_positions=48, n_layer=2,
            p_dropout=0.0, attention_kind=kind, kv_quant=mode)
        model = nn.DecoderLM(cfg)
        params = model.init(jax.random.key(0))

        def loss(params):
            return jnp.mean(model(params, ids).astype(jnp.float32) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        assert jnp.isfinite(val)
        gnorm = sum(float(jnp.sum(jnp.abs(g.astype(jnp.float32))))
                    for g in jax.tree_util.tree_leaves(grads))
        assert np.isfinite(gnorm) and gnorm > 0
        outs[kind] = float(val)
    assert abs(outs["auto"] - outs["flash"]) < 2e-2 * max(
        1.0, abs(outs["flash"])), outs
