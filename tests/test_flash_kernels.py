"""Pallas flash-attention kernel parity vs the tiled jnp oracles and stock
jax.grad, at the reference's tolerances (fw 1e-3, bw 1e-2/1e-3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_forward,
)
from tpu_flash.ops import flash_attention, flash_attention_with_residuals
from tpu_flash.ops import reference as ref

FW_TOL = dict(atol=1e-3, rtol=1e-3)
BW_TOL = dict(atol=1e-2, rtol=1e-3)

# (B, H, L, d): exercise L < block, L == block, L > block, non-multiple L
SHAPES = [
    (1, 2, 64, 32),
    (2, 2, 128, 64),
    (1, 2, 256, 64),
    (1, 1, 200, 64),   # padding path
]


def make(rng, shape, dtype=jnp.float32):
    return (jnp.asarray(rng.standard_normal(shape), dtype) for _ in range(3))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("causal", [False, True])
def test_forward_parity(rng, shape, causal):
    q, k, v = make(rng, shape)
    out, lse, m = flash_attention_forward(q, k, v, causal=causal,
                                          with_m=True)
    expected = ref.naive_attention(q, k, v, causal=causal)
    np.testing.assert_allclose(out, expected, **FW_TOL)

    scale = ref.default_scale(shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        s = s + ref.causal_mask(shape[2], shape[2])
    np.testing.assert_allclose(lse, jax.nn.logsumexp(s, axis=-1), **FW_TOL)
    np.testing.assert_allclose(m, jnp.max(s, axis=-1), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("causal", [False, True])
def test_backward_parity(rng, shape, causal):
    q, k, v = make(rng, shape)
    do = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    out, lse, _ = flash_attention_forward(q, k, v, causal=causal)
    dq, dk, dv = flash_attention_backward(q, k, v, out, lse, do, causal=causal)

    def loss(q, k, v):
        return jnp.sum(ref.naive_attention(q, k, v, causal=causal) * do)

    dq_e, dk_e, dv_e = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(dq, dq_e, **BW_TOL)
    np.testing.assert_allclose(dk, dk_e, **BW_TOL)
    np.testing.assert_allclose(dv, dv_e, **BW_TOL)


@pytest.mark.parametrize("causal", [False, True])
def test_custom_vjp_end_to_end(rng, causal):
    shape = (1, 2, 128, 64)
    q, k, v = make(rng, shape)
    do = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def f(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal, impl="pallas") * do)

    def f_ref(q, k, v):
        return jnp.sum(ref.naive_attention(q, k, v, causal=causal) * do)

    out = flash_attention(q, k, v, causal=causal, impl="pallas")
    np.testing.assert_allclose(out, ref.naive_attention(q, k, v, causal=causal), **FW_TOL)

    g = jax.grad(f, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, g_ref):
        np.testing.assert_allclose(a, b, **BW_TOL)


def test_fa1_residuals(rng):
    """version=1 returns (out, l, m) exactly like launch_flash_attn_fw."""
    shape = (1, 2, 64, 32)
    q, k, v = make(rng, shape)
    out, l, m = flash_attention_with_residuals(q, k, v, version=1, impl="pallas")
    out_o, l_o, m_o = ref.flash_attention1_fw_reference(q, k, v)
    np.testing.assert_allclose(out, out_o, **FW_TOL)
    np.testing.assert_allclose(m, m_o, atol=1e-4, rtol=1e-4)
    np.testing.assert_allclose(l, l_o, atol=1e-3, rtol=1e-3)


def test_bf16_inputs(rng):
    shape = (1, 2, 128, 64)
    q, k, v = (x.astype(jnp.bfloat16) for x in make(rng, shape))
    out, _, _ = flash_attention_forward(q, k, v, causal=True)
    assert out.dtype == jnp.bfloat16
    expected = ref.naive_attention(
        q.astype(jnp.float32), k.astype(jnp.float32), v.astype(jnp.float32),
        causal=True)
    np.testing.assert_allclose(
        out.astype(jnp.float32), expected, atol=2e-2, rtol=2e-2)


def test_jit_and_grad_composable(rng):
    shape = (1, 2, 64, 64)
    q, k, v = make(rng, shape)

    @jax.jit
    def step(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) ** 2)

    val, grads = jax.value_and_grad(step)(q, k, v)
    assert jnp.isfinite(val)


def test_backward_two_pass_fallback_matches_fused(rng, monkeypatch):
    """Sequences whose dQ scratch would overflow VMEM fall back to the
    two-pass backward; both paths must agree exactly on the same inputs."""
    import jax.numpy as jnp
    from tpu_flash.kernels import flash_attention as fa

    B, H, L, d = 1, 2, 256, 32
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.float32) for _ in range(4))
    out, lse, _ = fa.flash_attention_forward(q, k, v, causal=True,
                                             block_q=128, block_k=128)
    # the public wrapper is jitted and would serve the cached fused
    # executable regardless of the budget global: use the unjitted fn
    raw = fa.flash_attention_backward.__wrapped__
    fused = raw(q, k, v, out, lse, do, causal=True, block_q=128,
                block_k=128, interpret=True)
    monkeypatch.setattr(fa, "_FUSED_VMEM_CAP_BF16", 1)   # force two-pass
    monkeypatch.setattr(fa, "_FUSED_VMEM_CAP_FP32", 1)
    twopass = raw(q, k, v, out, lse, do, causal=True, block_q=128,
                  block_k=128, interpret=True)
    for a, b in zip(fused, twopass):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_empty_rows_convention_lq_gt_lk(rng):
    """Causal attention with Lq > Lk: query rows before the first key have
    no visible keys.  Convention: out = 0, lse = -inf, zero gradients —
    identical whether the row falls in a dead tile or a live one (tile
    alignment must not change semantics)."""
    import jax.numpy as jnp
    from tpu_flash.kernels.flash_attention import (
        flash_attention_backward, flash_attention_forward)

    B, H, d = 1, 2, 16
    Lq, Lk = 130, 70          # offset = -60: rows 0..59 see nothing
    q = jnp.asarray(rng.standard_normal((B, H, Lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, Lk, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, Lk, d)), jnp.float32)
    do = jnp.asarray(rng.standard_normal((B, H, Lq, d)), jnp.float32)

    outs = {}
    for bq, bk in ((128, 128), (64, 64)):   # different tile alignments
        out, lse, m = flash_attention_forward(
            q, k, v, causal=True, block_q=bq, block_k=bk, with_m=True)
        np.testing.assert_array_equal(np.asarray(out[:, :, :60]), 0.0)
        assert bool(jnp.all(jnp.isneginf(lse[:, :, :60])))
        assert bool(jnp.all(jnp.isfinite(lse[:, :, 60:])))
        dq, dk, dv = flash_attention_backward(
            q, k, v, out, lse, do, causal=True, block_q=bq, block_k=bk)
        assert bool(jnp.isfinite(dq).all())
        np.testing.assert_array_equal(np.asarray(dq[:, :, :60]), 0.0)
        assert bool(jnp.isfinite(dk).all() and jnp.isfinite(dv).all())
        outs[(bq, bk)] = (np.asarray(out), np.asarray(dq), np.asarray(dk))
    for a, b in zip(outs[(128, 128)], outs[(64, 64)]):
        np.testing.assert_allclose(a, b, atol=1e-5, rtol=1e-5)


def test_int8_kv_attention_fwd_bwd(rng):
    """Quantized-KV flash attention (int8 codes + per-position scales through
    both fw and bw) matches the fp path within int8 quantization error, and
    its saved residuals really are int8."""
    import jax.numpy as jnp
    from tpu_flash.ops.attention import (
        _flash_attention_quantkv_fwd, _quantize_kv, flash_attention)

    B, H, L, d = 1, 2, 128, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    w = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)

    out_q = flash_attention(q, k, v, causal=True, kv_quant="int8",
                            impl="pallas")
    # oracle: same attention on the explicitly dequantized k/v
    kc, ks = _quantize_kv(k)
    vc, vs = _quantize_kv(v)
    k_dq = kc.astype(jnp.float32) * ks[..., None]
    v_dq = vc.astype(jnp.float32) * vs[..., None]
    ref = flash_attention(q, k_dq, v_dq, causal=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
    # vs the unquantized path: only int8 noise apart
    full = flash_attention(q, k, v, causal=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(full),
                               atol=5e-2, rtol=5e-2)

    # residuals are int8 codes, not fp tensors
    _, res = _flash_attention_quantkv_fwd(q, k, v, 0, None, True, 0.0,
                                         "int8", None)
    assert res[1].dtype == jnp.int8 and res[3].dtype == jnp.int8

    # gradients: quantized path == fp path on the dequantized k/v (for q),
    # straight-through for k/v (within quantization noise of fp grads)
    gq = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True, kv_quant="int8",
                        impl="pallas") * w), (0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True, impl="pallas") * w),
        (0, 1, 2))(q, k_dq, v_dq)
    for a, b in zip(gq, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


def test_fp8_kv_attention_fwd_bwd(rng):
    """fp8(e4m3) training KV: matches attention on explicitly dequantized
    k/v exactly, tracks the fp path within fp8 noise, residuals are fp8."""
    import jax.numpy as jnp
    from tpu_flash.ops.attention import (
        _flash_attention_quantkv_fwd, _quantize_kv, flash_attention)

    B, H, L, d = 1, 2, 128, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    w = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)

    out_q = flash_attention(q, k, v, causal=True, kv_quant="fp8",
                            impl="pallas")
    kc, ks = _quantize_kv(k, "fp8")
    vc, vs = _quantize_kv(v, "fp8")
    assert kc.dtype == jnp.float8_e4m3fn
    k_dq = kc.astype(jnp.float32) * ks[..., None]
    v_dq = vc.astype(jnp.float32) * vs[..., None]
    ref = flash_attention(q, k_dq, v_dq, causal=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)
    full = flash_attention(q, k, v, causal=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(full),
                               atol=0.12, rtol=0.12)

    _, res = _flash_attention_quantkv_fwd(q, k, v, 0, None, True, 0.0,
                                         "fp8", None)
    assert res[1].dtype == jnp.float8_e4m3fn
    assert res[3].dtype == jnp.float8_e4m3fn

    gq = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True, kv_quant="fp8",
                        impl="pallas") * w), (0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True, impl="pallas") * w),
        (0, 1, 2))(q, k_dq, v_dq)
    for a, b in zip(gq, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-3)


@pytest.mark.parametrize("mode", ["int8_channel", "fp8_channel"])
def test_channel_kv_attention_fwd_bwd(rng, mode):
    """Per-CHANNEL KV scales (the scale-free "free dequant" kernel form,
    VERDICT r4 #1): the public kv_quant path must match flash attention on
    the explicitly channel-dequantized K/V — forward, dq, dk, dv — and the
    saved residuals must be codes with [B, H, d] scales."""
    import jax.numpy as jnp
    from tpu_flash.ops.attention import (
        _flash_attention_quantkv_fwd, _quantize_kv, dequantize_kv,
        flash_attention)

    B, H, L, d = 1, 2, 192, 32      # unaligned L exercises padded tiles
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    w = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)

    kc, ks = _quantize_kv(k, mode)
    vc, vs = _quantize_kv(v, mode)
    assert ks.shape == (B, H, d) and vs.shape == (B, H, d)
    k_dq = dequantize_kv(kc, ks, mode).astype(jnp.float32)
    v_dq = dequantize_kv(vc, vs, mode).astype(jnp.float32)

    out_q = flash_attention(q, k, v, causal=True, kv_quant=mode,
                            impl="pallas")
    ref = flash_attention(q, k_dq, v_dq, causal=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    # within quantization noise of the unquantized path (channel scales
    # are coarser than token scales: looser band than the token test)
    full = flash_attention(q, k, v, causal=True, impl="pallas")
    np.testing.assert_allclose(np.asarray(out_q), np.asarray(full),
                               atol=0.15, rtol=0.15)

    _, res = _flash_attention_quantkv_fwd(q, k, v, 0, None, True, 0.0,
                                          mode, None)
    want = jnp.int8 if mode.startswith("int8") else jnp.float8_e4m3fn
    assert res[1].dtype == want and res[3].dtype == want
    assert res[2].shape == (B, H, d)    # channel scales ride the residuals

    gq = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True, kv_quant=mode,
                        impl="pallas") * w), (0, 1, 2))(q, k, v)
    gr = jax.grad(lambda q, k, v: jnp.sum(
        flash_attention(q, k, v, causal=True, impl="pallas") * w),
        (0, 1, 2))(q, k_dq, v_dq)
    for a, b in zip(gq, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4, rtol=1e-3)


@pytest.mark.parametrize("variant", ["dropout", "gqa", "bf16", "window",
                                     "wq", "twopass", "segments"])
def test_channel_kv_variants(rng, variant, monkeypatch):
    """The channel-scale form through every backward path: fused qw
    (default), explicit wq score space, the two-pass fallback, dropout's
    regenerated mask, native GQA, and bf16 inputs — each pinned against
    flash attention on the channel-dequantized K/V with identical
    arguments (the dropout hash masks are bit-identical by construction,
    so the oracle sees the same kept entries)."""
    import jax.numpy as jnp
    from tpu_flash.kernels import flash_attention as fa
    from tpu_flash.ops.attention import _quantize_kv, dequantize_kv

    B, H, L, d = 1, 4, 256, 32
    Hkv = 2 if variant == "gqa" else H
    dtype = jnp.bfloat16 if variant == "bf16" else jnp.float32
    q, do = (jnp.asarray(rng.standard_normal((B, H, L, d)), dtype)
             for _ in range(2))
    k, v = (jnp.asarray(rng.standard_normal((B, Hkv, L, d)), dtype)
            for _ in range(2))
    drop = 0.25 if variant == "dropout" else 0.0
    window = 96 if variant == "window" else None
    score_layout = "wq" if variant == "wq" else None
    seg = None
    if variant == "segments":
        # two packed sequences per row (the --pack training form)
        seg = jnp.asarray(
            np.repeat([[0, 1]], B, 0).repeat(L // 2, 1), jnp.int32)

    kc, ks = _quantize_kv(k, "int8_channel")
    vc, vs = _quantize_kv(v, "int8_channel")
    k_dq = dequantize_kv(kc, ks, "int8_channel").astype(dtype)
    v_dq = dequantize_kv(vc, vs, "int8_channel").astype(dtype)
    kcT, vcT = kc.transpose(0, 1, 3, 2), vc.transpose(0, 1, 3, 2)

    kw = dict(causal=True, dropout_rate=drop, dropout_seed=7, window=window,
              segment_ids=seg)
    out_q, lse_q, _ = fa.flash_attention_forward(
        q, kcT, vcT, ks, vs, kv_layout="dl", kv_scale_mode="channel", **kw)
    out_r, lse_r, _ = fa.flash_attention_forward(q, k_dq, v_dq, **kw)
    tol = dict(atol=2e-2, rtol=2e-2) if dtype == jnp.bfloat16 \
        else dict(atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_q, np.float32),
                               np.asarray(out_r, np.float32), **tol)
    # bf16: the kernel folds ks into q THEN rounds to bf16, the oracle
    # rounds the dequantized k — lse differs at bf16 score precision
    lse_tol = dict(atol=2e-2, rtol=2e-2) if dtype == jnp.bfloat16 \
        else dict(atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lse_q), np.asarray(lse_r),
                               **lse_tol)

    raw = fa.flash_attention_backward.__wrapped__
    if variant == "twopass":
        monkeypatch.setattr(fa, "_FUSED_VMEM_CAP_BF16", 1)
        monkeypatch.setattr(fa, "_FUSED_VMEM_CAP_FP32", 1)
    grads_q = raw(q, kcT, vcT, out_q, lse_q, do, None, ks, vs,
                  kv_layout="dl", kv_scale_mode="channel",
                  score_layout=score_layout, interpret=True, **kw)
    grads_r = raw(q, k_dq, v_dq, out_r, lse_r, do, None, None, None,
                  score_layout=score_layout, interpret=True, **kw)
    gtol = dict(atol=5e-2, rtol=5e-2) if dtype == jnp.bfloat16 \
        else dict(atol=2e-4, rtol=1e-3)
    for a, b in zip(grads_q, grads_r):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32), **gtol)


def test_q_offset_override_matches_shifted_causal(rng):
    """q_offset=k (static override) must equal attention where query row r
    attends keys <= r + k — the banded form windowed ring chunks use."""
    from tpu_flash.kernels.flash_attention import (
        flash_attention_backward, flash_attention_forward)
    B, H, L, d, off = 1, 2, 128, 32, 64
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.float32) for _ in range(4))

    def oracle(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / d ** 0.5
        rows = jnp.arange(L)[:, None] + off
        cols = jnp.arange(L)[None, :]
        s = jnp.where(cols <= rows, s, -1e7)
        return jax.nn.softmax(s, -1) @ v

    with jax.default_matmul_precision("highest"):
        out, lse, _ = flash_attention_forward(
            q, k, v, causal=True, q_offset=off, block_q=64, block_k=64)
        ref = oracle(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        gr = jax.grad(lambda *a: jnp.sum(oracle(*a) * do), (0, 1, 2))(q, k, v)
        gf = flash_attention_backward(
            q, k, v, out, lse, do, causal=True, q_offset=off,
            block_q=64, block_k=64)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    # with a window on top: band (r + off - w, r + off]
    w = 96
    with jax.default_matmul_precision("highest"):
        out2, _, _ = flash_attention_forward(
            q, k, v, causal=True, q_offset=off, window=w,
            block_q=64, block_k=64)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / d ** 0.5
        rows = jnp.arange(L)[:, None] + off
        cols = jnp.arange(L)[None, :]
        keep = (cols <= rows) & (cols > rows - w)
        s = jnp.where(keep, s, -1e7)
        ref2 = jax.nn.softmax(s, -1) @ v
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                   atol=2e-5, rtol=2e-5)


def test_kv_layout_dl_matches_ld(rng):
    """Pre-transposed d-major quantized codes (kv_layout='dl', the training
    custom-vjp path) must match the default 'ld' entry bit for bit."""
    from tpu_flash.kernels.flash_attention import (
        flash_attention_backward, flash_attention_forward)
    from tpu_flash.ops.attention import _quantize_kv
    B, H, L, d = 1, 2, 192, 64
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.float32) for _ in range(4))
    kc, ks = _quantize_kv(k, "int8")
    vc, vs = _quantize_kv(v, "int8")
    o1, lse1, _ = flash_attention_forward(q, kc, vc, ks, vs, causal=True)
    o2, lse2, _ = flash_attention_forward(
        q, kc.transpose(0, 1, 3, 2), vc.transpose(0, 1, 3, 2), ks, vs,
        causal=True, kv_layout="dl")
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))
    np.testing.assert_array_equal(np.asarray(lse1), np.asarray(lse2))
    g1 = flash_attention_backward(q, kc, vc, o1, lse1, do, None, ks, vs,
                                  causal=True)
    g2 = flash_attention_backward(
        q, kc.transpose(0, 1, 3, 2), vc.transpose(0, 1, 3, 2), o2, lse2,
        do, None, ks, vs, causal=True, kv_layout="dl")
    for a, b in zip(g1, g2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("q_pack", [1, 2, 4])
@pytest.mark.parametrize("shape", [(1, 2, 512, 64), (1, 1, 456, 32)])
def test_backward_q_pack_parity(rng, shape, q_pack):
    """The packed fused backward (q_pack sub-tiles per grid step,
    _packed_kv_schedule) must match the jax.grad oracle at every pack,
    including the padded-group path (456 rounds up to the group size)."""
    q, k, v = make(rng, shape)
    do = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    out, lse, _ = flash_attention_forward(q, k, v, causal=True,
                                          block_q=64, block_k=128)
    dq, dk, dv = flash_attention_backward(
        q, k, v, out, lse, do, causal=True, block_q=64, block_k=128,
        q_pack=q_pack)

    def loss(q, k, v):
        return jnp.sum(ref.naive_attention(q, k, v, causal=True) * do)

    dq_e, dk_e, dv_e = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(dq, dq_e, **BW_TOL)
    np.testing.assert_allclose(dk, dk_e, **BW_TOL)
    np.testing.assert_allclose(dv, dv_e, **BW_TOL)


def test_backward_two_pass_packed_matches_fused(rng, monkeypatch):
    """The packed dK/dV pass (q_pack groups, _packed_kv_schedule) of the
    two-pass fallback must agree with the fused form at a shape with
    several groups per KV tile."""
    import jax.numpy as jnp
    from tpu_flash.kernels import flash_attention as fa

    B, H, L, d = 1, 2, 512, 32
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.float32) for _ in range(4))
    out, lse, _ = fa.flash_attention_forward(q, k, v, causal=True,
                                             block_q=128, block_k=128)
    raw = fa.flash_attention_backward.__wrapped__
    fused = raw(q, k, v, out, lse, do, causal=True, block_q=64,
                block_k=128, interpret=True)
    # force the two-pass form while leaving the dkv pack selector its real
    # VMEM cap (so it actually picks a q_pack > 1 at this shape)
    monkeypatch.setattr(fa, "select_bwd_fused_config",
                        lambda *a, **k: (False, 64, 1, 128, 512, False))
    twopass = raw(q, k, v, out, lse, do, causal=True, block_q=64,
                  block_k=128, interpret=True)
    for a, b in zip(fused, twopass):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


def test_backward_dq_hbm_output_matches(rng, monkeypatch):
    """The HBM dQ-output mode (pl.ANY output + staged manual DMA — the
    L>=16k fused unlock) must produce identical gradients to the
    pipelined-output mode."""
    import jax.numpy as jnp
    from tpu_flash.kernels import flash_attention as fa

    B, H, L, d = 1, 2, 512, 32
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.float32) for _ in range(4))
    out, lse, _ = fa.flash_attention_forward(q, k, v, causal=True,
                                             block_q=128, block_k=128)
    raw = fa.flash_attention_backward.__wrapped__
    base = raw(q, k, v, out, lse, do, causal=True, block_q=128,
               block_k=128, q_pack=2, interpret=True)
    monkeypatch.setattr(
        fa, "select_bwd_fused_config",
        lambda *a, **k: (True, 128, 2, 128, 512, True))
    hbm = raw(q, k, v, out, lse, do, causal=True, block_q=128,
              block_k=128, q_pack=2, interpret=True)
    for a, b in zip(hbm, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("L", [64, 200, 1024, 2048, 8192, 16384, 65536])
def test_bwd_selector_invariants(L):
    """Auto-selected backward configs must be internally consistent:
    pLq a multiple of the group, block_k a power-of-two divisor of the
    padded KV extent, pack within the sequence."""
    from tpu_flash.kernels.flash_attention import (
        select_bwd_dkv_config, select_bwd_fused_config)

    for itemsize in (2, 4):
        fused, bq, pack, bk, pLq, hbm = select_bwd_fused_config(
            L, L, 64, block_q=None, block_k=min(2048, L), causal=True,
            q_offset=0, itemsize=itemsize)
        assert pLq % (bq * pack) == 0
        assert pLq >= L
        assert bq * pack <= pLq
        req = min(2048, L)
        if fused:
            # selected KV tile: the requested tile or a repeated halving
            # of it (so it always divides the request), never wider, and
            # the padded KV extent covers the sequence
            assert 0 < bk <= req and req % bk == 0
            assert (-(-L // bk)) * bk >= L
        pack2, bk2, pLq2 = select_bwd_dkv_config(
            L, L, 64, block_q=bq, block_k=req, causal=True,
            q_offset=0, itemsize=itemsize)
        assert pLq2 % (bq * pack2) == 0
        # dkv bk: the requested tile or a halving of it, and it must
        # divide the dq pass's wide-tile KV padding
        assert 0 < bk2 <= req and req % bk2 == 0
        assert (-(-L // req)) * req % bk2 == 0


@pytest.mark.parametrize("variant", ["plain", "dropout", "window",
                                     "segments", "offset"])
def test_backward_wq_score_layout_matches(rng, variant):
    """The transposed [w, bq] score space (score_layout="wq") must produce
    identical gradients to the default layout in every masking variant
    (dropout masks are bit-identical by construction: same (row, col)
    hash)."""
    import jax.numpy as jnp
    from tpu_flash.kernels.flash_attention import (
        flash_attention_backward, flash_attention_forward)

    B, H, L, d = 1, 2, 512, 32
    Lq = 384 if variant == "offset" else L
    q = jnp.asarray(rng.standard_normal((B, H, Lq, d)), jnp.float32)
    k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
            for _ in range(2))
    do = jnp.asarray(rng.standard_normal((B, H, Lq, d)), jnp.float32)
    kw = {}
    if variant == "dropout":
        kw = dict(dropout_rate=0.2, dropout_seed=7)
    elif variant == "window":
        kw = dict(window=130)
    elif variant == "segments":
        seg = jnp.asarray(
            np.sort(rng.integers(0, 3, (B, L)), axis=-1), jnp.int32)
        kw = dict(segment_ids=seg)
    out, lse, _ = flash_attention_forward(
        q, k, v, causal=True, block_q=64, block_k=128,
        **{k_: v_ for k_, v_ in kw.items() if k_ != "window"},
        **({"window": 130} if variant == "window" else {}))
    base = flash_attention_backward(
        q, k, v, out, lse, do, causal=True, block_q=64, block_k=128,
        q_pack=2, **kw)
    wq = flash_attention_backward(
        q, k, v, out, lse, do, causal=True, block_q=64, block_k=128,
        q_pack=2, score_layout="wq", **kw)
    for a, b in zip(wq, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_backward_wq_quantized_matches(rng):
    """wq layout with int8 KV codes + per-position scales."""
    import jax.numpy as jnp
    from tpu_flash.kernels.flash_attention import (
        flash_attention_backward, flash_attention_forward)
    from tpu_flash.ops.attention import _quantize_kv

    B, H, L, d = 1, 2, 384, 32
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.float32) for _ in range(4))
    kq, ks = _quantize_kv(k, "int8")
    vq, vs = _quantize_kv(v, "int8")
    kq, vq = kq.transpose(0, 1, 3, 2), vq.transpose(0, 1, 3, 2)
    out, lse, _ = flash_attention_forward(
        q, kq, vq, ks, vs, causal=True, block_q=64, block_k=128,
        kv_layout="dl")
    base = flash_attention_backward(
        q, kq, vq, out, lse, do, None, ks, vs, causal=True, block_q=64,
        block_k=128, q_pack=2, kv_layout="dl")
    wq = flash_attention_backward(
        q, kq, vq, out, lse, do, None, ks, vs, causal=True, block_q=64,
        block_k=128, q_pack=2, kv_layout="dl", score_layout="wq")
    for a, b in zip(wq, base):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)
