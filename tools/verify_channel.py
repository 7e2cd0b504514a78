"""On-chip parity drive for the r5 per-CHANNEL KV-scale mode: the CPU
suite runs these kernels in interpret mode; this proves the
Mosaic-COMPILED forms (fused qw default, explicit wq, packed configs,
fp32 exact mode, GQA) against the channel-dequant oracle on the chip.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    assert jax.default_backend() != "cpu", jax.default_backend()
    print("backend:", jax.default_backend(), flush=True)
    from tpu_flash.kernels import flash_attention as fa
    from tpu_flash.ops.attention import (
        _quantize_kv, dequantize_kv, flash_attention)

    rng = np.random.default_rng(0)
    ok = True

    def check(name, got, want, atol, rtol):
        nonlocal ok
        g = np.asarray(got, np.float32)
        w = np.asarray(want, np.float32)
        dev = float(np.max(np.abs(g - w)))
        rel = float(np.max(np.abs(g - w) / (np.abs(w) + 1e-6)))
        line = f"  {name:34s} max-abs {dev:.3e} max-rel {rel:.3e}"
        if dev > atol and rel > rtol:
            ok = False
            line += "  ** FAIL"
        print(line, flush=True)

    for label, dtype, B, H, Hkv, L, d, layout in [
        ("fp32 L=512 qw", jnp.float32, 2, 4, 4, 512, 64, "qw"),
        ("bf16 L=2048 qw", jnp.bfloat16, 2, 8, 8, 2048, 64, "qw"),
        ("bf16 L=2048 wq", jnp.bfloat16, 2, 8, 8, 2048, 64, "wq"),
        ("bf16 L=2048 gqa2 qw", jnp.bfloat16, 2, 8, 2, 2048, 64, "qw"),
        ("bf16 L=8192 north-star", jnp.bfloat16, 1, 8, 8, 8192, 64, None),
    ]:
        q, do = (jnp.asarray(rng.standard_normal((B, H, L, d)), dtype)
                 for _ in range(2))
        k, v = (jnp.asarray(rng.standard_normal((B, Hkv, L, d)), dtype)
                for _ in range(2))
        kc, ks = _quantize_kv(k, "int8_channel")
        vc, vs = _quantize_kv(v, "int8_channel")
        k_dq = dequantize_kv(kc, ks, "int8_channel").astype(dtype)
        v_dq = dequantize_kv(vc, vs, "int8_channel").astype(dtype)
        kcT, vcT = kc.transpose(0, 1, 3, 2), vc.transpose(0, 1, 3, 2)

        out_q, lse_q, _ = fa.flash_attention_forward(
            q, kcT, vcT, ks, vs, causal=True, kv_layout="dl",
            kv_scale_mode="channel")
        out_r, lse_r, _ = fa.flash_attention_forward(
            q, k_dq, v_dq, causal=True)
        tol = (5e-5, 1e-4) if dtype == jnp.float32 else (3e-2, 3e-2)
        check(f"{label} fw", out_q, out_r, *tol)

        gq = fa.flash_attention_backward(
            q, kcT, vcT, out_q, lse_q, do, None, ks, vs, causal=True,
            kv_layout="dl", kv_scale_mode="channel", score_layout=layout)
        gr = fa.flash_attention_backward(
            q, k_dq, v_dq, out_r, lse_r, do, causal=True,
            score_layout=layout)
        gtol = (2e-4, 1e-3) if dtype == jnp.float32 else (8e-2, 8e-2)
        for nm, a, b in zip(("dq", "dk", "dv"), gq, gr):
            check(f"{label} {nm}", a, b, *gtol)

    # public API smoke (custom_vjp path) on the chip
    q, k, v = (jnp.asarray(rng.standard_normal((1, 4, 1024, 64)),
                           jnp.bfloat16) for _ in range(3))
    g = jax.grad(lambda q, k, v: jnp.sum(flash_attention(
        q, k, v, causal=True, kv_quant="int8_channel").astype(
            jnp.float32)), (0, 1, 2))(q, k, v)
    assert all(bool(jnp.isfinite(x.astype(jnp.float32)).all()) for x in g)
    print("public kv_quant=int8_channel grad: finite", flush=True)
    print("ALL OK" if ok else "FAILURES PRESENT", flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
