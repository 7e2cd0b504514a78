"""EXPERIMENT: bf16 vs quantized-KV FA2 fw+bw where KV bytes dominate
(VERDICT r2 #2b: the round-1 done-bar "int8-KV >= bf16 at L=8k" was never
measured in bf16).

Measures, at B=1 H=8 d=64 causal bf16 over L in {2k, 8k, 16k, 32k}:
  * bf16 fw+bw (the production kernel);
  * int8-KV fw+bw (codes + scales through fw and bw recompute);
  * the int8 PROLOGUE alone (quantize + d-major transpose in XLA) — the
    per-call cost VERDICT wants eliminated/attributed;
  * fp8-KV fw+bw for the same grid.

Also reports attention-residual memory per config (the quantized path's
actual win: int8 halves / fp8 halves the saved K/V residual bytes).

Run:  python -m bench.exp_kvq_long
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.ops.attention import (
    _flash_attention_quantkv,
    _quantize_kv,
    flash_attention,
)
from tpu_flash.utils.timing import attention_flops, benchmark


def fwbw(fn, do):
    def f(q, k, v):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32)
                           * do.astype(jnp.float32))
        return jax.grad(loss, (0, 1, 2))(q, k, v)
    return f


def prologue(k, v, mode):
    kc, ks = _quantize_kv(k, mode)
    vc, vs = _quantize_kv(v, mode)
    return (kc.transpose(0, 1, 3, 2), vc.transpose(0, 1, 3, 2), ks, vs)


def main():
    rng = np.random.default_rng(0)
    H, d = 8, 64
    for L in (2048, 8192, 16384, 32768):
        B = 1 if L > 4096 else 4
        q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                                   jnp.bfloat16) for _ in range(4))
        flops = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True)
        base = benchmark(
            fwbw(lambda q, k, v: flash_attention(q, k, v, causal=True), do),
            q, k, v, name=f"bf16 L{L}", flops=flops)
        res = {}
        for mode in ("int8", "fp8"):
            r = benchmark(
                fwbw(lambda q, k, v, m=mode: flash_attention(
                    q, k, v, causal=True, kv_quant=m), do),
                q, k, v, name=f"{mode} L{L}", flops=flops)
            res[mode] = r
        pro = benchmark(functools.partial(prologue, mode="int8"),
                        k, v, name=f"prologue L{L}")
        kv_mb = 2 * B * H * L * d * 2 / 1e6
        print(f"L={L} B={B}: bf16 {base.mean_ms:.3f} ms "
              f"({base.tflops:.1f} TF/s) | int8 {res['int8'].mean_ms:.3f} "
              f"({res['int8'].tflops:.1f}) "
              f"[{res['int8'].mean_ms / base.mean_ms:.3f}x] | "
              f"fp8 {res['fp8'].mean_ms:.3f} "
              f"[{res['fp8'].mean_ms / base.mean_ms:.3f}x] | "
              f"int8 prologue {pro.mean_ms:.3f} ms | KV {kv_mb:.0f} MB "
              f"(residual saved {kv_mb / 2:.0f} MB int8)")


if __name__ == "__main__":
    main()
