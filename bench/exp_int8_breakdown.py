"""EXPERIMENT: where does the INT8-KV training overhead go?

Round-1 measured INT8-KV fw+bw at 35.8 TFLOP/s vs 49.4 bf16 (~25% cost)
without attributing it.  This breaks the quantized path into stages at
L=2048 and L=8192 (B=4 H=8 d=64 causal bf16):

  quant       the per-step _quantize_kv of K and V alone (XLA)
  fw_bf16     plain forward
  fw_int8     forward consuming pre-quantized codes+scales
  fwbw_bf16   full fw+bw via jax.grad
  fwbw_int8   full fw+bw via flash_attention(kv_quant="int8")
              (includes the per-step quantize, as in training)
  bw_int8     backward alone consuming codes

Run:  python -m bench.exp_int8_breakdown
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.ops.attention import _quantize_kv, flash_attention
from tpu_flash.kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_forward,
)
from tpu_flash.utils.timing import attention_flops, benchmark


def main():
    rng = np.random.default_rng(0)
    B, H, d = 4, 8, 64
    for L in (2048, 8192):
        q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                                   jnp.bfloat16) for _ in range(4))
        kc, ks = _quantize_kv(k, "int8")
        vc, vs = _quantize_kv(v, "int8")
        o, lse, _ = flash_attention_forward(q, kc, vc, ks, vs, causal=True)

        fw_fl = attention_flops(B, H, L, d, causal=True)
        tot_fl = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True)
        bw_fl = tot_fl * 5.0 / 7.0

        quant = jax.jit(lambda k, v: (_quantize_kv(k, "int8"),
                                      _quantize_kv(v, "int8")))
        print(benchmark(quant, k, v, name=f"L{L} quant-only"), flush=True)
        print(benchmark(
            functools.partial(flash_attention_forward, causal=True),
            q, k, v, name=f"L{L} fw_bf16", flops=fw_fl), flush=True)
        print(benchmark(
            functools.partial(flash_attention_forward, causal=True),
            q, kc, vc, ks, vs, name=f"L{L} fw_int8", flops=fw_fl),
            flush=True)
        print(benchmark(
            functools.partial(flash_attention_backward, causal=True),
            q, k, v, o, lse, do, name=f"L{L} bw_bf16", flops=bw_fl),
            flush=True)
        print(benchmark(
            lambda q, kc, vc, o, lse, do, ks, vs: flash_attention_backward(
                q, kc, vc, o, lse, do, None, ks, vs, causal=True),
            q, kc, vc, o, lse, do, ks, vs,
            name=f"L{L} bw_int8", flops=bw_fl), flush=True)

        def fwbw(attn):
            def f(q, k, v):
                def loss(q, k, v):
                    out = attn(q, k, v)
                    return jnp.sum(out.astype(jnp.float32)
                                   * do.astype(jnp.float32))
                return jax.grad(loss, (0, 1, 2))(q, k, v)
            return f

        print(benchmark(
            fwbw(lambda q, k, v: flash_attention(q, k, v, causal=True)),
            q, k, v, name=f"L{L} fwbw_bf16", flops=tot_fl), flush=True)
        print(benchmark(
            fwbw(lambda q, k, v: flash_attention(
                q, k, v, causal=True, kv_quant="int8")),
            q, k, v, name=f"L{L} fwbw_int8", flops=tot_fl), flush=True)


if __name__ == "__main__":
    main()
