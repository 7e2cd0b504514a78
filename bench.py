"""Headline benchmark: Pallas FA2 forward+backward vs the XLA naive
attention graph on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

value       = FA2 fw+bw sustained TFLOP/s (causal, bf16, B=4 H=8 L=2048 d=64)
vs_baseline = speedup over the XLA-fused naive attention graph fw+bw on the
              same chip (the reference project's own headline comparison:
              flash kernels vs its naive attention graph).

Timing uses chained-scan marginal measurement (utils/timing.py) — naive
timing loops overlap/elide under async dispatch and measure nothing.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_flash import flash_attention, naive_attention
    from tpu_flash.utils.timing import attention_flops, benchmark

    B, H, L, d = 4, 8, 2048, 64
    rng = np.random.default_rng(0)
    q, k, v, do = (
        jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.bfloat16)
        for _ in range(4)
    )

    def fwbw(attn):
        def f(q, k, v):
            def loss(q, k, v):
                out = attn(q, k, v)
                return jnp.sum(out.astype(jnp.float32)
                               * do.astype(jnp.float32))
            # Return ALL cotangents: dropping any would let XLA dead-code
            # the kernel that produces it and measure a partial backward.
            return jax.grad(loss, (0, 1, 2))(q, k, v)
        return f

    flops = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True)
    flash = benchmark(
        fwbw(lambda q, k, v: flash_attention(q, k, v, causal=True)),
        q, k, v, name="fa2_fwbw", flops=flops)
    naive = benchmark(
        fwbw(lambda q, k, v: naive_attention(q, k, v, causal=True)),
        q, k, v, name="naive_fwbw", flops=flops)

    print(json.dumps({
        "metric": "fa2_fwbw_causal_bf16_L2048_tflops",
        "value": round(flash.tflops, 2),
        "unit": "TFLOP/s",
        "vs_baseline": round(naive.mean_ms / flash.mean_ms, 3),
    }))


if __name__ == "__main__":
    main()
