"""BASELINE measured-config (2): fp32 causal fw+bw with dropout / INT8-KV,
reported against a SAME-RUN calibrated exact-fp32 matmul ceiling.

Round 1 tabled these shapes (8-22 TFLOP/s) without stating the fp32-specific
roofline fraction (VERDICT weak item 5).  Exact-fp32 contraction uses
multiple MXU passes (~6x bf16 cost), so judging fp32 kernels against the
bf16 ceiling is meaningless; this script first measures the chip's own
fp32-HIGHEST matmul rate, then reports each config as a fraction of it.

Run:  python -m bench.exp_fp32_configs
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.utils.timing import attention_flops, benchmark


def calibrate_fp32_ceiling():
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(
            a, b, ((((1,), (0,))), ((), ())),
            precision=jax.lax.Precision.HIGHEST)

    r = benchmark(mm, a, b, name="fp32 matmul", flops=2.0 * 4096 ** 3)
    return r.tflops


def main():
    from tpu_flash import flash_attention

    ceiling = calibrate_fp32_ceiling()
    print(f"calibrated exact-fp32 matmul ceiling: {ceiling:.1f} TFLOP/s",
          flush=True)

    rng = np.random.default_rng(0)
    for B, H, L, d in [(4, 8, 1024, 64), (1, 8, 8192, 64), (4, 8, 2048, 128)]:
        q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                                   jnp.float32) for _ in range(4))
        fl = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True)

        def fwbw(**kw):
            def f(q, k, v):
                def loss(q, k, v):
                    out = flash_attention(q, k, v, causal=True, **kw)
                    return jnp.sum(out * do)
                return jax.grad(loss, (0, 1, 2))(q, k, v)
            return f

        for name, kw in [("fp32", {}),
                         ("fp32+dropout", dict(dropout_rate=0.1,
                                               dropout_seed=3)),
                         ("int8-KV", dict(kv_quant="int8"))]:
            r = benchmark(fwbw(**kw), q, k, v, name=name, flops=fl)
            frac = r.tflops / ceiling
            print(f"B{B} H{H} L{L} d{d} {name:13s}: {r.mean_ms:7.3f} ms "
                  f"({r.tflops:5.1f} TF/s, {frac:.0%} of fp32 ceiling)",
                  flush=True)


if __name__ == "__main__":
    main()
