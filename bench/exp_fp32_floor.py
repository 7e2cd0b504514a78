"""EXPERIMENT (r5): the fp32 d=64 per-dot irreducibility table — the
fp32 analog of round-4's bf16 floor analysis (VERDICT r4 #3 done-bar:
"fp32 d=64 >= 55% of ceiling or a per-dot fp32 irreducibility table").

fp32 inputs run the exact-parity mode: `_dot` pins Precision.HIGHEST, so
every fp32 dot executes as multiple bf16 MXU passes.  The question round
3/4 left open is whether fp32 d=64's 37%-of-ceiling is kernel overhead
(attackable) or the measured per-dot fp32 rates times the executed
schedule volume (structural).  This measures, IN ONE SESSION:

  1. fp32 in-kernel rates for the five backward dot shapes at the fp32
     production tiles (bq=256, w in the fp32 schedule's width classes);
  2. the executed-dot floor for the fp32 fused-backward schedule at
     d=64, L in {1024, 8192} (B chosen as in exp_fp32_configs);
  3. the production fp32 forward/backward wall times at those shapes.

ratio = production / floor.  ~1.0 => structural (the bf16 L=2048
backward sits at 0.90 of its floor); >> 1.0 => attackable overhead.

Run on the chip:  python -m bench.exp_fp32_floor
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from bench.exp_bw_residual import bw_dot_cases, make_dot_kernel
from tpu_flash.kernels.flash_attention import (
    _LIVE, _tile_schedule, flash_attention_forward, select_bwd_fused_config)
from tpu_flash.ops.attention import flash_attention
from tpu_flash.utils.timing import attention_flops, benchmark


def measure_rates_fp32(bq, widths, d):
    rng = np.random.default_rng(0)
    rates = {}
    for w in sorted(set(widths)):
        for (name, a_s, b_s, dims, o_s, macs) in bw_dot_cases(bq, w, d):
            reps = max(1, (1024 * 512) // (max(a_s[0] * a_s[1],
                                               b_s[0] * b_s[1])) // 2)
            a = jnp.asarray(rng.standard_normal((reps,) + a_s),
                            jnp.float32)
            b = jnp.asarray(rng.standard_normal((reps,) + b_s),
                            jnp.float32)
            run = make_dot_kernel(a_s, b_s, dims, o_s, reps)
            flops = 2.0 * macs * reps * 32
            r = benchmark(run, a, b, name=f"fp32_{name}_w{w}", flops=flops)
            rates[(name, bq, w, d)] = r.tflops
            print(f"  fp32 {name:7s} bq={bq} w={w:5d}: {r.tflops:6.1f} "
                  f"TF/s ({r.mean_ms:.3f} ms)", flush=True)
    return rates


def floor_ms(B, H, L, d, bq, bk, rates):
    num_q, num_kv = -(-L // bq), -(-L // bk)
    imap, jmap, flags, wmap, widths = _tile_schedule(
        num_q, num_kv, block_q=bq, block_k=bk, causal=True,
        q_offset=0, kv_len=L, kv_outer=True)
    total_s = total_fl = 0.0
    for t in range(len(imap)):
        if not (int(flags[t]) & _LIVE):
            continue
        w = widths[int(wmap[t])]
        for (name, *_r, macs) in bw_dot_cases(bq, w, d):
            fl = 2.0 * macs
            total_fl += fl
            total_s += fl / (rates[(name, bq, w, d)] * 1e12)
    useful = attention_flops(B, H, L, d, causal=True,
                             fwd_and_bwd=True) * 5.0 / 7.0
    return total_s * B * H * 1e3, useful, total_fl * B * H


def main():
    H, d = 8, 64
    for B, L in ((4, 1024), (1, 8192)):
        # the fp32 selector's actual config at this shape
        fused, bq, pack, bk, pLq, hbm = select_bwd_fused_config(
            L, L, d, block_q=None, block_k=512, causal=True, q_offset=0,
            itemsize=4)
        print(f"\n== fp32 d=64 B={B} L={L}: selector -> fused={fused} "
              f"{pack}x{bq}x{bk} hbm={hbm} ==", flush=True)
        _, _, _, wmap, widths = _tile_schedule(
            -(-L // bq), -(-L // bk), block_q=bq, block_k=bk, causal=True,
            q_offset=0, kv_len=L, kv_outer=True)
        rates = measure_rates_fp32(bq, widths, d)
        fl_ms, useful, executed = floor_ms(B, H, L, d, bq, bk, rates)
        print(f"  executed-dot floor {fl_ms:.3f} ms -> max useful "
              f"{useful / (fl_ms * 1e-3) / 1e12:.1f} TF/s "
              f"(executed/useful {executed / useful:.3f})", flush=True)

        rng = np.random.default_rng(0)
        q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                                   jnp.float32) for _ in range(4))
        flops = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True)
        fw_flops = attention_flops(B, H, L, d, causal=True)

        def fwbw(q, k, v):
            def loss(q, k, v):
                return jnp.sum(flash_attention(q, k, v, causal=True) * do)
            return jax.grad(loss, (0, 1, 2))(q, k, v)

        fw = benchmark(lambda q, k, v: flash_attention_forward(
            q, k, v, causal=True), q, k, v, name=f"fp32_fw_L{L}",
            flops=fw_flops)
        tot = benchmark(fwbw, q, k, v, name=f"fp32_fwbw_L{L}", flops=flops)
        bw_ms = max(tot.mean_ms - fw.mean_ms, 1e-6)
        bw_useful = flops - fw_flops
        print(f"  production fw {fw.mean_ms:.3f} ms ({fw.tflops:.1f} "
              f"TF/s); bw {bw_ms:.3f} ms "
              f"({bw_useful / (bw_ms * 1e-3) / 1e12:.1f} TF/s); "
              f"bw/floor {bw_ms / fl_ms:.3f}", flush=True)


if __name__ == "__main__":
    main()
