"""EXPERIMENT: interleaved block-size retune for the production FA2 kernels
at the headline shape (B4 H8 L2048 d64 causal bf16).

Block rankings on the tunneled chip drift day-to-day (bench/RESULTS.md), so
every config is measured in N interleaved rounds and reported per-round —
trust a config only if it wins in (nearly) every round.

Run:  python -m bench.exp_block_retune [--rounds 3]
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_forward,
)
from tpu_flash.utils.timing import attention_flops, benchmark


def main(rounds: int = 3):
    rng = np.random.default_rng(0)
    B, H, L, d = 4, 8, 2048, 64
    causal = True
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.bfloat16) for _ in range(4))
    o, lse, _ = flash_attention_forward(q, k, v, causal=causal)
    fl_all = attention_flops(B, H, L, d, causal=causal, fwd_and_bwd=True)
    fl_fw, fl_bw = fl_all * 2.0 / 7.0, fl_all * 5.0 / 7.0

    fw_cfgs = [(512, 512), (512, 1024), (512, 2048), (256, 1024)]
    bw_cfgs = [(512, 256), (512, 512), (512, 1024), (1024, 512),
               (1024, 1024), (256, 512)]

    results: dict[str, list[float]] = {}
    for rnd in range(rounds):
        for bq, bk in fw_cfgs:
            name = f"fw {bq}x{bk}"
            r = benchmark(
                functools.partial(flash_attention_forward, causal=causal,
                                  block_q=bq, block_k=bk),
                q, k, v, name=name, flops=fl_fw)
            results.setdefault(name, []).append(r.mean_ms)
            print(f"round {rnd}: {r}", flush=True)
        for bq, bk in bw_cfgs:
            name = f"bw {bq}x{bk}"
            r = benchmark(
                functools.partial(flash_attention_backward, causal=causal,
                                  block_q=bq, block_k=bk),
                q, k, v, o, lse, do, name=name, flops=fl_bw)
            results.setdefault(name, []).append(r.mean_ms)
            print(f"round {rnd}: {r}", flush=True)

    print("\n=== summary (ms per round) ===")
    for name, times in results.items():
        print(f"{name:14s} {['%.3f' % t for t in times]}  "
              f"min={min(times):.3f}")


if __name__ == "__main__":
    rounds = 3
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    main(rounds)
