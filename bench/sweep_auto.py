"""Measure the flash-vs-naive crossover surface over (L, d, dtype).

nn/transformer.py's ``attention_kind="auto"`` switch was calibrated in
round 1 from exactly two data points (L=256/d=32 and L=2048/d=64); this
sweep measures the fw+bw causal crossover over a grid so the
``_FLASH_AUTO_MIN_L`` constant is table-backed (VERDICT item 8).

Batch*heads is held at 32 (B/H are grid-parallel — see bench/sweep_bhd.py
for the equivalence check).  Outcome: the crossover is a function of L
alone (fixed ~50 us flash floor at small L), so the auto rule keys on L.

Run:  python -m bench.sweep_auto
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.utils.timing import attention_flops, benchmark


def main():
    from tpu_flash import flash_attention, naive_attention

    rng = np.random.default_rng(0)
    print(f"{'dtype':9s} {'L':>5s} {'d':>4s} {'L*d':>8s} "
          f"{'flash ms':>9s} {'naive ms':>9s} {'flash/naive':>11s}  winner",
          flush=True)
    for dtype in (jnp.bfloat16, jnp.float32):
        for L in (128, 256, 512, 1024, 2048):
            for d in (32, 64, 128):
                B, H = 4, 8
                q, k, v, do = (jnp.asarray(
                    rng.standard_normal((B, H, L, d)), dtype)
                    for _ in range(4))
                fl = attention_flops(B, H, L, d, causal=True,
                                     fwd_and_bwd=True)

                def fwbw(attn):
                    def f(q, k, v):
                        def loss(q, k, v):
                            out = attn(q, k, v)
                            return jnp.sum(out.astype(jnp.float32)
                                           * do.astype(jnp.float32))
                        return jax.grad(loss, (0, 1, 2))(q, k, v)
                    return f

                flash = benchmark(
                    fwbw(lambda q, k, v: flash_attention(
                        q, k, v, causal=True)),
                    q, k, v, name="flash", flops=fl)
                naive = benchmark(
                    fwbw(lambda q, k, v: naive_attention(
                        q, k, v, causal=True)),
                    q, k, v, name="naive", flops=fl)
                ratio = flash.mean_ms / naive.mean_ms
                winner = "flash" if ratio < 1.0 else "naive"
                print(f"{jnp.dtype(dtype).name:9s} {L:5d} {d:4d} "
                      f"{L * d:8d} {flash.mean_ms:9.3f} {naive.mean_ms:9.3f} "
                      f"{ratio:11.3f}  {winner}", flush=True)


if __name__ == "__main__":
    main()
