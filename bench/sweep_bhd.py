"""B/H/d ablation sweep — the reference README's ablations, on TPU.

Reproduces /root/reference/README.md:12-13 ("speedup vs batch size, heads,
head-dim; batch and heads are equivalent — parallelized as independent
blocks") for the Pallas FA2 kernel vs the XLA naive graph, fw+bw, causal
bf16 at L=2048, reporting TFLOP/s and speedup per point.

The "batch and heads equivalent" claim is checked directly: (B=1,H=32),
(B=2,H=16), (B=4,H=8), (B=8,H=4), (B=32,H=1) all present the same flat
(batch*heads) grid dimension to the kernel's packed-tile schedule.

Run:  python -m bench.sweep_bhd
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.utils.timing import attention_flops, benchmark


def fwbw(attn, do):
    def f(q, k, v):
        def loss(q, k, v):
            out = attn(q, k, v)
            return jnp.sum(out.astype(jnp.float32) * do.astype(jnp.float32))
        return jax.grad(loss, (0, 1, 2))(q, k, v)
    return f


def measure(B, H, L, d):
    from tpu_flash import flash_attention, naive_attention

    rng = np.random.default_rng(0)
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.bfloat16) for _ in range(4))
    fl = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True)
    flash = benchmark(
        fwbw(lambda q, k, v: flash_attention(q, k, v, causal=True), do),
        q, k, v, name="flash", flops=fl)
    naive = benchmark(
        fwbw(lambda q, k, v: naive_attention(q, k, v, causal=True), do),
        q, k, v, name="naive", flops=fl)
    sp = naive.mean_ms / flash.mean_ms
    print(f"B={B:3d} H={H:3d} L={L} d={d:4d}: flash {flash.mean_ms:7.3f} ms "
          f"({flash.tflops:5.1f} TF/s)  naive {naive.mean_ms:7.3f} ms  "
          f"speedup {sp:4.2f}x", flush=True)
    return flash, naive


def main():
    L = 2048
    print("-- batch sweep (H=8, d=64) --", flush=True)
    for B in (1, 2, 4, 8):
        measure(B, 8, L, 64)
    print("-- head sweep (B=4, d=64) --", flush=True)
    for H in (1, 2, 4, 8, 16):
        measure(4, H, L, 64)
    print("-- batch/head equivalence (B*H = 32, d=64) --", flush=True)
    for B, H in ((1, 32), (2, 16), (8, 4), (32, 1)):
        measure(B, H, L, 64)
    print("-- head-dim sweep (B=4, H=8) --", flush=True)
    for d in (32, 64, 128, 256):
        measure(4, 8, L, d)


if __name__ == "__main__":
    main()
