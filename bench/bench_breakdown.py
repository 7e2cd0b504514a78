"""Per-op runtime breakdown of the naive attention graph.

The analog of the reference's ``kernel_tests/test_flashattn_breakdown.py``
(:44-76): time each stage of vanilla attention — QK^T, +mask, softmax,
dropout, P@V — separately, against the fused flash kernel.  This is the
data behind the reference README's claim that the memory-bound pointwise
ops (masking/softmax/dropout) dominate vanilla attention; on TPU each
stage is timed as its OWN jit program (inside one jit XLA would fuse them,
which is of course the point of the comparison).

Run:  python -m bench.bench_breakdown [--L 2048]
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--H", type=int, default=8)
    ap.add_argument("--L", type=int, default=2048)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--dropout", type=float, default=0.1)
    args = ap.parse_args()

    from tpu_flash import flash_attention
    from tpu_flash.ops.reference import causal_mask
    from tpu_flash.utils.timing import attention_flops, benchmark

    B, H, L, d = args.B, args.H, args.L, args.d
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.bfloat16)
               for _ in range(3))
    scale = 1.0 / (d ** 0.5)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    mask = causal_mask(L, L, s.dtype)
    p = jax.nn.softmax(s + mask, axis=-1)
    keep = jnp.asarray(rng.random((B, H, L, L)) > args.dropout, jnp.bfloat16)

    stages = {
        "qk": lambda: benchmark(
            lambda q, k: jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale,
            q, k, name="qk"),
        "mask": lambda: benchmark(lambda s: s + mask, s, name="mask"),
        "softmax": lambda: benchmark(
            lambda s: jax.nn.softmax(s, axis=-1), s + mask, name="softmax"),
        "dropout": lambda: benchmark(
            lambda p, keep: p * keep / (1.0 - args.dropout), p, keep,
            name="dropout"),
        "qkv": lambda: benchmark(
            lambda p, v: jnp.einsum("bhqk,bhkd->bhqd", p, v), p, v,
            name="qkv"),
    }
    breakdown = {name: round(fn().mean_ms, 4) for name, fn in stages.items()}
    total = sum(breakdown.values())

    fl = attention_flops(B, H, L, d, causal=True)
    flash = benchmark(
        lambda q, k, v: flash_attention(q, k, v, causal=True),
        q, k, v, name="flash", flops=fl)

    matmul_ms = breakdown["qk"] + breakdown["qkv"]
    print(json.dumps({
        "shape": f"B{B} H{H} L{L} d{d}",
        "naive_breakdown_ms": breakdown,
        "naive_total_ms": round(total, 4),
        "pointwise_fraction": round(1.0 - matmul_ms / total, 3),
        "flash_fused_ms": round(flash.mean_ms, 4),
        "flash_speedup_vs_naive_sum": round(total / flash.mean_ms, 2),
    }))


if __name__ == "__main__":
    main()
