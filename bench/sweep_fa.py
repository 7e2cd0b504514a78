"""Sweep flash-attention block sizes and measure fw / bw separately.

Usage: python bench/sweep_fa.py [--L 2048] [--d 64] [--causal]
"""

from __future__ import annotations

import argparse
import itertools

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--B", type=int, default=4)
    ap.add_argument("--H", type=int, default=8)
    ap.add_argument("--L", type=int, default=2048)
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--causal", action="store_true", default=True)
    ap.add_argument("--no-causal", dest="causal", action="store_false")
    ap.add_argument("--iters", type=int, default=0,
                    help="0 = auto-calibrate to a ~150ms marginal signal")
    ap.add_argument("--q-pack", type=int, default=None,
                    help="forward Q-sub-tile packing (None = kernel default: "
                         "2 for fold_l head dims; pass 1 to sweep the "
                         "unpacked kernel)")
    args = ap.parse_args()

    from tpu_flash.kernels.flash_attention import (
        flash_attention_backward,
        flash_attention_forward,
    )
    from tpu_flash.utils.timing import attention_flops, benchmark

    B, H, L, d = args.B, args.H, args.L, args.d
    rng = np.random.default_rng(0)
    q, k, v, do = (
        jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.bfloat16)
        for _ in range(4)
    )

    fw_flops = attention_flops(B, H, L, d, causal=args.causal)
    bw_flops = attention_flops(B, H, L, d, causal=args.causal,
                               fwd_and_bwd=True) - fw_flops

    blocks = [256, 512, 1024]
    print(f"B={B} H={H} L={L} d={d} causal={args.causal}")
    print("--- forward ---")
    for bq, bk in itertools.product(blocks, blocks):
        if bq > L or bk > L:
            continue
        try:
            r = benchmark(
                lambda q, k, v: flash_attention_forward(
                    q, k, v, causal=args.causal, block_q=bq, block_k=bk,
                    q_pack=args.q_pack),
                q, k, v, iters=args.iters or None,
                name=f"fw bq={bq} bk={bk} qp={args.q_pack or 'auto'}",
                flops=fw_flops)
            print(f"{r}   ")
        except Exception as e:  # noqa: BLE001
            print(f"fw bq={bq} bk={bk}: FAIL {type(e).__name__}: {e}")

    out, lse, _ = flash_attention_forward(q, k, v, causal=args.causal)
    print("--- backward ---")
    for bq, bk in itertools.product(blocks, blocks):
        if bq > L or bk > L:
            continue
        try:
            r = benchmark(
                lambda q, k, v, o, lse, do: flash_attention_backward(
                    q, k, v, o, lse, do, causal=args.causal,
                    block_q=bq, block_k=bk),
                q, k, v, out, lse, do, iters=args.iters or None,
                name=f"bw bq={bq} bk={bk}", flops=bw_flops)
            print(f"{r}   ")
        except Exception as e:  # noqa: BLE001
            print(f"bw bq={bq} bk={bk}: FAIL {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
