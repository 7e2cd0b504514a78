"""EXPERIMENT: bf16 softmax tail (fast_exp) + mask merge + block sweep.

Measures the headline shape (B=4 H=8 L=2048 d=64 causal bf16) forward and
backward separately:

  * fast_exp off vs on (bf16 exp2/ds tail, merged single-select masks),
  * block/pack sweep now that the per-step VPU cost changed — smaller KV
    blocks cut the causal diagonal waste (executed-but-unmasked dot volume)
    but only pay off if the per-step overhead stays hidden.

Run:  python -m bench.exp_fast_softmax
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from tpu_flash.kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_forward,
)
from tpu_flash.utils.timing import attention_flops, benchmark


def main():
    rng = np.random.default_rng(0)
    B, H, L, d = 4, 8, 2048, 64
    causal = True
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.bfloat16) for _ in range(4))
    o, lse, _ = flash_attention_forward(q, k, v, causal=causal)

    fw_fl = attention_flops(B, H, L, d, causal=causal)
    bw_fl = attention_flops(B, H, L, d, causal=causal,
                            fwd_and_bwd=True) * 5.0 / 7.0

    def fw(fast, bq, bk, pack):
        return benchmark(
            functools.partial(flash_attention_forward, causal=causal,
                              fast_exp=fast, block_q=bq, block_k=bk,
                              q_pack=pack),
            q, k, v,
            name=f"fw fast={int(fast)} {pack}x{bq}x{bk}", flops=fw_fl)

    def bw(fast, bq, bk):
        return benchmark(
            functools.partial(flash_attention_backward, causal=causal,
                              fast_exp=fast, block_q=bq, block_k=bk),
            q, k, v, o, lse, do,
            name=f"bw fast={int(fast)} {bq}x{bk}", flops=bw_fl)

    # -- forward --------------------------------------------------------
    print(fw(False, 512, 1024, 2), flush=True)   # round-1 default, re-measured
    print(fw(True, 512, 1024, 2), flush=True)
    print(fw(True, 512, 512, 2), flush=True)
    print(fw(True, 256, 512, 4), flush=True)
    print(fw(True, 256, 256, 4), flush=True)
    print(fw(True, 512, 512, 1), flush=True)

    # -- backward -------------------------------------------------------
    print(bw(False, 512, 512), flush=True)       # round-1 default, re-measured
    print(bw(True, 512, 512), flush=True)
    print(bw(True, 256, 256), flush=True)
    print(bw(True, 256, 512), flush=True)
    print(bw(True, 384, 384), flush=True)


if __name__ == "__main__":
    main()
