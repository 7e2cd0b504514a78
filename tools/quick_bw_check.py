"""Fast on-chip sanity for the packed fused backward (round 4): compiles
the auto-selected configs at the headline and north-star shapes and pins
them against the unpacked (q_pack=1) kernel.  ~4 compiles; minutes —
meant to run BEFORE the long MT jobs so a Mosaic regression in the new
packed kernel surfaces early.  Full parity remains bench/check_fa.py.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_forward,
    select_bwd_fused_config,
)


def main():
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for (B, H, L, d) in [(4, 8, 2048, 64), (1, 8, 8192, 64)]:
        sel = select_bwd_fused_config(L, L, d, block_q=None,
                                      block_k=min(2048, L), causal=True,
                                      q_offset=0, itemsize=2)
        print(f"L={L}: auto -> fused={sel[0]} bq={sel[1]} pack={sel[2]} "
              f"bk={sel[3]} dq_hbm={sel[5]}", flush=True)
        q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                                   jnp.bfloat16) for _ in range(4))
        o, lse, _ = flash_attention_forward(q, k, v, causal=True)
        ref = flash_attention_backward(q, k, v, o, lse, do, causal=True,
                                       q_pack=1)
        out = flash_attention_backward(q, k, v, o, lse, do, causal=True)
        err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
                  for a, b in zip(out, ref))
        print(f"L={L}: packed vs unpacked max|delta| = {err:.2e}",
              flush=True)
        assert err < 1e-2, err
    print("QUICK BW CHECK OK", flush=True)


if __name__ == "__main__":
    main()
