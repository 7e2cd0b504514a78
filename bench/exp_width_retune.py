"""EXPERIMENT: retune blocks/pack for the variable-width sub-tile kernels.

The width-class schedule changed the kernel economics: diagonal tiles no
longer compute dead columns, so larger KV tiles and bigger Q groups (fewer
steps, fewer KV re-reads — the ablation showed ~0.15 ms of the forward is
DMA/step overhead) may now win.  Headline shape, fw and bw separately,
plus int8-KV at the winning configs.

Run:  python -m bench.exp_width_retune
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from tpu_flash.ops.attention import _quantize_kv
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
    kc, ks = _quantize_kv(k, "int8")
    vc, vs = _quantize_kv(v, "int8")

    fw_fl = attention_flops(B, H, L, d, causal=causal)
    bw_fl = attention_flops(B, H, L, d, causal=causal,
                            fwd_and_bwd=True) * 5.0 / 7.0

    # parity guard: the width branches must match the jnp oracle
    import jax
    ref = jax.nn.softmax(
        jnp.where(jnp.tril(jnp.ones((L, L), bool)),
                  jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                             k.astype(jnp.float32)) / d ** 0.5,
                  -1e7), axis=-1) @ v.astype(jnp.float32)

    def fw(bq, bk, pack, name=None):
        out, _, _ = flash_attention_forward(
            q, k, v, causal=causal, block_q=bq, block_k=bk, q_pack=pack)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        r = benchmark(
            functools.partial(flash_attention_forward, causal=causal,
                              block_q=bq, block_k=bk, q_pack=pack),
            q, k, v, name=name or f"fw {pack}x{bq}x{bk}", flops=fw_fl)
        print(f"{r}   err={err:.1e}", flush=True)

    def bw(bq, bk):
        r = benchmark(
            functools.partial(flash_attention_backward, causal=causal,
                              block_q=bq, block_k=bk),
            q, k, v, o, lse, do, name=f"bw {bq}x{bk}", flops=bw_fl)
        print(r, flush=True)

    fw(512, 1024, 2)          # round-1 default, now width-classed
    fw(512, 1024, 4)          # bigger group: fewer steps + KV re-reads
    fw(512, 2048, 2)
    fw(512, 2048, 4)          # single group at L=2048: minimum KV traffic
    fw(1024, 1024, 2)
    fw(256, 1024, 4)

    bw(512, 512)              # round-1 default
    bw(512, 1024)
    bw(512, 2048)
    bw(1024, 1024)

    # int8-KV at default configs (codes pre-quantized: the training path
    # quantizes per step but that measured ~13/44 us — noise)
    r = benchmark(
        functools.partial(flash_attention_forward, causal=causal),
        q, kc, vc, ks, vs, name="fw int8 default", flops=fw_fl)
    print(r, flush=True)
    r = benchmark(
        lambda q, kc, vc, o, lse, do, ks, vs: flash_attention_backward(
            q, kc, vc, o, lse, do, None, ks, vs, causal=causal),
        q, kc, vc, o, lse, do, ks, vs, name="bw int8 default", flops=bw_fl)
    print(r, flush=True)


if __name__ == "__main__":
    main()
