"""Decode-attention bandwidth benchmark: Pallas flash-decode (bf16 vs int8
cache) vs the XLA composed decode graph.

Uses the shared auto-calibrated marginal timing harness (utils/timing.py) —
per-call wall noise over the tunneled link is +-5-10 ms, so short loops
measure nothing.
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sweep_tiles():
    """--sweep-tiles: re-measure bf16 decode across key-tile sizes (the
    tuning procedure behind decode.DEFAULT_BLOCK_S).

    block_s is passed explicitly: it is a static jit argument, so every
    size gets its own trace/compile.  (Mutating decode.VMEM_TILE_BUDGET
    between calls does NOT work — the global is read at trace time and
    identical call signatures hit the jit cache, so an earlier version of
    this sweep timed one compiled kernel five times.)"""
    from tpu_flash.kernels import decode
    from tpu_flash.utils.timing import benchmark

    # lift the budget cap once, before any trace, so block_s is the only
    # variable under sweep
    decode.VMEM_TILE_BUDGET = 1 << 24

    rng = np.random.default_rng(0)
    B, H, S, d = 8, 8, 8192, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, S, H * d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H * d)), jnp.bfloat16)
    lengths = jnp.asarray([S] * B, jnp.int32)
    results = {}
    for block_s in (256, 512, 1024, 2048, 4096):
        t = benchmark(
            lambda q, bs=block_s: decode.flash_decode_attention(
                q, k, v, lengths, block_s=bs),
            q, name=f"block_s_{block_s}").mean_ms
        results[f"block_s={block_s}"] = {
            "ms": round(t, 4),
            "GBps": round(B * H * S * d * 2 * 2 / (t * 1e-3) / 1e9),
        }
    print(json.dumps(results), flush=True)


def main():
    from tpu_flash.kernels.decode import flash_decode_attention as fda
    from tpu_flash.inference.kv_cache import KVCache
    from tpu_flash.utils.timing import benchmark

    rng = np.random.default_rng(0)
    B, H, S, d = 8, 8, 8192, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, d)), jnp.bfloat16)
    k4 = rng.standard_normal((B, H, S, d)).astype(np.float32)
    v4 = rng.standard_normal((B, H, S, d)).astype(np.float32)
    lengths = jnp.asarray([S] * B, jnp.int32)

    # native heads-minor cache layout [B, S, H*d] (what KVCache stores)
    k = jnp.asarray(k4.transpose(0, 2, 1, 3).reshape(B, S, H * d),
                    jnp.bfloat16)
    v = jnp.asarray(v4.transpose(0, 2, 1, 3).reshape(B, S, H * d),
                    jnp.bfloat16)

    # int8 cache via the production quantizer
    c8 = KVCache.create(B, H, S, d, quant="int8", compute_dtype=jnp.bfloat16)
    c8 = c8.append(jnp.asarray(k4, jnp.bfloat16), jnp.asarray(v4, jnp.bfloat16))
    k8, v8, ks, vs = c8.k, c8.v, c8.k_scale, c8.v_scale

    kf = jnp.asarray(k4, jnp.bfloat16)
    vf = jnp.asarray(v4, jnp.bfloat16)

    def xla_ref(q):
        s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                       kf.astype(jnp.float32)) / np.sqrt(d)
        mask = jnp.arange(S)[None, None, None, :] < lengths[:, None, None, None]
        p = jax.nn.softmax(jnp.where(mask, s, -1e9), -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p,
                          vf.astype(jnp.float32)).astype(q.dtype)

    t_bf = benchmark(lambda q: fda(q, k, v, lengths), q, name="bf16").mean_ms
    t_i8 = benchmark(lambda q: fda(q, k8, v8, lengths, ks, vs), q,
                     name="int8").mean_ms
    t_x = benchmark(xla_ref, q, name="xla").mean_ms
    lens2 = jnp.asarray([1024] * B, jnp.int32)
    t_short = benchmark(lambda q: fda(q, k8, v8, lens2, ks, vs), q,
                        name="int8_short").mean_ms

    bw_bf = B * H * S * d * 2 * 2 / (t_bf * 1e-3) / 1e9
    bw_i8 = (B * H * S * d * 2 + B * H * S * 8) / (t_i8 * 1e-3) / 1e9
    print(json.dumps({
        "bf16_ms": round(t_bf, 4), "int8_ms": round(t_i8, 4),
        "xla_ms": round(t_x, 4), "short_ms": round(t_short, 4),
        "bf16_GBps": round(bw_bf), "int8_GBps": round(bw_i8),
        "int8_vs_bf16": round(t_bf / t_i8, 2),
        "pallas_vs_xla": round(t_x / t_bf, 2),
        "dma_skip_ratio": round(t_i8 / t_short, 2),
    }), flush=True)


if "--sweep-tiles" in sys.argv:
    sweep_tiles()
else:
    main()
