"""On-TPU numeric check of the heads-minor flash-decode kernel vs an XLA
oracle: MHA/GQA/MQA, fp32/bf16, int8/fp8 caches, sliding window, ragged
lengths.  Run:  python -m bench.check_decode
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")


def oracle(q, k, v, lengths, window=None):
    """q [B,Hq,1,d]; k/v [B,Hkv,S,d] dequantized."""
    B, Hkv, S, d = k.shape
    g = q.shape[1] // Hkv
    kk = jnp.repeat(k, g, axis=1).astype(jnp.float32)
    vv = jnp.repeat(v, g, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kk) / np.sqrt(d)
    pos = jnp.arange(S)[None, None, None, :]
    m = pos < lengths[:, None, None, None]
    if window is not None:
        m &= pos >= (lengths[:, None, None, None] - window)
    p = jax.nn.softmax(jnp.where(m, s, -1e30), -1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vv)


def main():
    from tpu_flash.inference.kv_cache import KVCache
    from tpu_flash.kernels.decode import flash_decode_attention as fda

    rng = np.random.default_rng(0)
    cases = [
        # (B, Hq, Hkv, S, d, dtype, quant, window)
        (3, 8, 8, 2048, 64, jnp.float32, "none", None),
        (3, 8, 8, 2048, 64, jnp.bfloat16, "none", None),
        (2, 8, 2, 1536, 64, jnp.bfloat16, "none", None),
        (2, 8, 1, 2048, 64, jnp.bfloat16, "int8", None),
        (2, 8, 8, 2048, 64, jnp.bfloat16, "int8", None),
        (2, 8, 8, 2048, 64, jnp.bfloat16, "fp8", None),
        (2, 4, 4, 2048, 128, jnp.float32, "none", None),
        (2, 8, 8, 2048, 64, jnp.bfloat16, "none", 640),
        (2, 8, 4, 2048, 64, jnp.bfloat16, "int8", 640),
    ]
    for B, Hq, Hkv, S, d, dtype, quant, window in cases:
        q = jnp.asarray(rng.standard_normal((B, Hq, 1, d)) * 0.5, dtype)
        k4 = jnp.asarray(rng.standard_normal((B, Hkv, S, d)) * 0.5, dtype)
        v4 = jnp.asarray(rng.standard_normal((B, Hkv, S, d)) * 0.5, dtype)
        lengths = jnp.asarray(
            [S] + list(rng.integers(1, S, B - 1)), jnp.int32)

        cache = KVCache.create(B, Hkv, S, d, quant=quant,
                               compute_dtype=dtype)
        cache = cache.append(k4, v4)
        out = fda(q, cache.k, cache.v, lengths,
                  cache.k_scale, cache.v_scale, window=window)
        ref = oracle(q, cache.read_k(), cache.read_v(), lengths, window)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
        tol = 1e-5 if dtype == jnp.float32 else 3e-2
        status = "OK " if err < tol else "FAIL"
        print(f"{status} B{B} Hq{Hq} Hkv{Hkv} S{S} d{d} "
              f"{jnp.dtype(dtype).name} quant={quant} window={window}: "
              f"err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()
