"""Weight-only quantized matmul benchmark: int4 / int8 vs the XLA bf16
matmul in the decode regime (small M, weight bytes dominate — the matmul is
HBM-bound, so halving weight traffic should approach halving time).

Run:  python -m bench.bench_wquant [--M 32]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(M: int = 32, K: int = 2048, N: int = 4096):
    from tpu_flash.kernels.quant import (int4_matmul, int8_matmul,
                                         quantize_weight,
                                         quantize_weight_int4)
    from tpu_flash.utils.roofline import roofline, weight_matmul_bytes
    from tpu_flash.utils.timing import benchmark

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((K, N)) / np.sqrt(K), jnp.bfloat16)
    codes8, scales8 = quantize_weight(w)
    packed4, scales4, _ = quantize_weight_int4(w)
    packed4g, scales4g, _ = quantize_weight_int4(w, group_size=128)

    cases = {
        "xla_bf16": (jax.jit(lambda x: jnp.dot(
            x, w, preferred_element_type=jnp.float32).astype(jnp.bfloat16)),
            (x,), 2.0),
        "int8": (lambda x: int8_matmul(x, codes8, scales8), (x,), 1.0),
        "int4": (lambda x: int4_matmul(x, packed4, scales4, k_dim=K),
                 (x,), 0.5),
        "int4_g128": (lambda x: int4_matmul(x, packed4g, scales4g, k_dim=K),
                      (x,), 0.5),
    }
    out = {"shape": f"M{M} K{K} N{N}",
           "weight_mb_bf16": round(2 * K * N / 2**20, 1)}
    flops = 2.0 * M * K * N
    base = None
    for name, (fn, args, wbytes) in cases.items():
        r = benchmark(fn, *args, name=name)
        point = roofline(r.mean_ms, flops,
                         weight_matmul_bytes(M, K, N, weight_bytes=wbytes))
        out[f"{name}_ms"] = round(r.mean_ms, 4)
        out[f"{name}_gbs"] = round(point.achieved_gbs, 1)
        out[f"{name}_roofline"] = round(point.fraction, 3)
        if base is None:
            base = r.mean_ms
        else:
            out[f"{name}_vs_bf16"] = round(base / r.mean_ms, 2)
    out["roofline_ceiling"] = "tunnel-2026-08 (88 TF, 260 GB/s)"
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    M = 32
    if "--M" in sys.argv:
        M = int(sys.argv[sys.argv.index("--M") + 1])
    main(M)
