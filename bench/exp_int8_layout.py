"""EXPERIMENT: where does the in-kernel int8 KV cost actually sit?

Probes the primitive that remains after the bf16-direct dequant fix still
left int8 +35%: a minimal kernel that streams a KV-sized int8 tile,
converts (+scales), dots it against Q, and accumulates.  Variants:

  bf16          K tile loaded bf16 [1024, 64]                (baseline)
  i8-dmaj       K codes int8 [1024, 64] (d-minor, HALF-POPULATED int8
                tiles: min int8 tile is 32x128) -> convert -> scale -> dot
  i8-dmaj-raw   same but convert only (scale folded into scores after)
  i8-tmaj       K codes int8 [64, 1024] (d-major, fully-populated tiles)
                -> convert -> dot q*kT, scores scaled per column
  bf16-tmaj     K bf16 [64, 1024] transposed dot            (layout ctrl)

Each kernel does 8 grid steps x 4 (tile convert + [512,64]x[64,1024]-dot)
— enough work per step to be realistic, small enough to isolate the
convert path.

Run:  python -m bench.exp_int8_layout
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.flash_attention import _dot
from tpu_flash.utils.timing import benchmark

BQ, BK, D, REPS, STEPS = 512, 1024, 64, 4, 8


def make(mode):
    def kernel(q_ref, k_ref, s_ref, o_ref):
        acc = jnp.zeros((BQ, BK), jnp.float32)
        for r in range(REPS):
            if mode == "bf16":
                kt = k_ref[r]                                  # [BK, D]
                s2 = _dot(q_ref[0], kt, ((1,), (1,)))
            elif mode == "i8-dmaj":
                kt = k_ref[r].astype(jnp.bfloat16) * s_ref[r].astype(
                    jnp.bfloat16)                              # [BK, D]
                s2 = _dot(q_ref[0], kt, ((1,), (1,)))
            elif mode == "i8-dmaj-raw":
                kt = k_ref[r].astype(jnp.bfloat16)
                s2 = _dot(q_ref[0], kt, ((1,), (1,)))
                s2 = s2 * s_ref[r][:, 0][None, :]              # wrong, timed
            elif mode == "i8-tmaj":
                kt = k_ref[r].astype(jnp.bfloat16)             # [D, BK]
                s2 = _dot(q_ref[0], kt, ((1,), (0,)))
                s2 = s2 * s_ref[r]                             # [1, BK]
            elif mode == "bf16-tmaj":
                kt = k_ref[r]                                  # [D, BK]
                s2 = _dot(q_ref[0], kt, ((1,), (0,)))
            acc += s2
        o_ref[:] = acc.astype(o_ref.dtype)

    if mode in ("bf16", "i8-dmaj", "i8-dmaj-raw"):
        kshape, sshape = (REPS, BK, D), (REPS, BK, 1)
    else:
        kshape, sshape = (REPS, D, BK), (REPS, 1, BK)
    kdt = jnp.bfloat16 if mode.startswith("bf16") else jnp.int8

    @jax.jit
    def run(q, k, s):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((1, BQ, D), lambda i: (0, 0, 0)),
                pl.BlockSpec(kshape, lambda i: (0, 0, 0)),
                pl.BlockSpec(sshape, lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BQ, BK), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((BQ, BK), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(q, k, s)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, BQ, D)), jnp.bfloat16)
    k = jnp.asarray(rng.integers(-127, 127, kshape), kdt) if kdt == jnp.int8 \
        else jnp.asarray(rng.standard_normal(kshape), kdt)
    s = jnp.asarray(rng.random(sshape) + 0.5, jnp.float32)
    flops = 2.0 * BQ * D * BK * REPS * STEPS
    return run, (q, k, s), flops


def main():
    for mode in ("bf16", "bf16-tmaj", "i8-dmaj", "i8-dmaj-raw", "i8-tmaj"):
        run, args, flops = make(mode)
        r = benchmark(run, *args, name=mode, flops=flops)
        print(f"{mode:12s} {r.mean_ms:7.3f} ms  {r.tflops:6.1f} TF/s",
              flush=True)


if __name__ == "__main__":
    main()
