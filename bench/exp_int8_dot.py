"""EXPERIMENT: does the MXU run int8 x int8 dots at 2x bf16 rate in-kernel?

If yes, quantizing Q per-row (symmetric int8, like the KV codes) would let
the QK^T recompute run entirely in int8 with a rank-1 fp32 rescale of the
scores (qscale[row] * kscale[col] — two hidden-VPU multiplies), roughly
halving the dominant dot of the d=64 headline.  This probes the primitive:

  bf16        [512,64]x[64,1024] bf16 dot  (today's QK)
  int8-s32    same shape, int8 operands, preferred_element_type=int32
  int8-f32    int8 operands, fp32 accumulate
  int8-s32-K128  contraction padded to 128 (charge model probe)

Run:  python -m bench.exp_int8_dot
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.utils.timing import benchmark

BQ, BK, REPS, STEPS = 512, 1024, 4, 8


def make(mode, K):
    adt = jnp.bfloat16 if mode == "bf16" else jnp.int8
    acc_dt = jnp.int32 if "s32" in mode else jnp.float32

    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((BQ, BK), acc_dt)
        for r in range(REPS):
            acc += jax.lax.dot_general(
                a_ref[r], b_ref[r], (((1,), (1,)), ((), ())),
                preferred_element_type=acc_dt)
        o_ref[:] = acc.astype(o_ref.dtype)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((REPS, BQ, K), lambda i: (0, 0, 0)),
                pl.BlockSpec((REPS, BK, K), lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((BQ, BK), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((BQ, BK), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(a, b)

    rng = np.random.default_rng(0)
    if adt == jnp.int8:
        a = jnp.asarray(rng.integers(-127, 127, (REPS, BQ, K)), jnp.int8)
        b = jnp.asarray(rng.integers(-127, 127, (REPS, BK, K)), jnp.int8)
    else:
        a = jnp.asarray(rng.standard_normal((REPS, BQ, K)), adt)
        b = jnp.asarray(rng.standard_normal((REPS, BK, K)), adt)
    flops = 2.0 * BQ * 64 * BK * REPS * STEPS   # useful (d=64) flops
    return run, (a, b), flops


def main():
    for mode, K in (("bf16", 64), ("int8-s32", 64), ("int8-f32", 64),
                    ("int8-s32", 128), ("bf16", 128)):
        try:
            run, args, flops = make(mode, K)
            r = benchmark(run, *args, name=f"{mode}-K{K}", flops=flops)
            print(f"{mode:12s} K={K:4d} {r.mean_ms:7.3f} ms  "
                  f"useful(d=64) {r.tflops:6.1f} TF/s", flush=True)
        except Exception as e:  # lowering may be unsupported
            print(f"{mode:12s} K={K:4d} FAILED: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
