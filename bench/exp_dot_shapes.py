"""EXPERIMENT: MXU rates for the EXACT dot shapes the FA2 kernels issue.

Round 1 recorded generic cliffs ("K=64: 53-78, padded: 115-154, N=65: 117")
— ranges too wide to decide per-dot whether contraction padding pays.  This
times every dot the forward/backward actually performs, native vs padded,
inside a minimal Pallas kernel (so rates include VMEM operand realities,
not XLA fusion artifacts).  Useful TFLOP/s = counted on the UNPADDED macs.

Run:  python -m bench.exp_dot_shapes
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


def make_dot(M, K, N, dims, reps):
    """A pallas kernel that issues `reps` independent [M,K]x[K,N] (or the
    transposed-contraction form per dims) dots per grid step and sums them
    into the output, over a 32-step grid (mimics per-(batch,head) looping).
    """
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros((M, N), jnp.float32)
        for r in range(reps):
            acc += _dot(a_ref[r], b_ref[r], dims)
        o_ref[:] = acc.astype(o_ref.dtype)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(32,),
            in_specs=[
                pl.BlockSpec((reps,) + a.shape[1:], lambda i: (0, 0, 0)),
                pl.BlockSpec((reps,) + b.shape[1:], lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((M, N), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(a, b)

    return run


def time_dot(name, M, K, N, *, contract_last_b=False, reps=4, useful_k=None,
             dtype=jnp.bfloat16):
    """contract_last_b: dims contract a's axis1 with b's axis1 ([N,K] layout,
    the QK^T pattern); else a1 x b0 ([K,N], the PV pattern).  dtype=fp32
    runs the kernels' exact-parity mode: _dot pins Precision.HIGHEST for
    fp32 operands, so this measures the fp32 in-kernel ceiling per shape
    (VERDICT r2 #8)."""
    rng = np.random.default_rng(0)
    if contract_last_b:
        b_shape, dims = (reps, N, K), (((1,), (1,)))
    else:
        b_shape, dims = (reps, K, N), (((1,), (0,)))
    a = jnp.asarray(rng.standard_normal((reps, M, K)), dtype)
    b = jnp.asarray(rng.standard_normal(b_shape), dtype)
    run = make_dot(M, K, N, dims, reps)
    flops = 2.0 * M * (useful_k or K) * N * reps * 32
    r = benchmark(run, a, b, name=name, flops=flops)
    print(f"{name:44s} {r.mean_ms:7.3f} ms  useful {r.tflops:6.1f} TF/s",
          flush=True)
    return r


def main():
    import sys
    if "--fp32" in sys.argv:
        # fp32 HIGHEST-precision ceiling per kernel dot shape (the exact-
        # parity mode's in-kernel roofline; fp32 contraction is multi-pass
        # on the bf16 MXU)
        print("== fp32 HIGHEST in-kernel ceilings ==", flush=True)
        for name, args, kw in [
            ("fw QK d=64 [512x1024]", (512, 64, 1024),
             dict(contract_last_b=True)),
            ("fw QK d=128 [512x1024]", (512, 128, 1024),
             dict(contract_last_b=True, reps=2)),
            ("fw PV N=65 [512,1024]", (512, 1024, 65), dict(reps=2)),
            ("fw PV N=129 d=128", (512, 1024, 129), dict(reps=2)),
            ("bw QK d=64 [512x512]", (512, 64, 512),
             dict(contract_last_b=True)),
            ("bw dV/dK [512c]x[.,65]", (512, 512, 65), dict(reps=2)),
        ]:
            time_dot(name, *args, dtype=jnp.float32, **kw)
        return
    print("== forward QK^T: [512,K]x[K,1024] (contract d) ==", flush=True)
    time_dot("fw QK native d=64", 512, 64, 1024, contract_last_b=True)
    time_dot("fw QK padded d=64->128", 512, 128, 1024,
             contract_last_b=True, useful_k=64)
    time_dot("fw QK native d=128", 512, 128, 1024, contract_last_b=True)
    time_dot("fw QK native d=64 M=1024", 1024, 64, 1024,
             contract_last_b=True, reps=2)
    time_dot("fw QK padded d=64->128 M=1024", 1024, 128, 1024,
             contract_last_b=True, reps=2, useful_k=64)

    print("== forward PV: [512,1024]x[1024,N] ==", flush=True)
    time_dot("fw PV N=65", 512, 1024, 65)
    time_dot("fw PV N=64", 512, 1024, 64)
    time_dot("fw PV N=128", 512, 1024, 128)

    print("== backward (512x512 tiles) ==", flush=True)
    time_dot("bw QK/dOV native d=64 [512x512]", 512, 64, 512,
             contract_last_b=True)
    time_dot("bw QK/dOV padded d=64->128 [512x512]", 512, 128, 512,
             contract_last_b=True, useful_k=64)
    time_dot("bw dV/dK: [512,512]^T x [512,65]", 512, 512, 65)
    time_dot("bw dQ: [512,512]x[512,65]", 512, 512, 65)

    print("== backward (512x1024 tiles) ==", flush=True)
    time_dot("bw QK native d=64 [512x1024]", 512, 64, 1024,
             contract_last_b=True)
    time_dot("bw dV/dK: [1024c]x[.,65] M=1024", 1024, 512, 65, reps=2)


if __name__ == "__main__":
    main()
