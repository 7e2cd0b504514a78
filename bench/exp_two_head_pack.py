"""EXPERIMENT (r5, VERDICT r4 #3 / r3 #7): two-head d=64 block-diagonal
MXU packing — can one dot carry TWO heads' useful work?

The structural term capping both fp32 d=64 (37% of its ceiling) and the
bf16 L=2048 headline (0.675) is the half-empty d=64 MXU geometry:
`bench/exp_dot_shapes` showed the MXU charges ceil(K/128) regardless
(native K=64 == zero-padded K=128) and that N=64-column outputs run far
below N=128 ones.  Stacking two heads block-diagonally turns d=64 shapes
into d=128 shapes at the same zero fraction — whether that WINS is purely
an empirical question about how the MXU charges the stacked geometry, so
this measures every packing that the FA kernels could use, in-kernel,
useful-FLOPs accounting (zeros never counted):

  score dots (QK^T pattern, contract d):
    qk2:   two separate [bq,64]x[64,w] dots (production form)
    qk_rs: ONE [2bq,128]x[128,w]  — Q block-diag rows, K heads stacked
    qk_cs: ONE [bq,128]x[128,2w]  — Q heads concat, K block-diag cols
  PV dots (contract w, N=64 output is the slow class):
    pv2:   two separate [bq,w]x[w,64]
    pv_bd: ONE [bq,2w]x[2w,128]   — P heads concat, V block-diag (N=128)
  accumulation dots (contract bq on axis 0 — the backward's slow class):
    dv2:   two separate [bq,w]^T-contractions -> [w,64]
    dv_bd: ONE [2bq,w]^T x [2bq,128] — P stacked, dO block-diag (N=128)

Run on the chip:  python -m bench.exp_two_head_pack [--fp32]
"""

from __future__ import annotations

import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.flash_attention import _dot
from tpu_flash.utils.timing import benchmark

# Grid steps per pallas call: sized so one CALL takes several ms — the
# first chip run used GRID=32 (~30-100 us/call), inside the tunnel's
# +-5-10 ms per-call noise, and the marginal differencing collapsed to
# the 1e-9 clamp for over half the cases (runs/r5_chiplogs/
# exp_pack_bf16.log: 0.000 ms / "8589934 TF/s", pv_bd "224 TF/s" vs the
# 88 TF/s calibrated ceiling).  At bf16 production tiles one step-pair
# is ~268 MFLOP (~3.4 us at ceiling) -> 1024 steps ~ 3.5 ms/call; fp32
# tiles are ~33.5 MFLOP/step at ~5-15 TF/s -> 2048 steps ~ 5-14 ms.
GRID_BF16 = 1024
GRID_FP32 = 2048


def run_case(name, a_shapes, b_shapes, dims, n_dots, useful_flops, dtype,
             out_shape):
    GRID = GRID_FP32 if dtype == jnp.float32 else GRID_BF16
    """Times a kernel issuing ``n_dots`` dots per grid step with the given
    operand shapes (lists when the case uses two separate dots)."""
    rng = np.random.default_rng(0)
    ops = []
    for shp in a_shapes + b_shapes:
        ops.append(jnp.asarray(rng.standard_normal(shp), dtype))
    na = len(a_shapes)

    def kernel(*refs):
        arefs, brefs, o_ref = refs[:na], refs[na:-1], refs[-1]
        acc = None      # every dot in a case emits the same result shape
        for i in range(n_dots):
            a = arefs[i % na][:]
            b = brefs[i % len(brefs)][:]
            r = _dot(a, b, dims)
            acc = r if acc is None else acc + r
        o_ref[:] = acc.astype(o_ref.dtype)

    @jax.jit
    def run(*ops):
        return pl.pallas_call(
            kernel,
            grid=(GRID,),
            in_specs=[pl.BlockSpec(o.shape, lambda i, n=o.ndim: (0,) * n)
                      for o in ops],
            out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(*ops)

    r = benchmark(run, *ops, name=name, flops=useful_flops * GRID)
    print(f"{name:44s} {r.mean_ms:7.3f} ms  useful {r.tflops:6.1f} TF/s",
          flush=True)
    return r


def block_diag_note():
    # operands are random throughout: the MXU cost of a shape does not
    # depend on operand VALUES, and building true zero blocks would only
    # invite XLA sparsity folklore into a hardware-rate probe.  Useful
    # FLOPs are counted on the two heads' real work (the off-diagonal
    # zero blocks are never counted).
    pass


def main():
    fp32 = "--fp32" in sys.argv
    dtype = jnp.float32 if fp32 else jnp.bfloat16
    bq = 256 if fp32 else 512
    w = 512 if fp32 else 2048       # the production KV tiles per dtype
    d = 64
    useful = 2.0 * bq * d * w * 2   # two heads' worth per "round"

    print(f"== two-head packing probe ({'fp32' if fp32 else 'bf16'}, "
          f"bq={bq}, w={w}, d={d}; useful TF/s counts 2 heads/round ==")

    # --- score dots: contract d ---
    run_case("qk2: 2x [bq,64]x[64,w]",
             [(bq, d), (bq, d)], [(d, w), (d, w)],
             ((1,), (0,)), 2, useful, dtype, (bq, w))
    run_case("qk_rs: [2bq,128]x[128,w] row-stack",
             [(2 * bq, 2 * d)], [(2 * d, w)],
             ((1,), (0,)), 1, useful, dtype, (2 * bq, w))
    run_case("qk_cs: [bq,128]x[128,2w] col-stack",
             [(bq, 2 * d)], [(2 * d, 2 * w)],
             ((1,), (0,)), 1, useful, dtype, (bq, 2 * w))

    # --- PV dots: contract w, output width is the lever ---
    run_case("pv2: 2x [bq,w]x[w,64]",
             [(bq, w), (bq, w)], [(w, d), (w, d)],
             ((1,), (0,)), 2, useful, dtype, (bq, d))
    run_case("pv_bd: [bq,2w]x[2w,128]",
             [(bq, 2 * w)], [(2 * w, 2 * d)],
             ((1,), (0,)), 1, useful, dtype, (bq, 2 * d))

    # --- accumulation dots: contract bq on axis 0 (backward class) ---
    run_case("dv2: 2x [bq,w]^T0 x [bq,64]",
             [(bq, w), (bq, w)], [(bq, d), (bq, d)],
             ((0,), (0,)), 2, useful, dtype, (w, d))
    run_case("dv_bd: [2bq,w]^T0 x [2bq,128]",
             [(2 * bq, w)], [(2 * bq, 2 * d)],
             ((0,), (0,)), 1, useful, dtype, (w, 2 * d))


if __name__ == "__main__":
    main()
