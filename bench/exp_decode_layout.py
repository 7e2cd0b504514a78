"""EXPERIMENT: does the KV-cache memory LAYOUT set the decode kernel's
~380 GB/s ceiling?

Read-only streaming probes over the same 67 MB of cache bytes in three
layouts (each a minimal Pallas kernel that must consume every tile):

  a) [B, H, S, d]   tiles (1, H, bs, d)   — the production decode pattern
                     (per tile: H strided slabs of bs*d)
  b) [B, S, H*d]    tiles (1, bs, H*d)    — heads-minor: one fully
                     contiguous slab per tile
  c) [B*H, S, d]    tiles (1, bs, d), grid (B*H, S/bs) — per-head
                     contiguous but H-times-smaller DMAs

Run:  python -m bench.exp_decode_layout
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.utils.timing import benchmark

B, H, S, d = 8, 8, 8192, 64
BS = 1024


def _probe_kernel(x_ref, o_ref, acc_ref, *, num_s):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # touch every element so no DMA can be elided; trivial VPU cost
    acc_ref[:] += jnp.sum(x_ref[...].astype(jnp.float32))

    @pl.when(j == num_s - 1)
    def _fin():
        o_ref[0] = jnp.full_like(o_ref[0], acc_ref[0])  # [8, 128]


def probe(x, block_spec, grid, out_rows):
    num_s = grid[1]
    return pl.pallas_call(
        functools.partial(_probe_kernel, num_s=num_s),
        grid=grid,
        in_specs=[block_spec],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, j: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((out_rows, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x)


def main():
    rng = np.random.default_rng(0)
    base = rng.standard_normal((B, H, S, d)).astype(np.float32)
    nbytes = base.size * 2

    a = jnp.asarray(base, jnp.bfloat16)                       # [B,H,S,d]
    bmat = jnp.asarray(
        base.transpose(0, 2, 1, 3).reshape(B, S, H * d), jnp.bfloat16)
    c = jnp.asarray(base.reshape(B * H, S, d), jnp.bfloat16)

    runs = {
        "a_BHSd": (a, pl.BlockSpec((1, H, BS, d), lambda b, j: (b, 0, j, 0)),
                   (B, S // BS), B),
        "b_BS_Hd": (bmat, pl.BlockSpec((1, BS, H * d),
                                       lambda b, j: (b, j, 0)),
                    (B, S // BS), B),
        "c_BH_Sd": (c, pl.BlockSpec((1, BS, d), lambda b, j: (b, j, 0)),
                    (B * H, S // BS), B * H),
    }
    for name, (x, spec, grid, rows) in runs.items():
        r = benchmark(lambda x, spec=spec, grid=grid, rows=rows:
                      probe(x, spec, grid, rows), x, name=name)
        print(f"{name}: {r.mean_ms:.3f} ms = "
              f"{nbytes / (r.mean_ms * 1e-3) / 1e9:.0f} GB/s", flush=True)


if __name__ == "__main__":
    main()
