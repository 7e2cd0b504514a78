"""EXPERIMENT: MXU dot-shape costs for the heads-minor decode design.

The heads-minor kernel must compute, per [bs, H*d] cache tile:
  scores: K_tile [bs, 512] @ Qbd [512, N]   (N = H=8 raw or 128 padded)
  pv:     P^T [M, bs] @ V_tile [bs, 512]    (M = H=8 raw or 128 padded)

Measure each in isolation inside a minimal Pallas kernel (chained over a
grid so DMA of the tile is part of the loop, like the real kernel).

Run:  python -m bench.exp_hm_dots
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.utils.timing import benchmark

B, S, HD = 8, 8192, 512
BS = 1024
NUM = S // BS


def _kernel(x_ref, w_ref, o_ref, acc_ref, *, mode):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0]                      # [bs, 512] bf16
    w = w_ref[...]                    # [512, N] or [M, bs]
    if mode == "scores":
        r = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [bs, N]
        rs = jnp.sum(r, axis=0, keepdims=True)      # [1, N]
        n = rs.shape[-1]
        if n >= 128:
            acc_ref[:] += rs[:, :128]
        else:
            acc_ref[:, :n] += rs
    else:  # pv
        r = jax.lax.dot_general(
            w, x, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)     # [M, 512]
        acc_ref[:] += jnp.sum(r, axis=0, keepdims=True)[:, :128]

    @pl.when(j == NUM - 1)
    def _fin():
        o_ref[0] = jnp.full_like(o_ref[0], jnp.sum(acc_ref[:]))


def run(x, w, mode):
    return pl.pallas_call(
        functools.partial(_kernel, mode=mode),
        grid=(B, NUM),
        in_specs=[
            pl.BlockSpec((1, BS, HD), lambda b, j: (b, j, 0)),
            pl.BlockSpec(w.shape, lambda b, j: tuple(0 for _ in w.shape)),
        ],
        out_specs=pl.BlockSpec((1, 8, 128), lambda b, j: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
        scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w)


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, HD)), jnp.bfloat16)
    nbytes = x.size * 2

    cases = {
        "stream_only": ("scores", jnp.zeros((HD, 8), jnp.bfloat16)),
        "scores_N8": ("scores", jnp.asarray(
            rng.standard_normal((HD, 8)), jnp.bfloat16)),
        "scores_N128": ("scores", jnp.asarray(
            rng.standard_normal((HD, 128)), jnp.bfloat16)),
        "pv_M8": ("pv", jnp.asarray(
            rng.standard_normal((8, BS)), jnp.bfloat16)),
        "pv_M128": ("pv", jnp.asarray(
            rng.standard_normal((128, BS)), jnp.bfloat16)),
    }
    for name, (mode, w) in cases.items():
        if name == "stream_only":
            mode = "scores"
        r = benchmark(lambda x, w=w, mode=mode: run(x, w, mode), x, name=name)
        print(f"{name}: {r.mean_ms:.3f} ms  "
              f"({nbytes / (r.mean_ms * 1e-3) / 1e9:.0f} GB/s streamed)",
              flush=True)


if __name__ == "__main__":
    main()
