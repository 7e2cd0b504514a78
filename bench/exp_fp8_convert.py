"""EXPERIMENT: why is the fp8 decode cache 4x slower than int8?

bench_decode_model measured fp8 at 16.7 ms/step vs int8 4.2 on identical
shapes — suspicion: Mosaic's fp8->bf16 conversion path.  Probe a
decode-like kernel (load [block_s, HD] code tile, convert, dot against a
[M, HD] query block) across:

  int8      codes int8, .astype(bf16)
  fp8       codes float8_e4m3fn, .astype(bf16)
  fp8-f32   codes fp8, .astype(f32).astype(bf16) (explicit staging)
  fp8-bits  codes BITCAST to int8, bf16 reconstructed with integer ops
            (normals: bf16_bits = (s<<15) | (em<<4) + 0x3C00; zero/
            subnormals flushed to 0) — the candidate fast path

Run:  python -m bench.exp_fp8_convert
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.utils.timing import benchmark

M, HD, BS, STEPS = 16, 1024, 1024, 8   # one [BS, HD] tile per grid step


def _fp8_bits_to_bf16(codes_i8):
    """int8-bitcast e4m3 codes -> bf16 via integer ops (FTZ subnormals)."""
    x = codes_i8.astype(jnp.int32) & 0xFF
    sign = (x & 0x80) << 8
    em = x & 0x7F
    normal = em >= 8                       # e4m3 exponent field != 0
    bits = jnp.where(normal, sign | ((em << 4) + 0x3C00), sign)
    return jax.lax.bitcast_convert_type(
        bits.astype(jnp.uint16), jnp.bfloat16)


def make(mode):
    cdt = jnp.int8 if mode in ("int8", "fp8-bits") else jnp.float8_e4m3fn

    def kernel(q_ref, k_ref, o_ref):
        kt = k_ref[0]
        if mode == "int8":
            kb = kt.astype(jnp.bfloat16)
        elif mode == "fp8":
            kb = kt.astype(jnp.bfloat16)
        elif mode == "fp8-f32":
            kb = kt.astype(jnp.float32).astype(jnp.bfloat16)
        elif mode == "fp8-bits":
            kb = _fp8_bits_to_bf16(kt)
        s = jax.lax.dot_general(
            q_ref[0], kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
        o_ref[:] += s.astype(o_ref.dtype)

    @jax.jit
    def run(q, k):
        return pl.pallas_call(
            kernel,
            grid=(STEPS,),
            in_specs=[
                pl.BlockSpec((1, M, HD), lambda i: (0, 0, 0)),
                pl.BlockSpec((1, BS, HD), lambda i: (i, 0, 0)),
            ],
            out_specs=pl.BlockSpec((M, BS), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((M, BS), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(q, k)

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, M, HD)), jnp.bfloat16)
    if cdt == jnp.int8:
        k = jnp.asarray(rng.integers(-127, 127, (STEPS, BS, HD)), jnp.int8)
    else:
        k = jnp.asarray(rng.standard_normal((STEPS, BS, HD)), cdt)
    return run, (q, k)


def main():
    # numeric check of the bit reconstruction first (CPU-safe jnp)
    vals = jnp.asarray(
        np.random.default_rng(0).standard_normal(4096) * 8, jnp.float8_e4m3fn)
    got = _fp8_bits_to_bf16(jax.lax.bitcast_convert_type(vals, jnp.int8))
    ref = vals.astype(jnp.bfloat16)
    sub = jnp.abs(vals.astype(jnp.float32)) < 2.0 ** -6
    err = float(jnp.max(jnp.where(sub, 0.0,
                                  jnp.abs(got.astype(jnp.float32)
                                          - ref.astype(jnp.float32)))))
    print(f"bit-reconstruction max err (normals): {err:.2e} "
          f"({int(jnp.sum(sub))} subnormals flushed)", flush=True)

    for mode in ("int8", "fp8", "fp8-f32", "fp8-bits"):
        run, args = make(mode)
        r = benchmark(run, *args, name=mode)
        print(f"{mode:9s} {r.mean_ms:7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
