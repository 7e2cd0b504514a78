"""Shared helpers for the Pallas TPU kernels."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

MASK_VALUE = -1e7  # matches the reference's in-tile causal mask constant
LANES = 128        # TPU lane width (last-dim tile)
SUBLANES = 8       # fp32 sublane tile


@functools.cache
def default_interpret() -> bool:
    """Run Pallas kernels in interpreter mode when no TPU is attached.

    This is the CPU test path: the same kernel code is executed by the Pallas
    interpreter, so `tests/` stay green on the 8-virtual-device CPU mesh while
    the real TPU gets the compiled Mosaic kernel.
    """
    return jax.default_backend() != "tpu"


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return cdiv(x, m) * m


def fp8_e4m3_to_bf16(codes: jax.Array) -> jax.Array:
    """float8_e4m3fn -> bfloat16 via integer bit reconstruction.

    Mosaic's native fp8 cast stages through fp32 and runs ~8.5x slower
    than the int8 cast (bench/exp_fp8_convert.py: astype 0.110 ms vs this
    path 0.016 on a [1024,1024] tile — it made fp8 decode 4x slower than
    int8).  e4m3 normals map exactly: bf16_bits = (s<<15) | (em<<4) +
    0x3C00 (exponent re-bias 7 -> 127 shifted into the bf16 field);
    subnormals (|v| < 2^-6, bottom ~1.5% of the code range) flush to zero
    — below the e4m3 quantization step of any realistically-scaled cache,
    and the kernels' parity tolerances absorb it.  e4m3fn NaN codes
    (em == 0x7F) map to a bf16 quiet NaN so a NaN that slips into a
    quantized cache surfaces instead of decoding as a finite +/-448.
    Works identically in interpret mode (plain lax ops).
    """
    # Integer arithmetic stays in int32: Mosaic fails to legalize
    # `arith.shli` on packed 16-bit vectors (and canonicalizes *16 /
    # *256 multiplies back into shifts), so a uint16-domain version cannot
    # compile; i32 shifts lower fine.  The round-2 fp8-decode slowness was
    # NOT this convert but the halved KV tiles that came with the old
    # fp32-staging footprint — the tile cap is gone (kernels/decode.py).
    x = jax.lax.bitcast_convert_type(codes, jnp.int8).astype(jnp.int32) & 0xFF
    sign = (x & 0x80) << 8
    em = x & 0x7F
    bits = jnp.where(em >= 8, sign | ((em << 4) + 0x3C00), sign)
    bits = jnp.where(em == 0x7F, sign | 0x7FC0, bits)  # e4m3fn NaN -> qNaN
    return jax.lax.bitcast_convert_type(bits.astype(jnp.uint16), jnp.bfloat16)


def cast_codes(codes: jax.Array, dtype) -> jax.Array:
    """Cast int8/fp8 quantization codes to a compute dtype, routing fp8
    through the fast bit reconstruction above."""
    if codes.dtype == jnp.float8_e4m3fn:
        out = fp8_e4m3_to_bf16(codes)
        return out if dtype == jnp.bfloat16 else out.astype(dtype)
    return codes.astype(dtype)


def pad_to(x: jax.Array, axis: int, target: int, fill=0) -> jax.Array:
    """Pad `axis` of x up to length `target` with `fill` (no-op if already
    there)."""
    cur = x.shape[axis]
    if cur == target:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - cur)
    return jnp.pad(x, pads, constant_values=fill)
