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


def pad_to(x: jax.Array, axis: int, target: int, fill=0) -> jax.Array:
    """Pad `axis` of x up to length `target` with `fill` (no-op if already
    there)."""
    cur = x.shape[axis]
    if cur == target:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis] = (0, target - cur)
    return jnp.pad(x, pads, constant_values=fill)
