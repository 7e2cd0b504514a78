"""Fused LayerNorm Pallas kernels (forward + backward).

TPU-native equivalent of the reference's LightSeq-derived CUDA kernels
``launch_layernorm`` / ``launch_layernorm_bw``
(src/layernorm_kernel.cu:116-177,379-453 in pdrebello/flash-attention-minitorch).

Behavioral parity:
  * forward returns the triple ``(y, mean, var)`` — the saved statistics the
    backward consumes (src/layernorm_kernel.cu:64-74);
  * ``eps = 1e-8`` inside the rsqrt (LN_EPSILON, src/layernorm_kernel.cu:13);
  * backward computes
    ``dx = (dxhat - (sum(dxhat) + xhat * sum(dxhat*xhat)) / H) * rsqrt(var+eps)``
    (src/layernorm_kernel.cu:317-377) and column-reduced dgamma/dbeta
    (src/layernorm_kernel.cu:223-271).

Unlike the CUDA version there is no ``hidden % 4 == 0`` or ``hidden <= 4096``
restriction — rows are tiled over the grid with the full hidden axis in VMEM.
dgamma/dbeta are produced as per-row-tile partials and reduced by XLA (the
race-free analog of the reference's two-kernel, two-stream split).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.common import default_interpret, pad_to, round_up

LN_EPS = 1e-8


def _pick_block_rows(n_rows: int, hidden: int) -> int:
    budget = (2 * 1024 * 1024) // max(1, 4 * hidden)
    block = max(8, min(1024, budget - budget % 8))
    return min(block, round_up(n_rows, 8))


def _fwd_kernel(x_ref, g_ref, b_ref, y_ref, mean_ref, var_ref):
    x = x_ref[:].astype(jnp.float32)               # [br, H]
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(x * x, axis=-1, keepdims=True) - mean * mean
    xhat = (x - mean) * jax.lax.rsqrt(var + LN_EPS)
    y_ref[:] = (xhat * g_ref[:] + b_ref[:]).astype(y_ref.dtype)
    mean_ref[:] = mean                              # [br, 1] blocks
    var_ref[:] = var


@functools.partial(jax.jit, static_argnames=("interpret",))
def layernorm_forward(
    x: jax.Array, gamma: jax.Array, beta: jax.Array,
    *, interpret: bool | None = None,
):
    """Row LayerNorm over the last axis. Returns (y, mean, var)."""
    if interpret is None:
        interpret = default_interpret()
    orig_shape = x.shape
    H = orig_shape[-1]
    R = 1
    for s in orig_shape[:-1]:
        R *= s
    x2 = x.reshape(R, H)

    block_r = _pick_block_rows(R, H)
    pR = round_up(R, block_r)
    x2 = pad_to(x2, 0, pR)
    g2 = gamma.reshape(1, H)
    b2 = beta.reshape(1, H)

    y, mean, var = pl.pallas_call(
        _fwd_kernel,
        grid=(pR // block_r,),
        in_specs=[
            pl.BlockSpec((block_r, H), lambda r: (r, 0)),
            pl.BlockSpec((1, H), lambda r: (0, 0)),
            pl.BlockSpec((1, H), lambda r: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_r, H), lambda r: (r, 0)),
            pl.BlockSpec((block_r, 1), lambda r: (r, 0)),
            pl.BlockSpec((block_r, 1), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pR, H), x.dtype),
            jax.ShapeDtypeStruct((pR, 1), jnp.float32),
            jax.ShapeDtypeStruct((pR, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, g2, b2)
    y = y[:R].reshape(orig_shape)
    mean = mean[:R, 0].reshape(orig_shape[:-1])
    var = var[:R, 0].reshape(orig_shape[:-1])
    return y, mean, var


def _bwd_kernel(dy_ref, x_ref, g_ref, mean_ref, var_ref,
                dx_ref, dg_ref, db_ref):
    dy = dy_ref[:].astype(jnp.float32)             # [br, H]
    x = x_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)               # [1, H]
    mean = mean_ref[:]                             # [br, 1]
    var = var_ref[:]
    H = x.shape[-1]

    rstd = jax.lax.rsqrt(var + LN_EPS)
    xhat = (x - mean) * rstd
    dxhat = dy * g
    dx = (dxhat
          - (jnp.sum(dxhat, axis=-1, keepdims=True)
             + xhat * jnp.sum(dxhat * xhat, axis=-1, keepdims=True)) / H) * rstd
    dx_ref[:] = dx.astype(dx_ref.dtype)
    # Partials are written into an 8-row slab per tile (Mosaic's minimum
    # sublane tile); only row 0 is nonzero, XLA sums the slabs afterwards.
    rows = jax.lax.broadcasted_iota(jnp.int32, (8, H), 0)
    dg_ref[:] = jnp.where(rows == 0, jnp.sum(dy * xhat, axis=0)[None, :], 0.0)
    db_ref[:] = jnp.where(rows == 0, jnp.sum(dy, axis=0)[None, :], 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def layernorm_backward(
    dy: jax.Array, x: jax.Array, gamma: jax.Array,
    mean: jax.Array, var: jax.Array,
    *, interpret: bool | None = None,
):
    """Backward of layernorm_forward. Returns (dx, dgamma, dbeta)."""
    if interpret is None:
        interpret = default_interpret()
    orig_shape = x.shape
    H = orig_shape[-1]
    R = 1
    for s in orig_shape[:-1]:
        R *= s
    dy2 = dy.reshape(R, H)
    x2 = x.reshape(R, H)
    m2 = mean.reshape(R)
    v2 = var.reshape(R)

    block_r = _pick_block_rows(R, H)
    pR = round_up(R, block_r)
    n_tiles = pR // block_r
    dy2 = pad_to(dy2, 0, pR)
    x2 = pad_to(x2, 0, pR)
    m2 = pad_to(m2, 0, pR)[:, None]
    v2 = pad_to(v2, 0, pR)[:, None]
    g2 = gamma.reshape(1, H)

    dx, dg_part, db_part = pl.pallas_call(
        _bwd_kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((block_r, H), lambda r: (r, 0)),
            pl.BlockSpec((block_r, H), lambda r: (r, 0)),
            pl.BlockSpec((1, H), lambda r: (0, 0)),
            pl.BlockSpec((block_r, 1), lambda r: (r, 0)),
            pl.BlockSpec((block_r, 1), lambda r: (r, 0)),
        ],
        out_specs=[
            pl.BlockSpec((block_r, H), lambda r: (r, 0)),
            pl.BlockSpec((8, H), lambda r: (r, 0)),
            pl.BlockSpec((8, H), lambda r: (r, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((pR, H), x.dtype),
            jax.ShapeDtypeStruct((n_tiles * 8, H), jnp.float32),
            jax.ShapeDtypeStruct((n_tiles * 8, H), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(dy2, x2, g2, m2, v2)

    dx = dx[:R].reshape(orig_shape)
    dgamma = jnp.sum(dg_part, axis=0).astype(gamma.dtype)
    dbeta = jnp.sum(db_part, axis=0).astype(gamma.dtype)
    return dx, dgamma, dbeta
