"""Quantized-compute Pallas kernels: INT8 weight-only matmul with dequant
fused into the kernel.

New capability relative to the reference, which ships only INT8 *harness*
helpers and unimplemented LightSeq i8 kernel declarations
(test_utils.py:65-88, src/includes/kernels.h:29-47 — SURVEY.md §5.9); this
is the direction that lineage points.

Design: weights are stored int8 with per-output-channel fp32 scales
(symmetric).  The kernel streams int8 weight tiles from HBM (half/quarter
the bandwidth of bf16/fp32 — the whole point for bandwidth-bound decode),
casts tiles to the activation dtype in VMEM, runs the MXU dot with fp32
accumulation, and applies the channel scales once in the epilogue.  XLA's
alternative materializes a dequantized copy of the full weight matrix in
HBM; fusing dequant into the tile loop never spills it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.common import default_interpret, pad_to, round_up


class QuantizedLinearWeights(NamedTuple):
    """int8 codes [K, N] + per-output-channel scales [N] (+ optional fp bias)."""
    codes: jax.Array
    scales: jax.Array
    bias: jax.Array | None = None


def quantize_weight(w: jax.Array, *, axis: int = 0) -> tuple[jax.Array, jax.Array]:
    """Symmetric per-channel int8 quantization of a [K, N] weight matrix;
    ``axis`` is the reduction (input) axis. Returns (codes int8, scales f32)."""
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=axis)
    scales = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    codes = jnp.clip(
        jnp.round(w.astype(jnp.float32) / scales), -127, 127
    ).astype(jnp.int8)
    return codes, scales.astype(jnp.float32)


def _matmul_kernel(x_ref, w_ref, s_ref, o_ref, acc_ref, *, num_k):
    """Grid (M/bm, N/bn, K/bk), K innermost; acc persists across K steps."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]                                  # [bm, bk] activation dtype
    w = w_ref[:].astype(x.dtype)                  # int8 -> act dtype in VMEM
    acc_ref[:] += jax.lax.dot_general(
        x, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == num_k - 1)
    def _epilogue():
        o_ref[:] = (acc_ref[:] * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("block_m", "block_n", "block_k", "interpret", "out_dtype"),
)
def int8_matmul(
    x: jax.Array,            # [M, K] fp32/bf16
    codes: jax.Array,        # [K, N] int8
    scales: jax.Array,       # [N] fp32
    *,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 512,
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """out[M, N] = (x @ dequant(codes)) with dequant fused into the tiles."""
    if interpret is None:
        interpret = default_interpret()
    if out_dtype is None:
        out_dtype = x.dtype
    M, K = x.shape
    K2, N = codes.shape
    assert K == K2, (x.shape, codes.shape)

    block_m = min(block_m, round_up(M, 8))
    block_n = min(block_n, round_up(N, 128))
    block_k = min(block_k, round_up(K, 128))
    pM, pN, pK = (round_up(M, block_m), round_up(N, block_n),
                  round_up(K, block_k))

    xp = pad_to(pad_to(x, 0, pM), 1, pK)
    cp = pad_to(pad_to(codes, 0, pK), 1, pN)
    sp = pad_to(scales.reshape(1, N), 1, pN)

    num_k = pK // block_k
    out = pl.pallas_call(
        functools.partial(_matmul_kernel, num_k=num_k),
        grid=(pM // block_m, pN // block_n, num_k),
        in_specs=[
            pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
            pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j)),
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((pM, pN), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(xp, cp, sp)
    return out[:M, :N]


# ---------------------------------------------------------------------------
# Differentiable wrapper (x gets gradients; weights are frozen codes)
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _int8_linear(x, codes, scales):
    return int8_matmul(x, codes, scales)


def _int8_linear_fwd(x, codes, scales):
    return int8_matmul(x, codes, scales), (codes, scales)


def _int8_linear_bwd(res, dy):
    codes, scales = res
    # dx = dy @ W^T with W = codes * scales (channel scales fold into dy)
    dy_scaled = dy.astype(jnp.float32) * scales
    dx = int8_matmul(
        dy_scaled.astype(dy.dtype), codes.T,
        jnp.ones((codes.shape[0],), jnp.float32))
    return dx, None, None


_int8_linear.defvjp(_int8_linear_fwd, _int8_linear_bwd)


def int8_linear(x: jax.Array, qw: QuantizedLinearWeights) -> jax.Array:
    """Linear layer with int8 weights; differentiable in x only.

    Accepts [..., K] activations (leading dims flattened for the kernel)."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    M = 1
    for s in lead:
        M *= s
    out = _int8_linear(x.reshape(M, K), qw.codes, qw.scales)
    if qw.bias is not None:
        out = out + qw.bias
    return out.reshape(*lead, qw.codes.shape[1])
