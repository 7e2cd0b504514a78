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


# ---------------------------------------------------------------------------
# INT4 weight-only matmul (split-half K packing)
# ---------------------------------------------------------------------------

class QuantizedLinearWeights4(NamedTuple):
    """Packed int4 codes [K/2, N] (uint8, two codes per byte) + fp32 scales
    (per-output-channel [N], or group-wise [K/group, N]) (+ optional fp
    bias).  ``k_dim`` remembers the true (pre-padding) K."""
    codes: jax.Array
    scales: jax.Array
    k_dim: int
    bias: jax.Array | None = None


def quantize_weight_int4(w: jax.Array, *, group_size: int | None = None,
                         allow_small_groups: bool = False
                         ) -> tuple[jax.Array, jax.Array, int]:
    """Symmetric int4 quantization of a [K, N] weight.

    Codes live in [-7, 7], stored biased by +8 in a nibble.  Packing pairs
    SPLIT HALVES of K — byte row i holds (k=i) in the low nibble and
    (k=K/2+i) in the high nibble — so the kernel unpacks a tile into two
    K-contiguous sub-tiles (one dot each) instead of interleaving rows,
    which Mosaic would lower as a relayout.

    ``group_size``: scales per (K-group, channel) instead of per channel —
    the GPTQ/AWQ-style grouping that makes 4-bit usable (per-channel int4
    on N(0,1) weights carries ~11% matmul error; g=128 cuts it roughly in
    half).  Groups are contiguous K ranges, so each kernel slab covers
    whole groups.  Requires ``K % (2 * group_size) == 0``.  Returns
    (packed uint8 [K'/2, N], scales f32 [N] or [K/g, N], original K)."""
    K, N = w.shape
    if group_size is not None:
        g = int(group_size)
        if K % (2 * g):
            raise ValueError(
                f"group_size={g} requires K % (2*group_size) == 0 (K={K}): "
                f"the split-half packing needs whole groups per half")
        if g < 128 and not allow_small_groups:
            # the grouped kernel contracts exactly one group per dot, and
            # sub-128 contractions hit the measured Mosaic MXU cliff
            # (CLAUDE.md: "pad K=64 contractions to 128") — the bandwidth
            # win would be eaten by compute underutilization on the chip
            raise ValueError(
                f"group_size={g} < 128 underutilizes the MXU (one group = "
                f"one dot contraction); use group_size>=128, or pass "
                f"allow_small_groups=True for tests/interpret mode")
        wf = w.astype(jnp.float32).reshape(K // g, g, N)
        amax = jnp.max(jnp.abs(wf), axis=1)                   # [K/g, N]
        scales = jnp.where(amax == 0.0, 1.0, amax / 7.0)
        v = jnp.clip(jnp.round(wf / scales[:, None, :]), -7, 7) + 8.0
        v = v.reshape(K, N).astype(jnp.uint8)
        packed = v[: K // 2] | (v[K // 2:] << 4)
        return packed, scales.astype(jnp.float32), K
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=0)
    scales = jnp.where(amax == 0.0, 1.0, amax / 7.0)
    v = jnp.clip(jnp.round(w.astype(jnp.float32) / scales), -7, 7) + 8.0
    v = v.astype(jnp.uint8)
    if K % 2:
        v = jnp.pad(v, ((0, 1), (0, 0)), constant_values=8)  # code 8 == 0.0
        K += 1
    packed = v[: K // 2] | (v[K // 2:] << 4)
    return packed, scales.astype(jnp.float32), w.shape[0]


def _matmul4_kernel(xlo_ref, xhi_ref, w_ref, s_ref, o_ref, acc_ref, *,
                    num_k):
    """Grid (M/bm, N/bn, K2/bk2), K innermost.  Each packed tile holds the
    lo-nibble rows for x's columns [k*bk2, ...) and the hi-nibble rows for
    columns [K/2 + k*bk2, ...) — xlo/xhi are the SAME array with offset
    index maps, so both dots contract against K-contiguous slabs."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xlo = xlo_ref[:]
    xhi = xhi_ref[:]
    w = w_ref[:].astype(jnp.int32)
    lo = ((w & 0xF) - 8).astype(xlo.dtype)
    hi = ((w >> 4) - 8).astype(xlo.dtype)
    acc_ref[:] += jax.lax.dot_general(
        xlo, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        xhi, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(kk == num_k - 1)
    def _epilogue():
        o_ref[:] = (acc_ref[:]
                    * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _matmul4_group_kernel(xlo_ref, xhi_ref, w_ref, slo_ref, shi_ref, o_ref,
                          acc_ref, *, num_k):
    """Group-wise-scale variant of :func:`_matmul4_kernel`: each slab is
    exactly one quantization group (block_k == group_size), so its [1, bn]
    scale row multiplies the slab's dot result before accumulation — the
    only placement that is exact when scales vary along K."""
    kk = pl.program_id(2)

    @pl.when(kk == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xlo = xlo_ref[:]
    xhi = xhi_ref[:]
    w = w_ref[:].astype(jnp.int32)
    lo = ((w & 0xF) - 8).astype(xlo.dtype)
    hi = ((w >> 4) - 8).astype(xlo.dtype)
    acc_ref[:] += jax.lax.dot_general(
        xlo, lo, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * slo_ref[:].astype(jnp.float32)
    acc_ref[:] += jax.lax.dot_general(
        xhi, hi, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * shi_ref[:].astype(jnp.float32)

    @pl.when(kk == num_k - 1)
    def _epilogue():
        o_ref[:] = acc_ref[:].astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("k_dim", "block_m", "block_n", "block_k", "interpret",
                     "out_dtype"),
)
def int4_matmul(
    x: jax.Array,            # [M, K] fp32/bf16
    packed: jax.Array,       # [ceil(K/2), N] uint8 (quantize_weight_int4)
    scales: jax.Array,       # [N] fp32
    *,
    k_dim: int | None = None,
    block_m: int = 256,
    block_n: int = 512,
    block_k: int = 256,      # packed rows per tile (= K/2 slab per dot)
    out_dtype=None,
    interpret: bool | None = None,
) -> jax.Array:
    """out[M, N] = x @ dequant(packed): int4 weights stream at HALF the
    int8 HBM traffic (a quarter of bf16) — for the bandwidth-bound decode
    regime where weight bytes dominate, that is the roofline."""
    if interpret is None:
        interpret = default_interpret()
    if out_dtype is None:
        out_dtype = x.dtype
    M, K = x.shape
    if k_dim is not None:
        assert K == k_dim, (K, k_dim)
    K2, N = packed.shape
    assert K2 == (K + 1) // 2, (x.shape, packed.shape)
    grouped = scales.ndim == 2
    if grouped:
        G = scales.shape[0]
        if G % 2 or K % G:
            raise ValueError(
                f"group-wise scales need an even group count dividing K "
                f"(K={K}, scales {scales.shape}); use "
                f"quantize_weight_int4(group_size=...)")
    if K % 2:
        x = pad_to(x, 1, K + 1)
        K += 1

    block_m = min(block_m, round_up(M, 8))
    block_n = min(block_n, round_up(N, 128))
    if grouped:
        # one quantization group per slab: a slab's scale row must be
        # constant over its K range, so block_k == group_size exactly
        block_k = K // scales.shape[0]
        assert K2 % block_k == 0, (K2, block_k)
    else:
        block_k = min(block_k, round_up(K2, 128))
    pM, pN = round_up(M, block_m), round_up(N, block_n)
    pK2 = round_up(K2, block_k)

    # keep the split-half pairing intact under padding: pad each HALF of x
    # to pK2 columns so hi-block index maps stay aligned
    xlo = pad_to(pad_to(x[:, :K // 2], 0, pM), 1, pK2)
    xhi = pad_to(pad_to(x[:, K // 2:], 0, pM), 1, pK2)
    xp = jnp.concatenate([xlo, xhi], axis=1)      # [pM, 2*pK2]
    cp = pad_to(pad_to(packed, 0, pK2), 1, pN)    # pad code 0 -> value -8,
    # but x pad is 0 -> no-op
    num_k = pK2 // block_k
    x_specs = [
        pl.BlockSpec((block_m, block_k), lambda i, j, k: (i, k)),
        pl.BlockSpec((block_m, block_k),
                     lambda i, j, k, nk=num_k: (i, k + nk)),
    ]
    w_spec = pl.BlockSpec((block_k, block_n), lambda i, j, k: (k, j))
    common = dict(
        grid=(pM // block_m, pN // block_n, num_k),
        out_specs=pl.BlockSpec((block_m, block_n), lambda i, j, k: (i, j)),
        out_shape=jax.ShapeDtypeStruct((pM, pN), out_dtype),
        scratch_shapes=[pltpu.VMEM((block_m, block_n), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )
    if grouped:
        # scale rows ride like x: one [1, bn] row per slab, halves padded
        # independently so the hi map (k + num_k) stays aligned
        G = scales.shape[0]
        s_lo = pad_to(pad_to(scales[: G // 2], 0, num_k, fill=1.0), 1, pN)
        s_hi = pad_to(pad_to(scales[G // 2:], 0, num_k, fill=1.0), 1, pN)
        sp = jnp.concatenate([s_lo, s_hi], axis=0)    # [2*num_k, pN]
        out = pl.pallas_call(
            functools.partial(_matmul4_group_kernel, num_k=num_k),
            in_specs=x_specs + [
                w_spec,
                pl.BlockSpec((1, block_n), lambda i, j, k: (k, j)),
                pl.BlockSpec((1, block_n),
                             lambda i, j, k, nk=num_k: (k + nk, j)),
            ],
            **common,
        )(xp, xp, cp, sp, sp)
        return out[:M, :N]
    sp = pad_to(scales.reshape(1, N), 1, pN)
    out = pl.pallas_call(
        functools.partial(_matmul4_kernel, num_k=num_k),
        in_specs=x_specs + [
            w_spec,
            pl.BlockSpec((1, block_n), lambda i, j, k: (0, j)),
        ],
        **common,
    )(xp, xp, cp, sp)
    return out[:M, :N]


def unpack_int4(packed: jax.Array, k_dim: int) -> jax.Array:
    """Packed uint8 [K'/2, N] -> int8 codes [k_dim, N] (split-half order)."""
    w = packed.astype(jnp.int32)
    lo = (w & 0xF) - 8
    hi = (w >> 4) - 8
    return jnp.concatenate([lo, hi], axis=0)[:k_dim].astype(jnp.int8)


@jax.custom_vjp
def _int4_linear(x, packed, scales, k_dim):
    return int4_matmul(x, packed, scales, k_dim=k_dim.shape[0])


def _int4_linear_fwd(x, packed, scales, k_dim):
    out = int4_matmul(x, packed, scales, k_dim=k_dim.shape[0])
    return out, (packed, scales, k_dim)


def _int4_linear_bwd(res, dy):
    packed, scales, k_dim = res
    K = k_dim.shape[0]
    codes = unpack_int4(packed, K)
    if scales.ndim == 2:
        # group-wise scales vary along K too: dequantize W once (trace-time
        # fp32 [K, N] — the bwd is a training-only path; decode never takes
        # it) and take the plain XLA matmul.
        g = K // scales.shape[0]
        w = codes.astype(jnp.float32) * jnp.repeat(scales, g, axis=0)
        dx = jnp.dot(dy.astype(jnp.float32), w.T,
                     preferred_element_type=jnp.float32)
        return dx.astype(dy.dtype), None, None, None
    # per-channel: dx = dy @ W^T with the channel scales folded into dy,
    # reusing the int8 kernel on the transposed codes.
    dy_scaled = dy.astype(jnp.float32) * scales
    dx = int8_matmul(
        dy_scaled.astype(dy.dtype), codes.T,
        jnp.ones((codes.shape[0],), jnp.float32))
    return dx, None, None, None


_int4_linear.defvjp(_int4_linear_fwd, _int4_linear_bwd)


def int4_linear(x: jax.Array, qw: QuantizedLinearWeights4) -> jax.Array:
    """Linear layer with packed int4 weights; differentiable in x only."""
    lead = x.shape[:-1]
    K = x.shape[-1]
    assert K == qw.k_dim, (x.shape, qw.k_dim)
    M = 1
    for s in lead:
        M *= s
    # k_dim rides as a shaped dummy so the custom_vjp residuals stay arrays
    out = _int4_linear(x.reshape(M, K), qw.codes, qw.scales,
                       jnp.zeros((qw.k_dim, 0), jnp.int8))
    if qw.bias is not None:
        out = out + qw.bias
    return out.reshape(*lead, qw.codes.shape[1])
