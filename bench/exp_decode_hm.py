"""EXPERIMENT: heads-minor flash-decode prototype.

Cache layout [B, S, H*d] streams at ~820 GB/s (HBM spec) on this chip,
vs ~380 GB/s for the production [B, H, S, d] tile pattern
(bench/exp_decode_layout.py) — a potential ~2x on the decode north-star.

Kernel structure (no transposes — every dot is a pattern the training
backward already uses):
  qbdT [M, H*d]: block-diagonal queries, qbdT[h, h*d+i] = q[h, i] * scale
  s_T  = dot(qbdT, K_tile, ((1,), (1,)))      # [M, bs]  (lane-lane)
  online softmax over lanes, state [M, 1]
  O    = dot(p, V_tile, ((1,), (0,)))         # [M, H*d]
  out[h*d+i] = acc[h, h*d+i] / l[h]           # stripe extract in epilogue

M = 8 (exact head count: tiny VPU, M=8 MXU) or 128 (padded: full-width
MXU, 16x the exp/VPU work).  Run:  python -m bench.exp_decode_hm
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.utils.timing import benchmark

MASK = -1e30


def _hm_kernel(lengths_ref, qbd_ref, k_ref, v_ref, o_ref,
               acc_ref, m_ref, l_ref, *, block_s, num_s, M, HD, d):
    b = pl.program_id(0)
    j = pl.program_id(1)
    length = lengths_ref[b]

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j * block_s < length)
    def _body():
        qbd = qbd_ref[0]                              # [M, HD] bf16
        k = k_ref[0]                                  # [bs, HD] bf16
        v = v_ref[0]
        s = jax.lax.dot_general(
            qbd, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)       # [M, bs]
        pos = j * block_s + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(pos < length, s, MASK)
        m_prev, l_prev = m_ref[:], l_ref[:]           # [M, 1]
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)
        l_ref[:] = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)       # [M, HD]
        acc_ref[:] = acc_ref[:] * alpha + o
        m_ref[:] = m_new

    @pl.when(j == num_s - 1)
    def _fin():
        l_safe = jnp.where(l_ref[:] == 0.0, 1.0, l_ref[:])
        row = jax.lax.broadcasted_iota(jnp.int32, (M, HD), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (M, HD), 1)
        stripe = (col // d) == row                    # block-diagonal mask
        flat = jnp.sum(jnp.where(stripe, acc_ref[:] / l_safe, 0.0), axis=0,
                       keepdims=True)                 # [1, HD]
        o_ref[0] = jnp.broadcast_to(flat, o_ref.shape[1:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_s", "M"))
def hm_decode(q, kv_k, kv_v, lengths, *, block_s=1024, M=8):
    """q [B, H, 1, d]; kv_[kv] [B, S, H*d] heads-minor caches."""
    B, H, _, d = q.shape
    S = kv_k.shape[1]
    HD = H * d
    scale = 1.0 / np.sqrt(d)
    num_s = S // block_s

    # block-diagonal scaled queries [B, M, HD]:
    # qbd[b, h, h*d + i] = q[b, h, i] * scale, rows >= H zero.
    eye = np.zeros((M, HD), np.float32)
    for h in range(H):
        eye[h, h * d:(h + 1) * d] = 1.0
    qrows = jnp.tile(q.reshape(B, H, d) * scale, (1, 1, H))   # [B, H, HD]
    qrows = jnp.pad(qrows, ((0, 0), (0, M - H), (0, 0)))
    qbd = (qrows * jnp.asarray(eye)[None]).astype(q.dtype)

    kernel = functools.partial(
        _hm_kernel, block_s=block_s, num_s=num_s, M=M, HD=HD, d=d)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, num_s),
            in_specs=[
                pl.BlockSpec((1, M, HD), lambda b, j, L: (b, 0, 0)),
                pl.BlockSpec((1, block_s, HD), lambda b, j, L: (b, j, 0)),
                pl.BlockSpec((1, block_s, HD), lambda b, j, L: (b, j, 0)),
            ],
            out_specs=pl.BlockSpec((1, 8, HD), lambda b, j, L: (b, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((M, HD), jnp.float32),
                pltpu.VMEM((M, 1), jnp.float32),
                pltpu.VMEM((M, 1), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, 8, HD), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(lengths.astype(jnp.int32), qbd, kv_k, kv_v)
    return out[:, 0].reshape(B, H, 1, d)


def main():
    from tpu_flash.kernels.decode import flash_decode_attention as fda

    rng = np.random.default_rng(0)
    B, H, S, d = 8, 8, 8192, 64
    q = jnp.asarray(rng.standard_normal((B, H, 1, d)), jnp.bfloat16)
    k4 = rng.standard_normal((B, H, S, d)).astype(np.float32)
    v4 = rng.standard_normal((B, H, S, d)).astype(np.float32)
    lengths = jnp.asarray([S] * B, jnp.int32)

    k = jnp.asarray(k4, jnp.bfloat16)
    v = jnp.asarray(v4, jnp.bfloat16)
    khm = jnp.asarray(k4.transpose(0, 2, 1, 3).reshape(B, S, H * d),
                      jnp.bfloat16)
    vhm = jnp.asarray(v4.transpose(0, 2, 1, 3).reshape(B, S, H * d),
                      jnp.bfloat16)

    ref = fda(q, k, v, lengths)
    nbytes = 2 * B * H * S * d * 2
    for M in (8, 128):
        out = hm_decode(q, khm, vhm, lengths, M=M)
        err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                    - ref.astype(jnp.float32))))
        r = benchmark(functools.partial(hm_decode, M=M),
                      q, khm, vhm, lengths, name=f"hm_M{M}")
        print(f"hm_M{M}: {r.mean_ms:.3f} ms = "
              f"{nbytes / (r.mean_ms * 1e-3) / 1e9:.0f} GB/s   err={err:.2e}",
              flush=True)
    r0 = benchmark(fda, q, k, v, lengths, name="production")
    print(f"production: {r0.mean_ms:.3f} ms = "
          f"{nbytes / (r0.mean_ms * 1e-3) / 1e9:.0f} GB/s", flush=True)

    # short prefixes: DMA-skip behavior must survive the layout change
    lens2 = jnp.asarray([1024] * B, jnp.int32)
    r8 = benchmark(functools.partial(hm_decode, M=8),
                   q, khm, vhm, lens2, name="hm_M8_short")
    print(f"hm_M8 short (S/8): {r8.mean_ms:.3f} ms", flush=True)


if __name__ == "__main__":
    main()
