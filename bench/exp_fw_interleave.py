"""EXPERIMENT: dual-Q-tile interleaved flash-attention forward.

Hypothesis: the fw kernel's plateau (~60 TFLOP/s executed vs ~115 isolated
dots) comes from the per-grid-step dependent chain QK -> softmax -> PV
serializing MXU and VPU.  Processing TWO Q tiles against the same KV tile in
one body gives the scheduler two independent chains: tile B's QK dot can
overlap tile A's softmax (different hardware units), with no cross-step
scratch round-trip (the failure mode of the earlier s2-pipeline attempt).

Run:  python -m bench.exp_fw_interleave
Compares against the production kernel on the headline shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.common import pad_to, round_up
from tpu_flash.kernels.flash_attention import (
    LOG2E,
    MASK2,
    _dot,
    _fold_l,
    _ones_col,
    _pad_contract,
    flash_attention_forward,
)
from tpu_flash.utils.timing import attention_flops, benchmark

_FIRST, _LAST, _LIVE_A, _LIVE_B = 1, 2, 4, 8


def _pair_schedule(num_pairs, num_kv, *, block_q, block_k, causal, q_offset,
                   kv_len):
    """(pair, kv_tile) visit list; per-half liveness in the flags."""
    def live(last_row, j):
        if j * block_k >= kv_len:
            return False
        if not causal:
            return True
        return j * block_k <= q_offset + last_row

    entries = []
    for p in range(num_pairs):
        lastA = (2 * p + 1) * block_q - 1
        lastB = (2 * p + 2) * block_q - 1
        js = [j for j in range(num_kv)
              if live(lastA, j) or live(lastB, j)]
        forced = not js
        if forced:
            js = [0]
        for idx, j in enumerate(js):
            f = (_FIRST if idx == 0 else 0) | (_LAST if idx == len(js) - 1 else 0)
            if not forced:
                f |= (_LIVE_A if live(lastA, j) else 0)
                f |= (_LIVE_B if live(lastB, j) else 0)
            entries.append((p, j, f))
    arr = np.asarray(entries, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2]


def _fwd_pair_kernel(
    pmap_ref, jmap_ref, flags_ref,
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    acc_ref, m_ref,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d,
):
    t = pl.program_id(1)
    flags = flags_ref[t]

    @pl.when((flags & _FIRST) != 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)

    kp = _pad_contract(k_ref[0], d)
    v_aug = _ones_col(v_ref[0])

    # Interleave explicitly: both dots first (independent MXU work), then the
    # two softmax/PV chains — each PV dot can overlap the other's VPU chain.
    pair = pmap_ref[t]
    selA, selB = pl.ds(0, block_q), pl.ds(block_q, block_q)

    def scores(sel, half_idx):
        q = (q_ref[0, sel].astype(jnp.float32) * (scale * LOG2E)).astype(
            q_ref.dtype)
        s2 = _dot(_pad_contract(q, d), kp, ((1,), (1,)))
        if causal or padded_kv:
            cols = jmap_ref[t] * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s2.shape, 1)
            if causal:
                rows = (q_offset + (2 * pair + half_idx) * block_q
                        + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0))
                s2 = jnp.where(cols <= rows, s2, MASK2)
            s2 = jnp.where(cols < kv_len, s2, MASK2)
        return s2

    def chain(s2, sel):
        m_prev = m_ref[sel]
        m_cur = jnp.max(s2, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp2(m_prev - m_new)
        p = jnp.exp2(s2 - m_new)
        pv = _dot(p.astype(v_aug.dtype), v_aug, ((1,), (0,)))
        acc_ref[sel] = acc_ref[sel] * alpha + pv
        m_ref[sel] = m_new

    liveA = (flags & _LIVE_A) != 0
    liveB = (flags & _LIVE_B) != 0

    @pl.when(liveA & liveB)
    def _both():
        s2A = scores(selA, 0)
        s2B = scores(selB, 1)
        chain(s2A, selA)
        chain(s2B, selB)

    @pl.when(liveA & jnp.logical_not(liveB))
    def _only_a():
        chain(scores(selA, 0), selA)

    @pl.when(liveB & jnp.logical_not(liveA))
    def _only_b():
        chain(scores(selB, 1), selB)

    @pl.when((flags & _LAST) != 0)
    def _epilogue():
        acc = acc_ref[:]
        out, l_fin = acc[:, :d], acc[:, d:d + 1]
        m_fin = m_ref[:]
        empty = m_fin <= MASK2 + 1.0
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        o_ref[0] = jnp.where(empty, 0.0, out / l_safe).astype(o_ref.dtype)
        m_nat = m_fin * (1.0 / LOG2E)
        lse_ref[0] = jnp.where(empty, -jnp.inf, m_nat + jnp.log(l_safe))


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k"))
def flash_forward_paired(q, k, v, *, causal=False, scale=None,
                         block_q=512, block_k=1024):
    B, H, Lq, d = q.shape
    Lk = k.shape[-2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))
    assert _fold_l(d)
    block_q = min(block_q, round_up(Lq, 8))
    block_k = min(block_k, round_up(Lk, 8))
    pLq = round_up(Lq, 2 * block_q)
    pLk = round_up(Lk, block_k)
    padded_kv = pLk != Lk
    q_offset = Lk - Lq

    qf = pad_to(q.reshape(B * H, Lq, d), 1, pLq)
    kf = pad_to(k.reshape(B * H, Lk, d), 1, pLk)
    vf = pad_to(v.reshape(B * H, Lk, d), 1, pLk)

    num_pairs, num_kv = pLq // (2 * block_q), pLk // block_k
    pmap, jmap, flags = _pair_schedule(
        num_pairs, num_kv, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, kv_len=Lk)

    kernel = functools.partial(
        _fwd_pair_kernel, scale=scale, causal=causal, block_q=block_q,
        block_k=block_k, kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset,
        d=d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B * H, len(pmap)),
        in_specs=[
            pl.BlockSpec((1, 2 * block_q, d),
                         lambda b, t, pm, jm, fl: (b, pm[t], 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda b, t, pm, jm, fl: (b, jm[t], 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda b, t, pm, jm, fl: (b, jm[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, 2 * block_q, d),
                         lambda b, t, pm, jm, fl: (b, pm[t], 0)),
            pl.BlockSpec((1, 2 * block_q, 1),
                         lambda b, t, pm, jm, fl: (b, pm[t], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * block_q, d + 1), jnp.float32),
            pltpu.VMEM((2 * block_q, 1), jnp.float32),
        ],
    )
    out, lse = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
            jax.ShapeDtypeStruct((B * H, pLq, 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(pmap), jnp.asarray(jmap), jnp.asarray(flags), qf, kf, vf)
    return (out[:, :Lq].reshape(B, H, Lq, d),
            lse[:, :Lq, 0].reshape(B, H, Lq))


def main():
    rng = np.random.default_rng(0)
    B, H, L, d = 4, 8, 2048, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.bfloat16)
               for _ in range(3))
    causal = True
    fl = attention_flops(B, H, L, d, causal=causal)

    # correctness vs production kernel
    o_ref, lse_ref, _ = flash_attention_forward(q, k, v, causal=causal)
    for bq, bk in [(512, 1024), (512, 512), (1024, 1024), (256, 1024)]:
        o, lse = flash_forward_paired(q, k, v, causal=causal,
                                      block_q=bq, block_k=bk)
        err = float(jnp.max(jnp.abs(o.astype(jnp.float32)
                                    - o_ref.astype(jnp.float32))))
        lerr = float(jnp.max(jnp.abs(lse - lse_ref)))
        r = benchmark(functools.partial(flash_forward_paired, causal=causal,
                                        block_q=bq, block_k=bk),
                      q, k, v, name=f"paired {bq}x{bk}", flops=fl)
        print(f"{r}   err={err:.2e} lse_err={lerr:.2e}")

    r0 = benchmark(functools.partial(flash_attention_forward, causal=causal),
                   q, k, v, name="production 1024x1024", flops=fl)
    print(r0)


if __name__ == "__main__":
    main()
