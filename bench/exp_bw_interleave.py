"""EXPERIMENT: dual-Q-sub-tile interleaved fused flash-attention backward.

Same idea as the (now integrated, +6%) forward q_pack: per grid step process
TWO Q sub-tiles against the current KV tile, issuing all four recompute dots
(s2 = QK^T and dp = dO V^T for both halves) before either half's VPU
exp2/ds chain, so MXU and VPU phases of independent chains overlap.
dK/dV accumulators are shared by the halves (same KV tile — summed once),
dQ rows are disjoint.

Run:  python -m bench.exp_bw_interleave
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
    flash_attention_backward,
    flash_attention_forward,
)
from tpu_flash.utils.timing import attention_flops, benchmark

_FIRST, _LAST, _LIVE = 1, 2, 8


def _packed_kv_outer_schedule(num_groups, num_kv, *, block_q, block_k,
                              causal, q_offset, kv_len, q_pack):
    """KV tiles outer; inside each KV tile, groups of q_pack Q sub-tiles.
    FIRST/LAST flag the KV-tile boundaries (dK/dV reset / write)."""
    def half_live(g, h, j):
        if j * block_k >= kv_len:
            return False
        if not causal:
            return True
        # KV tile j contributes to rows >= j*block_k - q_offset
        return (g * q_pack + h + 1) * block_q - 1 + q_offset >= j * block_k

    entries = []
    for j in range(num_kv):
        if j * block_k >= kv_len:
            continue
        gs = [g for g in range(num_groups)
              if any(half_live(g, h, j) for h in range(q_pack))]
        forced = not gs
        if forced:
            gs = [num_groups - 1]
        for idx, g in enumerate(gs):
            f = (_FIRST if idx == 0 else 0) \
                | (_LAST if idx == len(gs) - 1 else 0)
            if not forced:
                for h in range(q_pack):
                    if half_live(g, h, j):
                        f |= _LIVE << h
            entries.append((g, j, f))
    arr = np.asarray(entries, np.int32)
    return arr[:, 0], arr[:, 1], arr[:, 2]


def _bwd_fused_packed_kernel(
    imap_ref, jmap_ref, flags_ref,
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
    dk_ref, dv_ref, dq_ref,
    dk_acc, dv_acc, dq_acc,
    *, scale, causal, block_q, block_k, kv_len, padded_kv, q_offset, d, aug,
    n_steps, q_pack,
):
    t = pl.program_id(1)
    flags = flags_ref[t]

    @pl.when(t == 0)
    def _init_dq():
        dq_acc[:] = jnp.zeros_like(dq_acc)

    @pl.when((flags & _FIRST) != 0)
    def _init_kv():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    k = k_ref[0]
    vt = v_ref[0]
    kp = _pad_contract(k, d)
    vp = _pad_contract(vt, d)
    k_aug = _ones_col(k) if aug else k

    def dots(h):
        sel = pl.ds(h * block_q, block_q)
        qs = (q_ref[0, sel].astype(jnp.float32) * (scale * LOG2E)).astype(
            q_ref.dtype)
        s2 = _dot(_pad_contract(qs, d), kp, ((1,), (1,)))
        dp = _dot(_pad_contract(do_ref[0, sel], d), vp, ((1,), (1,)))
        return s2, dp

    def finish(s2, dp, h):
        sel = pl.ds(h * block_q, block_q)
        if causal or padded_kv:
            cols = jmap_ref[t] * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s2.shape, 1)
            if causal:
                rows = (q_offset
                        + (imap_ref[t] * q_pack + h) * block_q
                        + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0))
                s2 = jnp.where(cols <= rows, s2, MASK2)
            s2 = jnp.where(cols < kv_len, s2, MASK2)
        lse = lse_ref[0, sel]
        lse2 = jnp.where(jnp.isneginf(lse), jnp.inf, lse * LOG2E)
        p = jnp.exp2(s2 - lse2)
        ds = p * (dp - delta_ref[0, sel])
        return p, ds

    def accumulate(p, ds, h):
        sel = pl.ds(h * block_q, block_q)
        do = do_ref[0, sel]
        q = q_ref[0, sel]
        dv_acc[:] += _dot(p.astype(do.dtype),
                          _ones_col(do) if aug else do, ((0,), (0,)))
        dk_acc[:] += _dot(ds.astype(q.dtype),
                          _ones_col(q) if aug else q, ((0,), (0,)))
        row0 = (imap_ref[t] * q_pack + h) * block_q
        row0 = pl.multiple_of(row0, block_q)
        dq_acc[pl.ds(row0, block_q), :] += _dot(
            ds.astype(k.dtype), k_aug, ((1,), (0,)))

    live = [(flags & (_LIVE << h)) != 0 for h in range(q_pack)]
    all_live = functools.reduce(jnp.logical_and, live)

    @pl.when(all_live)
    def _all():
        tiles = [dots(h) for h in range(q_pack)]
        finished = []
        for h, (s2, dp) in enumerate(tiles):
            finished.append(finish(s2, dp, h))
        for h, (p, ds) in enumerate(finished):
            accumulate(p, ds, h)

    for h in range(q_pack):
        @pl.when(live[h] & jnp.logical_not(all_live))
        def _partial(h=h):
            s2, dp = dots(h)
            p, ds = finish(s2, dp, h)
            accumulate(p, ds, h)

    @pl.when((flags & _LAST) != 0)
    def _epilogue_kv():
        dk_ref[0] = (scale * dk_acc[:, :d]).astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[:, :d].astype(dv_ref.dtype)

    @pl.when(t == n_steps - 1)
    def _epilogue_dq():
        dq_ref[0] = (scale * dq_acc[:, :d]).astype(dq_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "scale", "block_q", "block_k",
                              "q_pack"))
def flash_backward_packed(q, k, v, o, lse, do, *, causal=False, scale=None,
                          block_q=512, block_k=1024, q_pack=2):
    B, H, Lq, d = q.shape
    Lk = k.shape[-2]
    if scale is None:
        scale = float(1.0 / (d ** 0.5))
    block_q = min(block_q, round_up(Lq, 8))
    block_k = min(block_k, round_up(Lk, 8))
    group_q = q_pack * block_q
    pLq, pLk = round_up(Lq, group_q), round_up(Lk, block_k)
    padded_kv = pLk != Lk
    q_offset = Lk - Lq

    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=-1)
    qf = pad_to(q.reshape(B * H, Lq, d), 1, pLq)
    kf = pad_to(k.reshape(B * H, Lk, d), 1, pLk)
    vf = pad_to(v.reshape(B * H, Lk, d), 1, pLk)
    dof = pad_to(do.reshape(B * H, Lq, d), 1, pLq)
    lsef = pad_to(lse.reshape(B * H, Lq, 1), 1, pLq)
    deltaf = pad_to(delta.reshape(B * H, Lq, 1), 1, pLq)

    num_groups, num_kv = pLq // group_q, pLk // block_k
    imap, jmap, flags = _packed_kv_outer_schedule(
        num_groups, num_kv, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=q_offset, kv_len=Lk, q_pack=q_pack)
    aug = _fold_l(d)
    dw = d + 1 if aug else d

    kernel = functools.partial(
        _bwd_fused_packed_kernel,
        scale=scale, causal=causal, block_q=block_q, block_k=block_k,
        kv_len=Lk, padded_kv=padded_kv, q_offset=q_offset, d=d, aug=aug,
        n_steps=len(imap), q_pack=q_pack)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B * H, len(imap)),
        in_specs=[
            pl.BlockSpec((1, group_q, d), lambda b, t, im, jm, fl: (b, im[t], 0)),
            pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, fl: (b, jm[t], 0)),
            pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, fl: (b, jm[t], 0)),
            pl.BlockSpec((1, group_q, d), lambda b, t, im, jm, fl: (b, im[t], 0)),
            pl.BlockSpec((1, group_q, 1), lambda b, t, im, jm, fl: (b, im[t], 0)),
            pl.BlockSpec((1, group_q, 1), lambda b, t, im, jm, fl: (b, im[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, fl: (b, jm[t], 0)),
            pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, fl: (b, jm[t], 0)),
            pl.BlockSpec((1, pLq, d), lambda b, t, im, jm, fl: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dw), jnp.float32),
            pltpu.VMEM((block_k, dw), jnp.float32),
            pltpu.VMEM((pLq, dw), jnp.float32),
        ],
    )
    dk, dv, dq = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((B * H, pLk, d), q.dtype),
            jax.ShapeDtypeStruct((B * H, pLk, d), q.dtype),
            jax.ShapeDtypeStruct((B * H, pLq, d), q.dtype),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )(jnp.asarray(imap), jnp.asarray(jmap), jnp.asarray(flags),
      qf, kf, vf, dof, lsef, deltaf)
    return (dq[:, :Lq].reshape(B, H, Lq, d),
            dk[:, :Lk].reshape(B, H, Lk, d),
            dv[:, :Lk].reshape(B, H, Lk, d))


def main():
    rng = np.random.default_rng(0)
    B, H, L, d = 4, 8, 2048, 64
    causal = True
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.bfloat16) for _ in range(4))
    o, lse, _ = flash_attention_forward(q, k, v, causal=causal)
    fl = attention_flops(B, H, L, d, causal=causal, fwd_and_bwd=True) \
        * 5.0 / 7.0  # bw-only dots

    dq0, dk0, dv0 = flash_attention_backward(q, k, v, o, lse, do,
                                             causal=causal)
    for bq, bk, pack in [(512, 1024, 2), (256, 1024, 2), (512, 512, 2),
                         (256, 1024, 4)]:
        dq1, dk1, dv1 = flash_backward_packed(
            q, k, v, o, lse, do, causal=causal, block_q=bq, block_k=bk,
            q_pack=pack)
        err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                        - b.astype(jnp.float32))))
                  for a, b in [(dq1, dq0), (dk1, dk0), (dv1, dv0)])
        r = benchmark(
            functools.partial(flash_backward_packed, causal=causal,
                              block_q=bq, block_k=bk, q_pack=pack),
            q, k, v, o, lse, do, name=f"packed {pack}x{bq}x{bk}", flops=fl)
        print(f"{r}   err={err:.2e}", flush=True)

    r0 = benchmark(
        functools.partial(flash_attention_backward, causal=causal),
        q, k, v, o, lse, do, name="production fused 512x1024", flops=fl)
    print(r0, flush=True)


if __name__ == "__main__":
    main()
