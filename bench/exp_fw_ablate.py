"""EXPERIMENT: additive time budget of the FA2 forward at the headline shape.

Standalone copy of the production forward (causal, bf16, d=64, fold_l,
q_pack=2, no quant/dropout/window/segments) with stages removable one at a
time, so the 0.42 ms budget can be attributed:

  full     production-equivalent body
  nomask   causal mask select removed (scores used unmasked — wrong, timed)
  noexp    exp2 removed (p = shifted scores)
  nomax    running-max removed (fixed m = 0, no rescale)
  vpu0     nomask+noexp+nomax: dots + accumulate only
  noqk     QK dot replaced by a broadcast (PV dot + softmax only)
  nopv     PV dot replaced by a slice-accumulate (QK + softmax only)
  prepad   full, but Q/K pre-padded to 128 lanes and V pre-augmented with
           the ones column in XLA — no in-kernel concat/zero-fill

All "wrong" variants still write every output (no dead-code elision).

Run:  python -m bench.exp_fw_ablate
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
    _packed_schedule,
    flash_attention_forward,
)
from tpu_flash.utils.timing import attention_flops, benchmark

_FIRST, _LAST, _LIVE = 1, 2, 8


def _fwd_kernel(
    imap_ref, jmap_ref, flags_ref,
    q_ref, k_ref, v_ref,
    o_ref, lse_ref,
    acc_ref, m_ref,
    *, scale, block_q, block_k, q_pack, d, mode, prepad,
):
    t = pl.program_id(1)
    flags = flags_ref[t]

    @pl.when((flags & _FIRST) != 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)

    if prepad:
        kp = k_ref[0]                       # [bk, 128] already
        v_aug = v_ref[0]                    # [bk, 65] already
    else:
        kt = k_ref[0]
        kp = jnp.concatenate(
            [kt, jnp.zeros((kt.shape[0], 128 - d), kt.dtype)], axis=1)
        vt = v_ref[0]
        v_aug = jnp.concatenate(
            [vt, jnp.ones((vt.shape[0], 1), vt.dtype)], axis=1)

    def scores(h):
        sel = pl.ds(h * block_q, block_q)
        q = (q_ref[0, sel].astype(jnp.float32) * (scale * LOG2E)).astype(
            q_ref.dtype)
        if mode == "noqk":
            return jnp.broadcast_to(
                q[:, :1].astype(jnp.float32), (block_q, block_k))
        if not prepad:
            q = jnp.concatenate(
                [q, jnp.zeros((q.shape[0], 128 - d), q.dtype)], axis=1)
        s2 = _dot(q, kp, ((1,), (1,)))
        if mode not in ("nomask", "vpu0"):
            cols = jmap_ref[t] * block_k + jax.lax.broadcasted_iota(
                jnp.int32, s2.shape, 1)
            rows = ((imap_ref[t] * q_pack + h) * block_q
                    + jax.lax.broadcasted_iota(jnp.int32, s2.shape, 0))
            s2 = jnp.where(cols <= rows, s2, MASK2)
        return s2

    def chain(s2, h):
        sel = pl.ds(h * block_q, block_q)
        if mode in ("nomax", "vpu0"):
            m_new = jnp.zeros((block_q, 1), jnp.float32)
        else:
            m_prev = m_ref[sel]
            m_cur = jnp.max(s2, axis=-1, keepdims=True)
            m_new = jnp.maximum(m_prev, m_cur)
        if mode in ("noexp", "vpu0"):
            p = s2 - m_new
        else:
            p = jnp.exp2(s2 - m_new)
        pb = p.astype(v_aug.dtype)
        if mode == "nopv":
            acc_ref[sel] = acc_ref[sel] + pb[:, :d + 1].astype(jnp.float32)
        else:
            pv = _dot(pb, v_aug, ((1,), (0,)))
            if mode in ("nomax", "vpu0"):
                acc_ref[sel] = acc_ref[sel] + pv
            else:
                alpha = jnp.exp2(m_ref[sel] - m_new)
                acc_ref[sel] = acc_ref[sel] * alpha + pv
        if mode not in ("nomax", "vpu0"):
            m_ref[sel] = m_new

    live = [(flags & (_LIVE << h)) != 0 for h in range(q_pack)]
    all_live = functools.reduce(jnp.logical_and, live)

    @pl.when(all_live)
    def _all():
        tiles = [scores(h) for h in range(q_pack)]
        for h, s2 in enumerate(tiles):
            chain(s2, h)

    for h in range(1, q_pack):
        @pl.when(live[h] & jnp.logical_not(all_live))
        def _partial(h=h):
            chain(scores(h), h)

    @pl.when((flags & _LAST) != 0)
    def _epilogue():
        acc = acc_ref[:]
        out, l_fin = acc[:, :d], acc[:, d:d + 1]
        l_safe = jnp.where(l_fin == 0.0, 1.0, l_fin)
        o_ref[0] = (out / l_safe).astype(o_ref.dtype)
        lse_ref[0] = m_ref[:] * (1.0 / LOG2E) + jnp.log(l_safe)


@functools.partial(jax.jit, static_argnames=("mode", "block_q", "block_k",
                                             "q_pack", "prepad"))
def fwd(q, k, v, *, mode="full", block_q=512, block_k=1024, q_pack=2,
        prepad=False):
    B, H, L, d = q.shape
    scale = float(1.0 / (d ** 0.5))
    group_q = q_pack * block_q
    pLq = round_up(L, group_q)
    pLk = round_up(L, block_k)

    if prepad:
        qf = pad_to(q.reshape(B * H, L, d), 2, 128)
        kf = pad_to(k.reshape(B * H, L, d), 2, 128)
        vf = jnp.concatenate(
            [v.reshape(B * H, L, d),
             jnp.ones((B * H, L, 1), v.dtype)], axis=2)
        dk_in, dv_in = 128, d + 1
    else:
        qf = q.reshape(B * H, L, d)
        kf = k.reshape(B * H, L, d)
        vf = v.reshape(B * H, L, d)
        dk_in, dv_in = d, d

    qf = pad_to(qf, 1, pLq)
    kf = pad_to(kf, 1, pLk)
    vf = pad_to(vf, 1, pLk)

    num_groups, num_kv = pLq // group_q, pLk // block_k
    imap, jmap, flags = _packed_schedule(
        num_groups, num_kv, block_q=block_q, block_k=block_k, causal=True,
        q_offset=0, kv_len=L, q_pack=q_pack)

    kernel = functools.partial(
        _fwd_kernel, scale=scale, block_q=block_q, block_k=block_k,
        q_pack=q_pack, d=d, mode=mode, prepad=prepad)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B * H, len(imap)),
        in_specs=[
            pl.BlockSpec((1, group_q, qf.shape[-1]),
                         lambda b, t, im, jm, fl: (b, im[t], 0)),
            pl.BlockSpec((1, block_k, dk_in),
                         lambda b, t, im, jm, fl: (b, jm[t], 0)),
            pl.BlockSpec((1, block_k, dv_in),
                         lambda b, t, im, jm, fl: (b, jm[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, group_q, d),
                         lambda b, t, im, jm, fl: (b, im[t], 0)),
            pl.BlockSpec((1, group_q, 1),
                         lambda b, t, im, jm, fl: (b, im[t], 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((group_q, d + 1), jnp.float32),
            pltpu.VMEM((group_q, 1), jnp.float32),
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
    )(jnp.asarray(imap), jnp.asarray(jmap), jnp.asarray(flags), qf, kf, vf)
    return out[:, :L].reshape(B, H, L, d), lse


def main():
    rng = np.random.default_rng(0)
    B, H, L, d = 4, 8, 2048, 64
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                           jnp.bfloat16) for _ in range(3))
    fl = attention_flops(B, H, L, d, causal=True)

    ref, _, _ = flash_attention_forward(q, k, v, causal=True)
    out, _ = fwd(q, k, v, mode="full")
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"exp-kernel parity vs production: {err:.2e}", flush=True)

    for mode in ("full", "nomask", "noexp", "nomax", "vpu0", "noqk", "nopv"):
        r = benchmark(functools.partial(fwd, mode=mode), q, k, v,
                      name=f"fw[{mode}]", flops=fl)
        print(r, flush=True)
    for mode in ("full", "vpu0"):
        r = benchmark(functools.partial(fwd, mode=mode, prepad=True), q, k, v,
                      name=f"fw[{mode}+prepad]", flops=fl)
        print(r, flush=True)
    # prepad parity
    out, _ = fwd(q, k, v, mode="full", prepad=True)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                - ref.astype(jnp.float32))))
    print(f"prepad parity vs production: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
