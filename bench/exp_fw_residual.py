"""EXPERIMENT: attribute the FA2 forward's non-dot residual (VERDICT r2 #1).

BENCH_r02: fw 0.376 ms = 45.7 TF/s while the in-kernel d=64 dot ceiling is
~92 TF/s (bench/exp_dot_shapes.py) — executed-dot time at the headline shape
is ~0.23 ms, so ~0.14 ms is DMA / per-step overhead.  This experiment
separates the residual into (a) grid-step fixed cost, (b) HBM streaming
floor, (c) pipeline scheduling, by measuring:

  1. the production forward over a (q_pack, block_q, block_k) grid
     (step-count lever);
  2. a DMA floor probe: identical grid/BlockSpecs/schedule to the default
     config, but the body reduces each tile with one VPU add — measures
     what the pipeline + DMA machinery costs with zero MXU work;
  3. the same probe with dots but no softmax already exists in
     bench/exp_fw_ablate.py (vpu0); the dot-volume model comes from
     exp_dot_shapes.

Run:  python -m bench.exp_fw_residual
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.flash_attention import (
    _packed_schedule,
    flash_attention_forward,
)
from tpu_flash.utils.timing import attention_flops, benchmark

_FIRST, _LAST = 1, 2

B, H, L, D = 4, 8, 2048, 64


def dma_probe(q, k, v, *, block_q, block_k, q_pack, semantics,
              interpret=False):
    """Same grid, schedule and block specs as the production forward at
    this config; body = one VPU add per tile.  The time is the DMA +
    per-step floor for this schedule."""
    Bh, Lq, d = q.shape[0], q.shape[1], q.shape[2]
    group_q = block_q * q_pack
    num_groups = Lq // group_q
    num_kv = Lq // block_k
    imap, jmap, flags, pat, patterns = _packed_schedule(
        num_groups, num_kv, block_q=block_q, block_k=block_k, causal=True,
        q_offset=0, kv_len=Lq, q_pack=q_pack)

    def kernel(imap_ref, jmap_ref, flags_ref, pat_ref,
               q_ref, k_ref, v_ref, o_ref, acc_ref):
        t = pl.program_id(1)
        flags = flags_ref[t]

        @pl.when((flags & _FIRST) != 0)
        def _init():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        # touch every input tile with minimal VPU work (a row-reduce each);
        # accumulate so nothing is dead-coded
        acc_ref[:] += q_ref[0].astype(jnp.float32)
        r = (jnp.sum(k_ref[0].astype(jnp.float32), axis=0)
             + jnp.sum(v_ref[0].astype(jnp.float32), axis=0))   # [d]
        acc_ref[0:1] += r[None, :]

        @pl.when((flags & _LAST) != 0)
        def _out():
            o_ref[0] = acc_ref[:].astype(o_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(Bh, len(imap)),
        in_specs=[
            pl.BlockSpec((1, group_q, d),
                         lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda b, t, im, jm, *r: (b, jm[t], 0)),
            pl.BlockSpec((1, block_k, d),
                         lambda b, t, im, jm, *r: (b, jm[t], 0)),
        ],
        out_specs=pl.BlockSpec((1, group_q, d),
                               lambda b, t, im, jm, *r: (b, im[t], 0)),
        scratch_shapes=[pltpu.VMEM((group_q, d), jnp.float32)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((Bh, Lq, d), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(semantics, "arbitrary")),
        interpret=interpret,
    )(jnp.asarray(imap), jnp.asarray(jmap), jnp.asarray(flags),
      jnp.asarray(pat), q, k, v)


def main():
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, D)), jnp.bfloat16)
               for _ in range(3))
    qf, kf, vf = (x.reshape(B * H, L, D) for x in (q, k, v))
    flops = attention_flops(B, H, L, D, causal=True)

    print("== production forward: (q_pack, block_q, block_k) sweep ==")
    # two live fp32 score tiles must fit VMEM: block_q*block_k*8B <~ 12MB
    for pack, bq, bk in [(4, 512, 1024), (4, 512, 2048), (2, 1024, 1024),
                         (4, 512, 512), (2, 512, 1024), (8, 256, 1024),
                         (8, 256, 2048)]:
        if bq * pack > L or bk > L:
            continue
        r = benchmark(
            functools.partial(flash_attention_forward, causal=True,
                              block_q=bq, block_k=bk, q_pack=pack),
            q, k, v, name=f"fw p{pack} {bq}x{bk}", flops=flops)
        # grid steps per (b,h) from the same schedule the kernel builds
        imap, *_ = _packed_schedule(
            L // (bq * pack), L // bk, block_q=bq, block_k=bk, causal=True,
            q_offset=0, kv_len=L, q_pack=pack)
        print(f"  p{pack} {bq}x{bk}: {r.mean_ms:.4f} ms  {r.tflops:.1f} "
              f"TF/s  ({len(imap)} steps/bh, {len(imap) * B * H} total)")

    print("== DMA + step floor probe (no MXU) ==")
    for pack, bq, bk in [(4, 512, 1024), (4, 512, 2048), (1, 2048, 1024),
                         (1, 2048, 2048)]:
        for sem in ("parallel", "arbitrary"):
            r = benchmark(
                functools.partial(dma_probe, block_q=bq, block_k=bk,
                                  q_pack=pack, semantics=sem),
                qf, kf, vf, name=f"probe p{pack} {bq}x{bk} {sem}")
            imap, *_ = _packed_schedule(
                L // (bq * pack), L // bk, block_q=bq, block_k=bk,
                causal=True, q_offset=0, kv_len=L, q_pack=pack)
            steps = len(imap) * B * H
            # bytes actually streamed by this schedule
            kv_bytes = steps and sum(
                2 * bk * D * 2 for _ in range(len(imap))) * B * H
            q_bytes = (L // (bq * pack)) * (bq * pack) * D * 2 * B * H
            total = kv_bytes + 2 * q_bytes  # q in + out
            print(f"  p{pack} {bq}x{bk} [{sem}]: {r.mean_ms:.4f} ms  "
                  f"{steps} steps  ~{total / 1e6:.0f} MB  "
                  f"-> {total / (r.mean_ms * 1e-3) / 1e9:.0f} GB/s eff")


if __name__ == "__main__":
    main()
