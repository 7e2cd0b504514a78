"""EXPERIMENT: attribute the FA2 backward's residual (VERDICT r3 #3).

BENCH_r03: bw 0.732 ms = 58.7 TF/s at the headline shape = 67% of fw+bw
wall time, and 58.6-61 TF/s at L=16k/32k while the fw reaches 71.5-78.9.
This gives the backward the forward's round-3 treatment:

  1. ``rates``  — in-kernel MXU rates for the EXACT five dots the fused
     backward issues per live (q, kv) tile pair (QK^T and dO V^T contract
     d=64; P^T dO, dS^T Q contract block_q; dS K contracts the live width),
     at the production tile shapes;
  2. ``floor``  — executed-dot floor from the schedule volume model:
     enumerate ``_tile_schedule``'s live pairs and width classes at a
     config, charge each dot its measured per-shape rate (NO host
     measurement — pure model from part 1's rates);
  3. ``dma``    — no-MXU probe: the fused backward's exact grid /
     BlockSpecs / scratch allocation with a one-VPU-add body — the DMA +
     per-grid-step floor of the production schedule;
  4. ``prod``   — the production backward at the headline and north-star
     configs (bf16 L=2048 B4H8; bf16+int8 L=8192 B1H8), plus block
     variants under the VMEM model;
  5. ``packed`` — the q-packed fused prototype (bench/exp_bw_interleave)
     at L=8192, where the step-count lever actually bites (72 live pairs
     per (b,h) at 512x1024 vs 20 at pack=4 — at L=2048 it was 4-6 pairs,
     which is why round 2 measured packing "neutral" THERE).

Run:  python -m bench.exp_bw_residual [rates|floor|dma|prod|packed|all]

Reference being beaten: src/flash_attn2_bw.cpp:21-263.
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpu_flash.kernels.flash_attention import (
    DEFAULT_BLOCK_K_BWD,
    DEFAULT_BLOCK_Q_BWD,
    _FIRST,
    _LAST,
    _dot,
    _fold_l,
    _tile_schedule,
    flash_attention_backward,
    flash_attention_forward,
)
from tpu_flash.ops.attention import _quantize_kv
from tpu_flash.utils.timing import attention_flops, benchmark

_LIVE = 8

# ---------------------------------------------------------------- configs
HEADLINE = dict(B=4, H=8, L=2048, d=64)
NORTHSTAR = dict(B=1, H=8, L=8192, d=64)


def _bwd_blocks(L, d, itemsize=2, q_pack=1):
    """The production block/fused choice (select_bwd_fused_config) for a
    causal Lq==Lk config at the given q_pack (1 = the unpacked schedule
    the floor/DMA parts attribute)."""
    from tpu_flash.kernels.flash_attention import select_bwd_fused_config
    block_q = min(DEFAULT_BLOCK_Q_BWD, L)
    fused, bq, pack, bk, pLq, hbm = select_bwd_fused_config(
        L, L, d, block_q=block_q, block_k=min(DEFAULT_BLOCK_K_BWD, L),
        causal=True, q_offset=0, itemsize=itemsize, q_pack=q_pack)
    return bq, bk, fused


# ------------------------------------------------------------------ rates
def make_dot_kernel(a_shape, b_shape, dims, out_shape, reps):
    def kernel(a_ref, b_ref, o_ref):
        acc = jnp.zeros(out_shape, jnp.float32)
        for r in range(reps):
            acc += _dot(a_ref[r], b_ref[r], dims)
        o_ref[:] = acc.astype(o_ref.dtype)

    @jax.jit
    def run(a, b):
        return pl.pallas_call(
            kernel,
            grid=(32,),
            in_specs=[
                pl.BlockSpec((reps,) + a_shape, lambda i: (0, 0, 0)),
                pl.BlockSpec((reps,) + b_shape, lambda i: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec(out_shape, lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
        )(a, b)

    return run


def bw_dot_cases(bq, w, d):
    """The five dots of one live fused-backward pair at width w.
    Returns (name, a_shape, b_shape, dims, out_shape, macs)."""
    dw = d + 1 if _fold_l(d) else d
    return [
        # s2 = q . k^T        [bq,d] x [w,d]  contract d
        ("QK^T", (bq, d), (w, d), ((1,), (1,)), (bq, w), bq * w * d),
        # dp = do . v^T       [bq,d] x [w,d]  contract d
        ("dOV^T", (bq, d), (w, d), ((1,), (1,)), (bq, w), bq * w * d),
        # dv += p^T . do      [bq,w] x [bq,dw] contract bq
        ("P^TdO", (bq, w), (bq, dw), ((0,), (0,)), (w, dw), bq * w * dw),
        # dk += ds^T . q      [bq,w] x [bq,dw] contract bq
        ("dS^TQ", (bq, w), (bq, dw), ((0,), (0,)), (w, dw), bq * w * dw),
        # dq += ds . k_aug    [bq,w] x [w,dw]  contract w
        ("dSK", (bq, w), (w, dw), ((1,), (0,)), (bq, dw), bq * w * dw),
    ]


def measure_transposed_probe(bq, w, d):
    """Hypothesis probe: P^TdO/dS^TQ run at 66-79 TF/s vs QK's 94 with the
    SAME MXU pass count — is the penalty the axis-0 (implicitly
    transposed) contraction?  Measure the same products with the LHS
    already transposed (axis-1 contraction, as a transposed-score-space
    kernel would issue them) and the dq dot in its axis-0 form (where the
    penalty would MOVE to).  If nat >> axis0, a [w, bq] score space nets
    ~6% of the dot floor (2 penalized dots -> 1)."""
    rng = np.random.default_rng(0)
    dw = d + 1 if _fold_l(d) else d
    for (name, a_s, b_s, dims, o_s, macs) in [
        ("P_T.dO contract-ax1", (w, bq), (bq, dw), ((1,), (0,)), (w, dw),
         bq * w * dw),
        ("dS_T.K contract-ax0", (w, bq), (w, dw), ((0,), (0,)), (bq, dw),
         bq * w * dw),
    ]:
        reps = max(1, (2048 * 512) // (max(a_s[0] * a_s[1],
                                           b_s[0] * b_s[1])) // 2)
        a = jnp.asarray(rng.standard_normal((reps,) + a_s), jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((reps,) + b_s), jnp.bfloat16)
        run = make_dot_kernel(a_s, b_s, dims, o_s, reps)
        flops = 2.0 * macs * reps * 32
        r = benchmark(run, a, b, name=name, flops=flops)
        print(f"  {name:22s} bq={bq} w={w:5d}: {r.tflops:6.1f} TF/s",
              flush=True)


_RATE_CACHE: dict = {}


def measure_rates(bq, widths, d, verbose=True):
    """In-kernel TF/s for each bw dot shape at each width class."""
    rng = np.random.default_rng(0)
    rates = {}
    for w in widths:
        for (name, a_s, b_s, dims, o_s, macs) in bw_dot_cases(bq, w, d):
            key = (name, bq, w, d)
            if key in _RATE_CACHE:
                rates[key] = _RATE_CACHE[key]
                continue
            # keep the per-step operand volume roughly constant
            reps = max(1, (2048 * 512) // (max(a_s[0] * a_s[1],
                                               b_s[0] * b_s[1])) // 2)
            a = jnp.asarray(rng.standard_normal((reps,) + a_s), jnp.bfloat16)
            b = jnp.asarray(rng.standard_normal((reps,) + b_s), jnp.bfloat16)
            run = make_dot_kernel(a_s, b_s, dims, o_s, reps)
            flops = 2.0 * macs * reps * 32
            r = benchmark(run, a, b, name=f"{name}_w{w}", flops=flops)
            rates[key] = r.tflops
            _RATE_CACHE[key] = r.tflops
            if verbose:
                print(f"  {name:7s} bq={bq} w={w:5d}: {r.tflops:6.1f} TF/s "
                      f"({r.mean_ms:.3f} ms)", flush=True)
    return rates


# ------------------------------------------------------------------ floor
def dot_floor_ms(B, H, L, d, *, block_q, block_k, causal=True,
                 rates=None, verbose=True):
    """Executed-dot floor for the fused backward schedule: per live pair,
    charge each of the 5 dots its width's measured rate."""
    num_q = -(-L // block_q)
    num_kv = -(-L // block_k)
    imap, jmap, flags, wmap, widths = _tile_schedule(
        num_q, num_kv, block_q=block_q, block_k=block_k, causal=causal,
        q_offset=0, kv_len=L, kv_outer=True)
    live = [(int(f) & _LIVE) != 0 for f in flags]
    n_live = sum(live)
    if rates is None:
        rates = measure_rates(block_q, sorted(set(widths)), d,
                              verbose=verbose)
    total_s = 0.0
    total_flops = 0.0
    for t in range(len(imap)):
        if not live[t]:
            continue
        w = widths[int(wmap[t])]
        for (name, *_rest, macs) in bw_dot_cases(block_q, w, d):
            fl = 2.0 * macs
            total_flops += fl
            total_s += fl / (rates[(name, block_q, w, d)] * 1e12)
    total_s *= B * H
    total_flops *= B * H
    useful = attention_flops(B, H, L, d, causal=causal,
                             fwd_and_bwd=True) * 5.0 / 7.0
    if verbose:
        print(f"  schedule: {n_live} live pairs/(b,h) x {B * H} bh = "
              f"{n_live * B * H} grid steps", flush=True)
        print(f"  executed dot volume {total_flops / 1e9:.1f} GFLOP "
              f"(useful {useful / 1e9:.1f}, ratio "
              f"{total_flops / useful:.3f})", flush=True)
        print(f"  executed-dot floor {total_s * 1e3:.3f} ms "
              f"-> max useful {useful / total_s / 1e12:.1f} TF/s",
              flush=True)
    return total_s * 1e3, useful


# -------------------------------------------------------------------- dma
def dma_probe(q, k, v, do, lse, delta, *, block_q, block_k, causal=True,
              q_pack=1):
    """The fused backward's exact grid/specs/scratch; body = VPU adds.
    ``q_pack`` > 1 probes the PACKED schedule (group-sized Q/dO blocks)."""
    from tpu_flash.kernels.flash_attention import _packed_kv_schedule
    Bh, Lq, d = q.shape
    Lk = k.shape[1]
    dw = d + 1 if _fold_l(d) else d
    group_q = block_q * q_pack
    num_q, num_kv = Lq // group_q, Lk // block_k
    imap, jmap, flags, wmap, widths = (
        _packed_kv_schedule(num_q, num_kv, block_q=block_q,
                            block_k=block_k, causal=causal, q_offset=0,
                            kv_len=Lk, q_pack=q_pack)
        if q_pack > 1 else
        _tile_schedule(num_q, num_kv, block_q=block_q, block_k=block_k,
                       causal=causal, q_offset=0, kv_len=Lk, kv_outer=True))
    block_q = group_q          # specs below are group-sized
    pLq = Lq
    n_steps = len(imap)

    def kernel(imap_ref, jmap_ref, flags_ref, wmap_ref, seed_ref,
               q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
               dk_ref, dv_ref, dq_ref, dk_acc, dv_acc, dq_acc):
        t = pl.program_id(1)
        flags = flags_ref[t]

        @pl.when(t == 0)
        def _init_dq():
            dq_acc[:] = jnp.zeros_like(dq_acc)

        @pl.when((flags & _FIRST) != 0)
        def _init_kv():
            dk_acc[:] = jnp.zeros_like(dk_acc)
            dv_acc[:] = jnp.zeros_like(dv_acc)

        # touch every operand tile with one VPU reduce each
        r = (jnp.sum(k_ref[0].astype(jnp.float32), axis=0)
             + jnp.sum(v_ref[0].astype(jnp.float32), axis=0))      # [d]
        dk_acc[0:1, :d] += r[None, :]
        s = (jnp.sum(q_ref[0].astype(jnp.float32), axis=0)
             + jnp.sum(do_ref[0].astype(jnp.float32), axis=0))     # [d]
        dv_acc[0:1, :d] += s[None, :]
        dq_acc[0:1, 0:1] += (jnp.sum(lse_ref[0]) + jnp.sum(delta_ref[0]))

        @pl.when((flags & _LAST) != 0)
        def _epilogue_kv():
            dk_ref[0] = dk_acc[:, :d].astype(dk_ref.dtype)
            dv_ref[0] = dv_acc[:, :d].astype(dv_ref.dtype)

        @pl.when(t == n_steps - 1)
        def _epilogue_dq():
            dq_ref[0] = dq_acc[:, :d].astype(dq_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(Bh, n_steps),
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, *r: (b, jm[t], 0)),
            pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, *r: (b, jm[t], 0)),
            pl.BlockSpec((1, block_q, d), lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, t, im, jm, *r: (b, im[t], 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, t, im, jm, *r: (b, im[t], 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, *r: (b, jm[t], 0)),
            pl.BlockSpec((1, block_k, d), lambda b, t, im, jm, *r: (b, jm[t], 0)),
            pl.BlockSpec((1, pLq, d), lambda b, t, im, jm, *r: (b, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, dw), jnp.float32),
            pltpu.VMEM((block_k, dw), jnp.float32),
            pltpu.VMEM((pLq, dw), jnp.float32),
        ],
    )

    @jax.jit
    def run(q, k, v, do, lse, delta):
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Bh, Lk, d), jnp.bfloat16),
                jax.ShapeDtypeStruct((Bh, Lk, d), jnp.bfloat16),
                jax.ShapeDtypeStruct((Bh, pLq, d), jnp.bfloat16),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"),
            ),
        )(jnp.asarray(imap), jnp.asarray(jmap), jnp.asarray(flags),
          jnp.asarray(wmap), jnp.zeros((3,), jnp.int32),
          q, k, v, do, lse, delta)

    return run, len(imap) * Bh


def run_dma(cfg, q_pack=None, block_q=None, block_k=None):
    B, H, L, d = cfg["B"], cfg["H"], cfg["L"], cfg["d"]
    if block_q is None or block_k is None:
        from tpu_flash.kernels.flash_attention import select_bwd_fused_config
        _, bq, pk, bk, _, _ = select_bwd_fused_config(
            L, L, d, block_q=None, block_k=min(2048, L), causal=True,
            q_offset=0, itemsize=2, q_pack=q_pack)
        block_q, block_k = bq, bk
        q_pack = pk
    rng = np.random.default_rng(0)
    q, k, v, do = (jnp.asarray(
        rng.standard_normal((B * H, L, d)), jnp.bfloat16) for _ in range(4))
    lse = jnp.asarray(rng.standard_normal((B * H, L, 1)), jnp.float32)
    delta = jnp.asarray(rng.standard_normal((B * H, L, 1)), jnp.float32)
    run, steps = dma_probe(q, k, v, do, lse, delta, block_q=block_q,
                           block_k=block_k, q_pack=q_pack)
    nbytes = sum(x.nbytes for x in (q, k, v, do, lse, delta))
    tag = f"{q_pack}x{block_q}x{block_k}"
    r = benchmark(run, q, k, v, do, lse, delta, name=f"dma_L{L}_{tag}")
    print(f"  B{B} H{H} L{L} {tag}: {r.mean_ms:.3f} ms over {steps} "
          f"steps ({r.mean_ms / steps * 1e3:.2f} us/step), input "
          f"{nbytes / 1e6:.0f} MB -> {nbytes / r.mean_ms / 1e6:.0f} GB/s",
          flush=True)
    return r


# ------------------------------------------------------------------- prod
def run_prod(cfg, *, kv_quant="none", block_q=None, block_k=None,
             q_pack="default", fast_exp=None, score_layout=None, label=""):
    B, H, L, d = cfg["B"], cfg["H"], cfg["L"], cfg["d"]
    rng = np.random.default_rng(0)
    q, k, v, do = (jnp.asarray(
        rng.standard_normal((B, H, L, d)), jnp.bfloat16) for _ in range(4))
    kw = {}
    if block_q:
        kw["block_q"] = block_q
    if block_k:
        kw["block_k"] = block_k
    if q_pack != "default":
        kw["q_pack"] = q_pack
    if fast_exp is not None:
        kw["fast_exp"] = fast_exp
    if score_layout is not None:
        kw["score_layout"] = score_layout
    if kv_quant != "none":
        kq, ks = _quantize_kv(k, kv_quant)
        vq, vs = _quantize_kv(v, kv_quant)
        kq, vq = kq.transpose(0, 1, 3, 2), vq.transpose(0, 1, 3, 2)
        o, lse, _ = flash_attention_forward(q, kq, vq, ks, vs, causal=True,
                                            kv_layout="dl")
        fn = functools.partial(flash_attention_backward, causal=True,
                               kv_layout="dl", **kw)
        args = (q, kq, vq, o, lse, do, None, ks, vs)
    else:
        o, lse, _ = flash_attention_forward(q, k, v, causal=True)
        fn = functools.partial(flash_attention_backward, causal=True, **kw)
        args = (q, k, v, o, lse, do)

    def consume(*a):
        dq, dk, dv = fn(*a)
        return (jnp.sum(dq.astype(jnp.float32)) +
                jnp.sum(dk.astype(jnp.float32)) +
                jnp.sum(dv.astype(jnp.float32)))

    fl = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True) * 5 / 7
    r = benchmark(consume, *args, name=f"bw_{label}", flops=fl)
    print(f"  {label:28s} {r.mean_ms:7.3f} ms  {r.tflops:5.1f} TF/s",
          flush=True)
    return r


# ----------------------------------------------------------------- packed
def run_packed(cfg):
    from bench.exp_bw_interleave import flash_backward_packed
    B, H, L, d = cfg["B"], cfg["H"], cfg["L"], cfg["d"]
    rng = np.random.default_rng(0)
    q, k, v, do = (jnp.asarray(
        rng.standard_normal((B, H, L, d)), jnp.bfloat16) for _ in range(4))
    o, lse, _ = flash_attention_forward(q, k, v, causal=True)
    dq0, dk0, dv0 = flash_attention_backward(q, k, v, o, lse, do, causal=True)
    fl = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True) * 5 / 7
    for bq, bk, pack in [(512, 1024, 2), (512, 1024, 4), (256, 1024, 4),
                         (256, 1024, 8), (512, 512, 4)]:
        if bq * pack > L:
            continue
        try:
            f = functools.partial(flash_backward_packed, causal=True,
                                  block_q=bq, block_k=bk, q_pack=pack)
            dq1, dk1, dv1 = f(q, k, v, o, lse, do)
            err = max(float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                            - b.astype(jnp.float32))))
                      for a, b in [(dq1, dq0), (dk1, dk0), (dv1, dv0)])
            r = benchmark(f, q, k, v, o, lse, do,
                          name=f"packed{pack}x{bq}x{bk}", flops=fl)
            print(f"  packed {pack}x{bq}x{bk}: {r.mean_ms:7.3f} ms "
                  f"{r.tflops:5.1f} TF/s  err={err:.2e}", flush=True)
        except Exception as e:
            print(f"  packed {pack}x{bq}x{bk}: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print("backend:", jax.default_backend(), flush=True)

    if which in ("rates", "floor", "all"):
        for cfg in (HEADLINE, NORTHSTAR):
            bq, bk, fused = _bwd_blocks(cfg["L"], cfg["d"])
            print(f"== floor: B{cfg['B']} H{cfg['H']} L{cfg['L']} "
                  f"d{cfg['d']} blocks {bq}x{bk} fused={fused} ==",
                  flush=True)
            dot_floor_ms(cfg["B"], cfg["H"], cfg["L"], cfg["d"],
                         block_q=bq, block_k=bk)

    if which in ("rates", "floor", "all"):
        print("== transposed-contraction hypothesis probe ==", flush=True)
        for w in (1024, 2048):
            measure_transposed_probe(512, w, 64)

    if which in ("dma", "all"):
        print("== dma probes (fused specs, no-MXU body) ==", flush=True)
        for cfg in (HEADLINE, NORTHSTAR):
            run_dma(cfg, q_pack=1)      # the unpacked baseline schedule
            run_dma(cfg)                # the packed production schedule

    if which in ("prod", "all"):
        from tpu_flash.kernels.flash_attention import select_bwd_fused_config
        print("== production backward (q_pack sweep) ==", flush=True)
        for cfg in (HEADLINE, NORTHSTAR):
            for pack in (None, 1, 2, 4, 8):
                sel = select_bwd_fused_config(
                    cfg["L"], cfg["L"], cfg["d"], block_q=None,
                    block_k=min(2048, cfg["L"]), causal=True, q_offset=0,
                    itemsize=2, q_pack=pack)
                tag = (f"bf16 L{cfg['L']} pack={pack or 'auto'} "
                       f"-> {sel[2]}x{sel[1]}x{sel[3]}"
                       f"{' hbm' if sel[5] else ''}")
                run_prod(cfg, q_pack=pack, label=tag)
        run_prod(NORTHSTAR, kv_quant="int8", label="int8 L8192 (auto)")
        run_prod(NORTHSTAR, kv_quant="int8", q_pack=1,
                 label="int8 L8192 pack=1")
        # explicit sub-tile-width comparison at the north-star shape
        run_prod(NORTHSTAR, block_q=512, q_pack=8, label="bf16 L8192 8x512")
        run_prod(NORTHSTAR, kv_quant="int8", block_q=256, q_pack=8,
                 label="int8 L8192 8x256")
    if which in ("l16", "all"):
        # L=16k/32k: the HBM-dq fused unlock (two-pass baselines: 11.73 /
        # 45.0 ms, RESULTS.md round-2 long-context table)
        L16 = dict(B=1, H=8, L=16384, d=64)
        run_prod(L16, label="bf16 L16384 auto")
        L32 = dict(B=1, H=8, L=32768, d=64)
        run_prod(L32, label="bf16 L32768 auto")

    if which in ("wqx", "all"):
        # transposed [w, bq] score space: moves the measured axis-0
        # contraction penalty from two accumulation dots to one
        # (bench probe: P^TdO 67.2 -> 80.6 TF/s at w=1024)
        print("== wq (transposed) score layout ==", flush=True)
        run_prod(NORTHSTAR, label="bf16 L8192 auto (wq default)")
        run_prod(NORTHSTAR, score_layout="wq", label="bf16 L8192 wq")
        run_prod(NORTHSTAR, kv_quant="int8", score_layout="wq",
                 label="int8 L8192 wq")
        run_prod(HEADLINE, score_layout="wq", label="bf16 L2048 wq")
        run_prod(HEADLINE, score_layout="qw", label="bf16 L2048 qw")
        # int8-wq at the WIDE tile (the selector's wq-column model clamps
        # to bk=512; force pack=4/bk=1024 — modeled 164K over the soft
        # cap, expected ~15.6M actual after the q/do halving)
        import tpu_flash.kernels.flash_attention as fa_mod
        orig_sel = fa_mod.select_bwd_fused_config
        try:
            fa_mod.select_bwd_fused_config = \
                lambda *a, **k: (True, 256, 4, 1024, 8192, False)
            run_prod(NORTHSTAR, kv_quant="int8", score_layout="wq",
                     q_pack=4, label="int8 L8192 wq 4x256x1024 (forced)")
        except Exception as e:
            print(f"  forced int8-wq-1024: FAILED "
                  f"({type(e).__name__}: {str(e)[:100]})", flush=True)
        finally:
            fa_mod.select_bwd_fused_config = orig_sel

    if which in ("fx", "all"):
        # fast_exp (bf16 score-chain temps) HALVES the dominant VMEM term,
        # unlocking the wide-KV hbm config at L=8192 (10 steps + the
        # 79-88 TF/s wide accumulation dots vs 67 at bk=1024).  The
        # selector's model doesn't know fast_exp halves temps, so force
        # the config for the measurement.
        import tpu_flash.kernels.flash_attention as fa_mod
        print("== fast_exp variants at the north-star shape ==", flush=True)
        run_prod(NORTHSTAR, fast_exp=True, label="bf16 L8192 auto+fast_exp")
        orig_sel = fa_mod.select_bwd_fused_config
        try:
            fa_mod.select_bwd_fused_config = \
                lambda *a, **k: (True, 256, 8, 2048, 8192, True)
            run_prod(NORTHSTAR, q_pack=4, fast_exp=True,
                     label="bf16 L8192 8x256x2048-hbm fast_exp")
        except Exception as e:
            print(f"  forced 8x256x2048-hbm: FAILED "
                  f"({type(e).__name__}: {str(e)[:120]})", flush=True)
        finally:
            fa_mod.select_bwd_fused_config = orig_sel

    if which in ("fw", "all"):
        # forward step-count lever at the north-star shape: 2048-wide KV
        # tiles halve the grid steps (20 -> 10 per (b,h)) for +3% executed
        # diagonal volume — net win if the ~1.3us/step model holds
        print("== forward KV-tile width at L=8192 ==", flush=True)
        for cfg in (NORTHSTAR, HEADLINE):
            B, H, L, d = cfg["B"], cfg["H"], cfg["L"], cfg["d"]
            rng = np.random.default_rng(0)
            q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                                   jnp.bfloat16) for _ in range(3))
            fl = attention_flops(B, H, L, d, causal=True)
            for bq, bk, pack in [(256, 1024, 8), (256, 2048, 8),
                                 (256, 2048, 4), (512, 2048, 4)]:
                try:
                    f = functools.partial(
                        flash_attention_forward, causal=True, block_q=bq,
                        block_k=bk, q_pack=pack)
                    r = benchmark(f, q, k, v,
                                  name=f"fw_L{L}_{pack}x{bq}x{bk}", flops=fl)
                    print(f"  fw L{L} {pack}x{bq}x{bk}: {r.mean_ms:7.3f} ms "
                          f"{r.tflops:5.1f} TF/s", flush=True)
                except Exception as e:
                    print(f"  fw L{L} {pack}x{bq}x{bk}: FAILED "
                          f"({type(e).__name__}: {str(e)[:100]})", flush=True)

    if which in ("packed", "all"):
        print("== packed prototype at the north-star shape ==", flush=True)
        run_packed(NORTHSTAR)
        print("== packed prototype at the headline shape ==", flush=True)
        run_packed(HEADLINE)


if __name__ == "__main__":
    main()
