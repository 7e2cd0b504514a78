"""EXPERIMENT (r5): per-CHANNEL KV scales — the scale-free kernel form —
vs per-token scales vs bf16, interleaved in ONE session (cross-session
chip noise is ±3-10%, CLAUDE.md; only interleaved rankings are trusted).

VERDICT r4 #1: the int8-KV north star sits at 0.878 of roofline vs
bf16's 0.921 at B=1 H=8 L=8192 d=64, and the round-4 irreducibility
table pins the gap on the in-kernel scale folds + casts.  Channel
granularity removes ALL in-kernel scale work (the [d] scales fold into
Q/dO outside the kernel) and restores the folded-l ones column, so the
kernel body is the bf16 body plus one code cast per tile.

Also folds in VERDICT r4 #8: the bf16 L=8192 qw-vs-wq claim was inside
cross-session noise — re-measured here interleaved, n=3 each.

Measures at B=1 H=8 L=8192 d=64 causal (plus the L=2048 headline shape),
ROUNDS interleaved rounds each:
  * bf16 fw / fw+bw (score_layout auto, plus qw and wq explicitly at 8k)
  * int8 per-token fw / fw+bw
  * int8 per-channel fw / fw+bw (auto=qw; plus wq explicitly)
  * fp8 per-channel fw+bw

Run on the chip:  python -m bench.exp_kv_channel
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.kernels.flash_attention import flash_attention_forward
from tpu_flash.ops.attention import _flash_attention_quantkv, flash_attention
from tpu_flash.utils.timing import attention_flops, benchmark

ROUNDS = 3


def fwbw(fn, do):
    def f(q, k, v):
        def loss(q, k, v):
            return jnp.sum(fn(q, k, v).astype(jnp.float32)
                           * do.astype(jnp.float32))
        return jax.grad(loss, (0, 1, 2))(q, k, v)
    return f


def main():
    rng = np.random.default_rng(0)
    H, d = 8, 64
    for B, L in ((1, 8192), (4, 2048)):
        q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                                   jnp.bfloat16) for _ in range(4))
        flops = attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True)
        fw_flops = attention_flops(B, H, L, d, causal=True)

        def quant_layout(mode, layout):
            # explicit score_layout rides through the raw backward only;
            # for layout sweeps call the kernel pair directly
            def f(q, k, v):
                return _flash_attention_quantkv(
                    q, k, v, jnp.int32(0), None, True, 0.0, mode, None)
            return f

        cases = {
            "bf16_auto": lambda q, k, v: flash_attention(q, k, v,
                                                         causal=True),
            "int8_token": quant_layout("int8", None),
            "int8_chan": quant_layout("int8_channel", None),
            "fp8_chan": quant_layout("fp8_channel", None),
        }
        fw_cases = {
            "bf16_fw": lambda q, k, v: flash_attention_forward(
                q, k, v, causal=True),
        }

        results = {name: [] for name in
                   list(cases) + list(fw_cases) + ["int8_tok_fw",
                                                   "int8_chan_fw"]}
        from tpu_flash.ops.attention import _quantize_kv

        def quant_fw(mode):
            def f(q, k, v):
                kc, ks = _quantize_kv(k, mode)
                vc, vs = _quantize_kv(v, mode)
                out, _, _ = flash_attention_forward(
                    q, kc.transpose(0, 1, 3, 2), vc.transpose(0, 1, 3, 2),
                    ks, vs, causal=True, kv_layout="dl",
                    kv_scale_mode=("channel" if mode.endswith("channel")
                                   else "token"))
                return out
            return f

        fw_cases["int8_tok_fw"] = quant_fw("int8")
        fw_cases["int8_chan_fw"] = quant_fw("int8_channel")

        for r in range(ROUNDS):
            for name, fn in cases.items():
                t = benchmark(fwbw(fn, do), q, k, v,
                              name=f"{name} L{L} r{r}", flops=flops)
                results[name].append(t.mean_ms)
            for name, fn in fw_cases.items():
                key = "bf16_fw" if name == "bf16_fw" else name
                t = benchmark(fn, q, k, v, name=f"{name} L{L} r{r}",
                              flops=fw_flops)
                results[key].append(t.mean_ms)

        print(f"\n== B={B} L={L} (ms per call, {ROUNDS} interleaved "
              f"rounds) ==")
        for name, ms in results.items():
            if not ms:
                continue
            fl = fw_flops if name.endswith("fw") else flops
            best = min(ms)
            print(f"  {name:14s} {', '.join(f'{m:.3f}' for m in ms)}"
                  f"   best {best:.3f} ms = {fl / best / 1e9:.1f} TF/s")

    # qw vs wq at bf16 L=8192, interleaved (VERDICT r4 #8) + channel-wq
    from tpu_flash.kernels import flash_attention as fa
    B, L = 1, 8192
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.bfloat16) for _ in range(4))
    out, lse, _ = jax.block_until_ready(
        flash_attention_forward(q, k, v, causal=True))
    kc, ks = _quantize_kv(k, "int8_channel")
    vc, vs = _quantize_kv(v, "int8_channel")
    kcT, vcT = kc.transpose(0, 1, 3, 2), vc.transpose(0, 1, 3, 2)
    outq, lseq, _ = jax.block_until_ready(flash_attention_forward(
        q, kcT, vcT, ks, vs, causal=True, kv_layout="dl",
        kv_scale_mode="channel"))
    bw_flops = (attention_flops(B, H, L, d, causal=True, fwd_and_bwd=True)
                - attention_flops(B, H, L, d, causal=True))

    def bwd(layout):
        def f(q, k, v):
            return fa.flash_attention_backward(
                q, k, v, out, lse, do, causal=True, score_layout=layout)
        return f

    def bwd_chan(layout):
        def f(q, k, v):
            return fa.flash_attention_backward(
                q, kcT, vcT, outq, lseq, do, None, ks, vs, causal=True,
                kv_layout="dl", kv_scale_mode="channel",
                score_layout=layout)
        return f

    rows = {"bf16_bw_qw": bwd("qw"), "bf16_bw_wq": bwd("wq"),
            "chan_bw_qw": bwd_chan("qw"), "chan_bw_wq": bwd_chan("wq")}
    res = {name: [] for name in rows}
    for r in range(ROUNDS):
        for name, fn in rows.items():
            t = benchmark(fn, q, k, v, name=f"{name} r{r}", flops=bw_flops)
            res[name].append(t.mean_ms)
    print(f"\n== backward-only L=8192 qw vs wq ({ROUNDS} interleaved "
          f"rounds) ==")
    for name, ms in res.items():
        print(f"  {name:12s} {', '.join(f'{m:.3f}' for m in ms)}"
              f"   best {min(ms):.3f} ms = {bw_flops / min(ms) / 1e9:.1f}"
              f" TF/s")


if __name__ == "__main__":
    main()
