"""BASELINE config 3: decoder block — fused LN + FA2 flash attention +
INT8 weight-only projections.

Two scenarios, both in the production dtype (bf16 activations):

* prefill: [B, L, E] full-sequence block forward — flash+fused vs the naive
  composed block (materialized scores, unfused LN);
* decode:  [B, 1, E] single-token projections (matvec-shaped) — int8
  weight-only vs bf16 weights, where weight bandwidth dominates.

Prints JSON lines with per-variant ms and speedups.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def _block(attention_kind, fused, n_embd, n_head, L, ff_mult=4):
    from tpu_flash import nn

    cfg = nn.DecoderConfig(
        n_vocab=32_000, n_embd=n_embd, n_head=n_head, n_positions=L,
        n_layer=1, ff_middle_dim=ff_mult * n_embd, p_dropout=0.0,
        attention_kind=attention_kind, use_fused_kernel=fused,
        dtype=jnp.bfloat16)
    layer = nn.TransformerLayer(cfg)
    return layer, layer.init(jax.random.key(0))


def main():
    from tpu_flash.nn.layers import quantize_model_linears
    from tpu_flash.utils.timing import benchmark

    rng = np.random.default_rng(0)
    results = {}

    # --- prefill block: E=1024, H=16, L=2048 ---------------------------
    B, L, E, H = 2, 2048, 1024, 16
    x = jnp.asarray(rng.standard_normal((B, L, E)), jnp.bfloat16)
    for name, (kind, fused, int8) in {
        "prefill_naive": ("naive", False, False),
        "prefill_flash_fused": ("flash", True, False),
        "prefill_flash_fused_int8w": ("flash", True, True),
    }.items():
        layer, params = _block(kind, fused, E, H, L)
        if int8:
            params = quantize_model_linears(params)
        r = benchmark(lambda p, x: layer(p, x), params, x,
                      name=name, repeats=5)
        results[name] = r.mean_ms
        print(json.dumps({"metric": f"decoder_block_{name}_ms",
                          "value": round(r.mean_ms, 4), "unit": "ms"}))

    # --- decode block: 64 sequences, one token each ----------------------
    # E=2048 puts the FFN weights (32MB bf16) well past VMEM so the compiler
    # cannot cache them across timing iterations — the regime where decode
    # actually lives (weights restream from HBM every layer).
    Bd, Ed = 64, 2048
    xd = jnp.asarray(rng.standard_normal((Bd, 1, Ed)), jnp.bfloat16)
    for name, int8 in {"decode_bf16w": False, "decode_int8w": True}.items():
        layer, params = _block("naive", True, Ed, H, 8)
        # time only the projections + FFN (attention needs a cache; the
        # cached-attention path is measured by bench_decode.py)
        ff, ffp = layer.ff, params["ff"]
        att, attp = layer.attention, params["attention"]
        if int8:
            ffp = quantize_model_linears(ffp)
            attp = quantize_model_linears(attp)

        def proj_ffn(attp, ffp, x):
            q = att.q_projection(attp["q_projection"], x)
            k = att.k_projection(attp["k_projection"], x)
            v = att.v_projection(attp["v_projection"], x)
            o = att.out_projection(attp["out_projection"], q + k + v)
            return ff(ffp, o)

        r = benchmark(proj_ffn, attp, ffp, xd, name=name, repeats=5)
        results[name] = r.mean_ms
        print(json.dumps({"metric": f"decoder_block_{name}_ms",
                          "value": round(r.mean_ms, 4), "unit": "ms"}))

    print(json.dumps({
        "metric": "decoder_block_prefill_flash_fused_int8w_speedup_vs_naive",
        "value": round(results["prefill_naive"]
                       / results["prefill_flash_fused_int8w"], 3),
        "unit": "x"}))
    print(json.dumps({
        "metric": "decoder_block_decode_int8w_speedup_vs_bf16w",
        "value": round(results["decode_bf16w"] / results["decode_int8w"], 3),
        "unit": "x"}))


if __name__ == "__main__":
    main()
