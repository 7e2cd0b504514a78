"""Decode tokens/sec/chip for a production-config DecoderLM.

The BASELINE.md north-star metric: sustained decode throughput per chip with
a quantized KV cache on a production-size model (E >= 512, cache >= 8k),
DEVICE-time based — the timed program is an N-token greedy decode loop
inside ONE jit (lax.scan), so the ~40 ms tunneled host round-trip never
pollutes the number (utils/timing.py then measures the marginal cost).

At this scale decode is KV-bound: per step the model streams the whole
cache (n_layer * 2 * B * S * E bytes) plus the weights; int8/fp8 caches
halve the dominant term, which is exactly why they are the production
default.  Reference baseline: the reference has NO KV cache at all — its
generate() re-runs the full O(L^2) forward per token
(project/run_machine_translation.py:250-301).

Run:  python bench/bench_decode_model.py
"""

import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_flash import nn
    from tpu_flash.inference.kv_cache import KVCache
    from tpu_flash.utils.timing import benchmark

    B, S, S0, NTOK = 8, 8192, 8064, 16
    cfg = nn.DecoderConfig(
        n_vocab=32768, n_embd=1024, n_head=16, n_positions=S,
        n_layer=8, ff_middle_dim=4096, p_dropout=0.0,
        attention_kind="flash", dtype=jnp.bfloat16)
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    n_params = sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(params))
    rng = np.random.default_rng(0)
    d = cfg.n_embd // cfg.n_head

    results = {"model": f"E={cfg.n_embd} L{cfg.n_layer} H{cfg.n_head} "
                        f"V={cfg.n_vocab} ff={cfg.ff_middle_dim} "
                        f"({n_params / 1e6:.0f}M params)",
               "batch": B, "cache_len": S0}
    for quant in ("none", "int8", "fp8"):
        caches = [KVCache.create(B, cfg.n_head, S, d, quant=quant,
                                 compute_dtype=jnp.bfloat16)
                  for _ in range(cfg.n_layer)]
        # fill S0 positions with synthetic KV (decode regime: long prefix)
        fill_k = jnp.asarray(rng.standard_normal((B, cfg.n_head, S0, d)),
                             jnp.bfloat16)
        fill_v = jnp.asarray(rng.standard_normal((B, cfg.n_head, S0, d)),
                             jnp.bfloat16)
        caches = [c.append(fill_k, fill_v) for c in caches]
        tok0 = jnp.asarray(rng.integers(0, cfg.n_vocab, (B,)), jnp.int32)

        def decode_n(params, caches, tok):
            """NTOK greedy tokens for every slot inside one jit.

            Returns a FLOAT aggregate that depends on every step's logits:
            the timing harness chains iterations through float output
            leaves, and an int32-only output lets XLA dead-code the whole
            decode (measured: "0.000 ms/step")."""
            def body(carry, _):
                caches, tok, acc = carry
                positions = caches[0].lengths[:, None]
                logits, caches = model(params, tok[:, None],
                                       kv_caches=caches, positions=positions)
                nxt = jnp.argmax(logits[:, 0, :], axis=-1).astype(jnp.int32)
                acc = acc + jnp.sum(logits[:, 0, :].astype(jnp.float32))
                return (caches, nxt, acc), nxt
            (caches, tok, acc), toks = jax.lax.scan(
                body, (caches, tok, jnp.float32(0.0)), None, length=NTOK)
            return acc, toks

        r = benchmark(decode_n, params, caches, tok0,
                      name=f"decode[{quant}]")
        per_tok_ms = r.mean_ms / NTOK
        toks_per_s = B * 1e3 / per_tok_ms
        cache_bytes = cfg.n_layer * 2 * B * S0 * cfg.n_embd * (
            1 if quant != "none" else 2)
        scale_bytes = (cfg.n_layer * 2 * B * cfg.n_head * S0 * 4
                       if quant != "none" else 0)
        weight_bytes = n_params * 2
        eff_gbs = (cache_bytes + scale_bytes + weight_bytes) / (
            per_tok_ms * 1e-3) / 1e9
        results[quant] = {
            "ms_per_step": round(per_tok_ms, 4),
            "tokens_per_sec_chip": round(toks_per_s),
            "streamed_GBps": round(eff_gbs, 1),
        }
        print(f"{quant:5s}: {per_tok_ms:.3f} ms/step  "
              f"{toks_per_s:,.0f} tok/s/chip  (~{eff_gbs:.0f} GB/s "
              f"cache+weights)", flush=True)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
