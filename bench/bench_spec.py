"""Speculative-decoding benchmark: cost of multi-token verification.

The speculative win rests on one hardware fact: decode attention is
HBM-bandwidth-bound, so the flash-decode kernel verifying Lq draft tokens
(block-diagonal row group, kernels/decode.py) streams the same cache bytes
as a single-token step.  This measures t(Lq)/t(1) for the kernel and for a
full DecoderLM step — the per-token speedup at acceptance rate a is then
    (E[accepted]+1) / (t_verify(Lq)/t_step(1) + draft_cost_ratio * Lq)
Run:  python bench/bench_spec.py
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
    from tpu_flash.inference import make_caches
    from tpu_flash.kernels.decode import flash_decode_attention as fda
    from tpu_flash.utils.timing import benchmark

    rng = np.random.default_rng(0)
    B, H, S, d = 8, 8, 8192, 64
    k = jnp.asarray(rng.standard_normal((B, S, H * d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, S, H * d)), jnp.bfloat16)
    lengths = jnp.asarray([S] * B, jnp.int32)

    out = {}
    t1 = None
    for Lq in (1, 2, 4, 8):
        q = jnp.asarray(rng.standard_normal((B, H, Lq, d)), jnp.bfloat16)
        t = benchmark(lambda q: fda(q, k, v, lengths), q,
                      name=f"Lq{Lq}").mean_ms
        t1 = t1 or t
        out[f"kernel_Lq{Lq}_ms"] = round(t, 4)
        out[f"kernel_Lq{Lq}_vs_Lq1"] = round(t / t1, 2)

    # model-level: one verification forward (Lq tokens through the whole
    # decoder with caches) vs one decode step, production-ish config
    cfg = nn.DecoderConfig(
        n_vocab=10_000, n_embd=512, n_head=8, n_positions=4096, n_layer=4,
        p_dropout=0.0, attention_kind="flash", dtype=jnp.bfloat16)
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    Bm, Sm = 8, 2048
    caches = make_caches(model, Bm, Sm + 16, compute_dtype=jnp.bfloat16)
    import dataclasses
    caches = [dataclasses.replace(
        c, lengths=jnp.full((Bm,), Sm, jnp.int32)) for c in caches]

    def step(ids, caches, Lq):
        pos = caches[0].lengths[:, None] + jnp.arange(Lq, dtype=jnp.int32)
        logits, _ = model(params, ids, kv_caches=caches, positions=pos)
        return logits

    tm1 = None
    for Lq in (1, 4):
        ids = jnp.asarray(rng.integers(0, 10_000, (Bm, Lq)), jnp.int32)
        fn = jax.jit(lambda ids, Lq=Lq: step(ids, caches, Lq))
        t = benchmark(fn, ids, name=f"model_Lq{Lq}").mean_ms
        tm1 = tm1 or t
        out[f"model_Lq{Lq}_ms"] = round(t, 4)
        out[f"model_Lq{Lq}_vs_Lq1"] = round(t / tm1, 2)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
