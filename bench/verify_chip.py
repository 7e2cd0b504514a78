"""On-chip verification drive: kernel parity + speculative engine e2e.

Run on the REAL TPU (plain `python`): proves the Mosaic-compiled kernels
and the serving stack (prefill buckets, multi-token decode, speculative
draft-verify rounds) work outside the CPU interpreter used by pytest.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    assert jax.default_backend() != "cpu", jax.default_backend()
    print("backend:", jax.default_backend(), flush=True)

    # ---- 1. flash-attention kernel parity ---------------------------------
    from tpu_flash import flash_attention, naive_attention
    rng = np.random.default_rng(0)
    q, k, v, do = (jnp.asarray(rng.standard_normal((2, 8, 512, 64)),
                               jnp.float32) for _ in range(4))
    t0 = time.time()
    with jax.default_matmul_precision("highest"):
        err = float(jnp.max(jnp.abs(
            flash_attention(q, k, v, causal=True)
            - naive_attention(q, k, v, causal=True))))
        g = jax.grad(lambda *a: jnp.sum(
            flash_attention(*a, causal=True) * do), (0, 1, 2))(q, k, v)
        ge = jax.grad(lambda *a: jnp.sum(
            naive_attention(*a, causal=True) * do), (0, 1, 2))(q, k, v)
    bw = [float(jnp.max(jnp.abs(a - b))) for a, b in zip(g, ge)]
    print(f"fa fw err {err:.2e} bw errs "
          f"{['%.2e' % e for e in bw]}  ({time.time()-t0:.0f}s)", flush=True)
    assert err < 1e-3 and all(e < 1e-2 for e in bw)

    # ---- 2. speculative engine vs plain engine (greedy, exactness) --------
    from tpu_flash import nn
    from tpu_flash.inference.engine import DecodeEngine, Request
    from tpu_flash.inference.sampler import SamplingConfig

    cfg = nn.DecoderConfig(n_vocab=256, n_embd=128, n_head=4,
                           n_positions=256, n_layer=2, p_dropout=0.0,
                           attention_kind="flash", dtype=jnp.bfloat16)
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    dcfg = nn.DecoderConfig(n_vocab=256, n_embd=64, n_head=2,
                            n_positions=256, n_layer=1, p_dropout=0.0,
                            attention_kind="naive", dtype=jnp.bfloat16)
    draft = nn.DecoderLM(dcfg)
    dparams = draft.init(jax.random.key(1))
    samp = SamplingConfig(max_new_tokens=16)
    prompts = {1: [5, 6, 7], 2: [9, 8, 7, 6], 3: [11, 12, 13, 14, 15]}

    t0 = time.time()
    plain = DecodeEngine(model, params, n_slots=2, max_len=128,
                         sampling=samp)
    for uid, p in prompts.items():
        plain.submit(Request(uid, p))
    ref = {c.uid: c.tokens for c in plain.run_many(8)}
    print(f"plain engine done ({time.time()-t0:.0f}s)", flush=True)

    t0 = time.time()
    spec = DecodeEngine(model, params, n_slots=2, max_len=128,
                        sampling=samp, draft_model=draft,
                        draft_params=dparams, n_draft=4)
    for uid, p in prompts.items():
        spec.submit(Request(uid, p))
    got = {c.uid: c.tokens for c in spec.run_speculative()}
    print(f"spec engine done ({time.time()-t0:.0f}s)", flush=True)
    assert got == ref, (got, ref)
    print("speculative == plain:", {u: t[:6] for u, t in got.items()},
          flush=True)
    print("ALL OK", flush=True)


if __name__ == "__main__":
    main()
