"""Fused lm_head+cross-entropy benchmark: chunked vs dense loss, fwd+bwd.

The reference materializes the full [B, L, V] logits tensor into softmax_loss
(minitorch/nn.py:256-274).  ``chunked_softmax_loss`` streams the lm_head in
vocab slices with an online logsumexp, so the logits never exist — the win
is HBM traffic and peak memory, which is what this measures: wall time of
loss+grads at the reference MT shape and at a large-vocab shape, plus the
analytic activation-memory ratio.

Run:  python -m bench.bench_vocab_loss [--large]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def run_case(B, L, E, V, n_chunks, dtype):
    from tpu_flash.nn import functional as F
    from tpu_flash.utils.timing import benchmark

    rng = np.random.default_rng(0)
    hidden = jnp.asarray(rng.standard_normal((B, L, E)), dtype)
    weight = jnp.asarray(rng.standard_normal((E, V)) / np.sqrt(E), dtype)
    bias = jnp.zeros((V,), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32)

    def dense(h, w, b):
        logits = jnp.dot(h, w, preferred_element_type=jnp.float32) + b
        return jnp.sum(F.softmax_loss(logits, labels))

    def chunked(h, w, b):
        return jnp.sum(F.chunked_softmax_loss(h, w, b, labels,
                                              n_chunks=n_chunks))

    results = {}
    for name, fn in (("dense", dense), ("chunked", chunked)):
        g = jax.jit(jax.grad(fn, argnums=(0, 1, 2)))

        def run(h, w, b):
            return g(h, w, b)

        r = benchmark(run, hidden, weight, bias, name=name)
        results[name] = r.mean_ms

    logits_mb = B * L * V * 4 / 2**20
    chunk_mb = B * L * (-(-V // n_chunks)) * 4 / 2**20
    out = {
        "shape": f"B{B} L{L} E{E} V{V}", "dtype": str(dtype.__name__),
        "n_chunks": n_chunks,
        "dense_ms": round(results["dense"], 3),
        "chunked_ms": round(results["chunked"], 3),
        "chunked_vs_dense": round(results["dense"] / results["chunked"], 2),
        "logits_mb_dense": round(logits_mb, 1),
        "logits_mb_chunked_peak": round(chunk_mb, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main(large: bool = False):
    # reference MT config: vocab 10k, n_embd 256, batch (128*40+L)/L
    run_case(B=81, L=64, E=256, V=10_240, n_chunks=8, dtype=jnp.float32)
    if large:
        # modern-LM regime where the fused loss is load-bearing: 64k vocab,
        # bf16 activations; dense materializes 2 GB of fp32 logits in bwd
        run_case(B=8, L=1024, E=1024, V=65_536, n_chunks=16,
                 dtype=jnp.bfloat16)


if __name__ == "__main__":
    main(large="--large" in sys.argv)
