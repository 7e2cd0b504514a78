"""Isolated repro of the 2026-08 pool-toolchain TPU worker crash on the
fused ``jnp.mean`` reduce in the MT train step.

Two forms of the SAME masked-MLE loss (apps/machine_translation.py:34-73),
identical math:

    mean:  jnp.mean(weighted)                 -> worker CRASH at compile
    sum:   jnp.sum(weighted) / weighted.size  -> compiles + runs fine

Shapes/config match the crashing run exactly (runs/mt_deen, 2026-08-20):
B=129 (the reference's (128*40+L)//L batch rule), L=40, vocab 4000,
n_embd 256, 4 layers, bf16 params, flash attention, Adam. Observed 3x in
runs/mt_deen_train.log{,.1,.2}; the single-variable isolation pair is
vendored as tools/repro_mean_crash_{mean,sum}.log (originally
/tmp/rmean.log vs /tmp/rs2.log — same step, only the loss reduce changed).

Usage (ONE form per process — the crash kills the worker):

    python tools/repro_mean_crash.py sum    # control: expected OK
    python tools/repro_mean_crash.py mean   # expected: UNAVAILABLE crash

Reference analog of the loss being reduced:
project/run_machine_translation.py:157-181 (loss * mask then mean).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash import nn


def main():
    form = sys.argv[1] if len(sys.argv) > 1 else "sum"
    assert form in ("mean", "sum"), form
    print("backend:", jax.default_backend(), flush=True)

    B, L, V = 129, 40, 4000
    cfg = nn.DecoderConfig(
        n_vocab=V, n_embd=256, n_head=8, n_positions=L, n_layer=4,
        p_dropout=0.1, attention_kind="flash", dtype=jnp.bfloat16)
    model = nn.DecoderLM(cfg)
    key = jax.random.key(0)
    key, pkey = jax.random.split(key)
    params = model.init(pkey)
    opt = nn.adam(lr=0.003)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, V, (B, L)), jnp.int32),
        "label_token_weights": jnp.asarray(
            rng.integers(0, 2, (B, L)), jnp.float32),
    }

    def loss_fn(params, batch, key):
        out = model(params, batch["input_ids"], key=key, training=True)
        losses = nn.functional.softmax_loss(out, batch["labels"])
        weighted = losses * batch["label_token_weights"]
        if form == "mean":
            return jnp.mean(weighted)          # <- the crashing reduce
        return jnp.sum(weighted) / weighted.size

    @jax.jit
    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    t0 = time.time()
    params, opt_state, loss = train_step(params, opt_state, batch, key)
    print(f"{form}-loss step ok loss={float(loss):.4f} "
          f"{time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
