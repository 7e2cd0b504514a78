"""Soak repro for the real-corpus MT worker crash (round 4).

After the jnp.mean -> sum/size workaround, the MT run gets PAST step 0
(loss 6.86 recorded) and the worker then crashes within the next ~10
steps, again at a host sync (runs/mt_deen_train.log, 2026-08-20).  The
synthetic run that survived 30 epochs (runs/mt_long) differed in exactly
two ways: fp32 + ``--attention-kind auto`` (which picks the NAIVE XLA
graph at L=40 — the flash kernel's crossover is ~512, nn/transformer.py).
The crashing runs use the Pallas flash path in bf16 at B=129 H8 L40 d32.

This soaks the EXACT train step for N steps with FRESH batches and
dropout keys each step (step 0 succeeding and step ~5 crashing means a
single-shot repro proves nothing):

    python tools/repro_flash_soak.py flash 30     # suspected-fault path
    python tools/repro_flash_soak.py naive 30     # control (mt_long's path)

If flash crashes and naive survives, the fault is the flash-kernel
program at this tiny shape on the 2026-08 pool toolchain; if both
survive, suspicion moves to pool/tunnel instability.
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
    kind = sys.argv[1] if len(sys.argv) > 1 else "flash"
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    dtype = (jnp.float32 if len(sys.argv) > 3 and sys.argv[3] == "fp32"
             else jnp.bfloat16)
    print("backend:", jax.default_backend(), "kind:", kind,
          "dtype:", dtype.__name__, flush=True)

    B, L, V = 129, 40, 4000
    cfg = nn.DecoderConfig(
        n_vocab=V, n_embd=256, n_head=8, n_positions=L, n_layer=4,
        p_dropout=0.1, attention_kind=kind, dtype=dtype)
    model = nn.DecoderLM(cfg)
    key = jax.random.key(0)
    key, pkey = jax.random.split(key)
    params = model.init(pkey)
    opt = nn.adam(lr=0.003)
    opt_state = opt.init(params)

    def loss_fn(params, batch, key):
        out = model(params, batch["input_ids"], key=key, training=True)
        losses = nn.functional.softmax_loss(out, batch["labels"])
        weighted = losses * batch["label_token_weights"]
        return jnp.sum(weighted) / weighted.size

    @jax.jit
    def train_step(params, opt_state, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, key)
        params, opt_state = opt.update(grads, opt_state, params)
        return params, opt_state, loss

    rng = np.random.default_rng(0)
    t0 = time.time()
    for step in range(n_steps):
        lens = rng.integers(4, L + 1, B)        # realistic padded batches
        ids = rng.integers(3, V, (B, L))
        wts = (np.arange(L)[None, :] < lens[:, None]).astype(np.float32)
        ids = np.where(wts > 0, ids, 0)
        batch = {
            "input_ids": jnp.asarray(ids, jnp.int32),
            "labels": jnp.asarray(np.roll(ids, -1, 1), jnp.int32),
            "label_token_weights": jnp.asarray(wts),
        }
        key, skey = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state, batch, skey)
        print(f"step {step}: loss={float(loss):.4f} "
              f"{time.time() - t0:.1f}s", flush=True)
    print(f"SOAK OK: {n_steps} {kind} steps survived", flush=True)


if __name__ == "__main__":
    main()
