"""Scaling-efficiency benchmark: SPMD train-step tokens/sec across mesh
shapes (BASELINE target: >= 85% tokens/s scaling efficiency on a 2-host v5e
slice).

On real hardware this measures; with a single chip it reports the 1-chip
baseline; under JAX_PLATFORMS=cpu + xla_force_host_platform_device_count it
validates the sharded-step mechanics (numbers are not meaningful on CPU).

Usage:
  python -m bench.bench_scaling                    # all mesh splits of the
                                                   # available devices
  python -m bench.bench_scaling --meshes 1x1,2x4   # explicit data x model
"""

from __future__ import annotations

import argparse
import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--meshes", default=None,
                    help="comma list of DATAxMODEL, default: auto")
    ap.add_argument("--n-embd", type=int, default=512)
    ap.add_argument("--n-layer", type=int, default=4)
    ap.add_argument("--seq", type=int, default=1024)
    ap.add_argument("--batch-per-data", type=int, default=8)
    args = ap.parse_args()

    from tpu_flash import nn, parallel
    from tpu_flash.utils.timing import benchmark

    n_dev = len(jax.devices())
    if args.meshes:
        meshes = [tuple(int(x) for x in m.split("x"))
                  for m in args.meshes.split(",")]
    else:
        meshes = []
        n = 1
        while n <= n_dev:
            model = min(n, 8)
            while n % model:
                model //= 2
            meshes.append((n // model, model))
            n *= 2

    base_tok_s = None
    for data, model_par in meshes:
        if data * model_par > n_dev:
            break
        ctx = parallel.make_mesh(
            data=data, model=model_par,
            devices=jax.devices()[:data * model_par])
        cfg = nn.DecoderConfig(
            n_vocab=10_000, n_embd=args.n_embd, n_head=8,
            n_positions=args.seq, n_layer=args.n_layer, p_dropout=0.0,
            attention_kind="flash")
        model = nn.DecoderLM(cfg)
        opt = nn.adam(lr=1e-3)

        def loss_fn(params, batch, key=None, training=False):
            logits = model(params, batch["input_ids"], key=key,
                           training=training)
            losses = nn.functional.softmax_loss(logits, batch["labels"])
            return jnp.mean(losses * batch["label_token_weights"])

        params, opt_state, _ = parallel.init_sharded(
            ctx, model, opt, jax.random.key(0))
        B = args.batch_per_data * data
        rng = np.random.default_rng(0)
        batch = parallel.put_batch(ctx, {
            "input_ids": rng.integers(0, 10_000, (B, args.seq)
                                      ).astype(np.int32),
            "labels": rng.integers(0, 10_000, (B, args.seq)
                                   ).astype(np.int32),
            "label_token_weights": rng.random((B, args.seq)
                                              ).astype(np.float32),
        })
        step = parallel.make_sharded_train_step(ctx, model, opt, loss_fn)

        def run(params, opt_state, batch):
            p, s, loss = step(params, opt_state, batch, jax.random.key(1))
            return p, s, loss

        r = benchmark(run, params, opt_state, batch,
                      name=f"{data}x{model_par}", repeats=4)
        tok_s = B * args.seq / (r.mean_ms * 1e-3)
        n_chips = data * model_par
        if base_tok_s is None:
            base_tok_s = tok_s
        eff = tok_s / (base_tok_s * n_chips)
        print(json.dumps({
            "metric": f"train_tokens_per_sec_{data}x{model_par}",
            "value": round(tok_s),
            "unit": "tokens/s",
            "chips": n_chips,
            "scaling_efficiency": round(eff, 3),
        }))
        parallel.set_parallel_context(None)


if __name__ == "__main__":
    main()
