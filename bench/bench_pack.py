"""Sequence-packing end-to-end benchmark: padded vs packed train step on the
synthetic MT corpus (reference model config), measured as EXAMPLES/sec —
the fair unit, since packing shrinks rows-per-step, not work-per-example.

Run:  python -m bench.bench_pack [--model-max-length 64]
"""

from __future__ import annotations

import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def main(L: int = 64, n_examples: int = 512):
    from tpu_flash import nn
    from tpu_flash.data import mt
    from tpu_flash.apps.machine_translation import make_train_step
    from tpu_flash.utils.timing import benchmark

    data = mt.synthetic_translation_dataset(
        n_train=n_examples, n_validation=1, n_test=1)
    tok = mt.get_tokenizer(data["train"], 500, "de", "en",
                           workdir="/tmp/bench_pack_tok")
    examples = data["train"]

    padded = mt.collate_batch(examples, "de", "en", tok, L)
    packed = mt.collate_packed(examples, "de", "en", tok, L)
    rows_packed = packed["input_ids"].shape[0]
    real_tokens = int((padded["input_ids"]
                       != tok.vocab["<pad>"]).sum())
    print(json.dumps({
        "examples": len(examples), "row_length": L,
        "padded_rows": len(examples), "packed_rows": rows_packed,
        "row_compression": round(len(examples) / rows_packed, 2),
        "pad_fraction_padded": round(
            1 - real_tokens / padded["input_ids"].size, 3),
        "pad_fraction_packed": round(
            1 - real_tokens / packed["input_ids"].size, 3),
    }), flush=True)

    cfg = nn.DecoderConfig(
        n_vocab=500, n_embd=256, n_head=8, n_positions=L, n_layer=4,
        p_dropout=0.1, attention_kind="auto")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    opt = nn.adam(lr=0.01)
    opt_state = opt.init(params)
    step = make_train_step(model, opt)
    key = jax.random.key(1)

    results = {}
    for name, batch in (("padded", padded), ("packed", packed)):
        b = {k: jnp.asarray(v) for k, v in batch.items()}

        def run(params, opt_state):
            p2, o2, loss = step(params, opt_state, b, key)
            return p2, o2, loss

        r = benchmark(run, params, opt_state, name=f"train_{name}")
        results[name] = r.mean_ms
        print(f"{name}: {r.mean_ms:.2f} ms/step "
              f"({len(examples) / r.mean_ms * 1e3:,.0f} examples/s)",
              flush=True)
    print(json.dumps({
        "padded_ms": round(results["padded"], 3),
        "packed_ms": round(results["packed"], 3),
        "packed_speedup_examples_per_sec": round(
            results["padded"] / results["packed"], 2),
    }), flush=True)


if __name__ == "__main__":
    L = 64
    if "--model-max-length" in sys.argv:
        L = int(sys.argv[sys.argv.index("--model-max-length") + 1])
    main(L)
