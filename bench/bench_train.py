"""End-to-end decoder-LM training throughput: flash vs fused vs naive.

The analog of the reference's own headline plot ("LLM Speedup":
end-to-end MT training speedup of flash over the fused-kernel and naive
attention paths, README.md:15-16) and its tokens/sec train-loop metric
(run_machine_translation.py:196-220), measured with the marginal-timing
harness on one chip.

Model = the reference MT config: n_embd=256, n_head=8, 4 layers, vocab 10k,
L=256, dynamic reference batch ~ (128*40+L)/L -> 20 at L=256 (rounded to 32
for tiling).  Full train step: forward + backward + adam update.
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from tpu_flash import nn
    from tpu_flash.utils.timing import benchmark

    rng = np.random.default_rng(0)
    configs = {
        # the reference's own MT config: L*d_head is tiny, XLA naive wins
        "ref": dict(B=32, L=256, n_embd=256, n_layer=4),
        # production scale: d_head=64, long sequences — flash territory
        "big": dict(B=4, L=2048, n_embd=512, n_layer=4),
    }
    results = {}
    for cname, cc in configs.items():
      B, L = cc["B"], cc["L"]
      ids = jnp.asarray(rng.integers(0, 10_000, (B, L)), jnp.int32)
      tgt = jnp.asarray(rng.integers(0, 10_000, (B, L)), jnp.int32)
      w = jnp.asarray(rng.random((B, L)) > 0.5, jnp.float32)
      for kind, fused in (("naive", False), ("fused", True),
                          ("flash", False)):
        if cname == "big" and kind == "fused":
            continue  # fused softmax materializes [B,H,L,L]: same as naive
        cfg = nn.DecoderConfig(
            n_vocab=10_000, n_embd=cc["n_embd"], n_head=8, n_positions=L,
            n_layer=cc["n_layer"], p_dropout=0.0,
            attention_kind=kind,
            use_fused_kernel=fused)
        model = nn.DecoderLM(cfg)
        params = model.init(jax.random.key(0))
        opt = nn.adam(lr=1e-3)
        opt_state = opt.init(params)

        def loss_fn(p, model=model, ids=ids, tgt=tgt, w=w):
            logits = model(p, ids)
            losses = nn.functional.softmax_loss(logits, tgt)
            return jnp.mean(losses * w)

        def step(p, s, loss_fn=loss_fn, opt=opt):
            loss, grads = jax.value_and_grad(loss_fn)(p)
            p, s = opt.update(grads, s, p)
            return p, s, loss

        r = benchmark(step, params, opt_state, name=kind, repeats=4)
        tok_s = B * L / (r.mean_ms * 1e-3)
        results[(cname, kind)] = r.mean_ms
        print(json.dumps({"metric": f"mt_train_{cname}_{kind}_ms",
                          "value": round(r.mean_ms, 3), "unit": "ms",
                          "tokens_per_sec": round(tok_s)}))

    for cname in configs:
        print(json.dumps({
            "metric": f"mt_train_{cname}_flash_speedup_vs_naive",
            "value": round(results[(cname, "naive")]
                           / results[(cname, "flash")], 3),
            "unit": "x",
        }))


if __name__ == "__main__":
    main()
