"""Speculative decoding with a TRAINED draft on the MT task (VERDICT r4
#4): the round-4 serving table's speculative row used a random-init draft
— zero acceptance by construction, measuring pure overhead.  This runs
the trained de-en target (runs/mt_deen) against a small draft trained on
the SAME corpus/tokenizer (runs/mt_draft, see below), over a Poisson
trace of real test-set prompts, and records acceptance + tok/s for:

  * plain per-token decode (the reference point)
  * step_many(4) multi-token scan
  * speculative n_draft in {2, 4} with the acceptance-aware guard ON
    (DecodeEngine.run_speculative probation — engine.spec_decision shows
    what the guard measured and chose)
  * speculative with a RANDOM draft (the honest overhead control)

Train the draft first (same dataset/model_max_length/n_vocab => the BPE
tokenizer retrains identically, so token ids line up):

  python -m tpu_flash.apps.machine_translation --dataset local \
      --model-max-length 40 --n-vocab 4000 --n-embd 128 --n-head 4 \
      --n-layer 2 --n-epochs 12 --workdir runs/mt_draft --skip-bleu

Run:  python bench/bench_spec_mt.py [--target runs/mt_deen]
      [--draft runs/mt_draft] [--rate 12] [--n-requests 48]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np


def load_model(workdir):
    from tpu_flash import nn
    from tpu_flash.utils import restore_checkpoint

    tree, step, meta = restore_checkpoint(f"{workdir}/checkpoints")
    c = meta["config"]
    cfg = nn.DecoderConfig(
        n_vocab=c["n_vocab"], n_embd=c["n_embd"], n_head=c["n_head"],
        n_positions=c["model_max_length"], n_layer=c["n_layer"],
        p_dropout=0.0, attention_kind=c["attention_kind"])
    return nn.DecoderLM(cfg), tree["params"], c, step


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", default="runs/mt_deen")
    ap.add_argument("--draft", default="runs/mt_draft")
    ap.add_argument("--rate", type=float, default=12.0)
    ap.add_argument("--n-requests", type=int, default=48)
    ap.add_argument("--n-slots", type=int, default=8)
    args = ap.parse_args()

    from tpu_flash.data import mt
    from tpu_flash.inference.engine import DecodeEngine, Request
    from tpu_flash.inference.sampler import SamplingConfig

    model, params, c, step = load_model(args.target)
    print(json.dumps({"target": args.target, "epoch": step,
                      "cfg": {k: c[k] for k in
                              ("n_embd", "n_layer", "n_vocab")}}))
    draft, dparams, dc, dstep = load_model(args.draft)
    print(json.dumps({"draft": args.draft, "epoch": dstep,
                      "cfg": {k: dc[k] for k in
                              ("n_embd", "n_layer", "n_vocab")}}))
    assert dc["n_vocab"] == c["n_vocab"], "draft/target vocab mismatch"

    L = c["model_max_length"]
    data, src_key, tgt_key = mt.get_dataset(c["dataset"], L)
    tok = mt.get_tokenizer(data["train"], c["n_vocab"], src_key, tgt_key,
                           args.target)
    eos_tgt = tok.vocab[f"<eos_{tgt_key}>"]
    # random draft control: same architecture as the trained draft
    rand_dparams = draft.init(jax.random.key(99))

    # Poisson trace over real test prompts
    rng = np.random.default_rng(0)
    gaps = rng.exponential(1.0 / args.rate, args.n_requests)
    arrivals = np.cumsum(gaps)
    exs = [data["test"][i % len(data["test"])]
           for i in range(args.n_requests)]
    prompts = [tok(f"{ex[src_key]}<eos_{src_key}>")["input_ids"]
               for ex in exs]
    max_len = 2 * L       # prompt + completion headroom
    sampling = SamplingConfig(temperature=0.0, eos_id=eos_tgt,
                              max_new_tokens=L)

    def run(mode, dm=None, dp=None, n_draft=4, probe=8):
        engine = DecodeEngine(
            model, params, n_slots=args.n_slots, max_len=max_len,
            sampling=sampling, draft_model=dm, draft_params=dp,
            n_draft=n_draft)
        t0 = time.monotonic()
        i, done = 0, []
        while i < len(prompts) or engine.has_work():
            now = time.monotonic() - t0
            while i < len(prompts) and arrivals[i] <= now:
                engine.submit(Request(i, prompts[i]))
                i += 1
            if not engine.has_work():
                time.sleep(max(0.0, arrivals[i] - (time.monotonic() - t0)))
                continue
            if mode == "spec":
                done.extend(engine.run_speculative(probe_rounds=probe)
                            if probe else
                            engine.run_speculative(probe_rounds=None))
            elif mode == "many":
                engine.admit()
                engine.step_many(4)
            else:
                engine.admit()
                engine.step()
        # drain completions for the step modes
        done.extend(engine.completions)
        makespan = time.monotonic() - t0
        n_tok = sum(len(cc.tokens) for cc in done)
        row = {"tokens": n_tok, "makespan_s": round(makespan, 2),
               "tok_per_s": round(n_tok / makespan, 1)}
        st = engine._spec_stats
        if st["rounds"]:
            row["acceptance"] = round(st["accepted"]
                                      / max(st["proposed"], 1), 3)
            row["emitted_per_round"] = round(st["emitted"] / st["rounds"],
                                             2)
        if engine.spec_decision is not None:
            d = engine.spec_decision
            row["guard"] = {"mode": d["mode"],
                            "spec_tps": round(d["spec_tps"], 1),
                            "plain_tps": round(d["plain_tps"], 1),
                            "acceptance": round(d["acceptance"], 3)}
        # token-identical across modes (greedy): fingerprint the outputs
        row["output_fp"] = hash(tuple(sorted(
            (cc.uid, tuple(cc.tokens)) for cc in done))) % 10**8
        return row

    for label, kw in [
        ("plain", dict(mode="step")),
        ("step_many(4)", dict(mode="many")),
        ("spec(trained,n=2)", dict(mode="spec", dm=draft, dp=dparams,
                                   n_draft=2)),
        ("spec(trained,n=4)", dict(mode="spec", dm=draft, dp=dparams,
                                   n_draft=4)),
        ("spec(random,n=4,guard)", dict(mode="spec", dm=draft,
                                        dp=rand_dparams, n_draft=4)),
    ]:
        print(json.dumps({"mode": label, **run(**kw)}), flush=True)


if __name__ == "__main__":
    main()
