"""Serving-throughput benchmark: a Poisson request trace through the
continuous-batching DecodeEngine.

The engine's unit tests (tests/test_engine.py) prove the mechanics; this
bench produces the serving NUMBER: sustained tokens/sec and p50/p99
inter-token latency under a realistic open-loop trace — Poisson arrivals,
mixed prompt lengths (lognormal), mixed output budgets — at the
bench_decode_model.py production config, for each stepping mode:

  * ``step``       — one decode token per host round-trip (lower bound);
  * ``step_many``  — n tokens per round-trip (continuous batching +
                     periodic refills, the production mode);
  * with/without chunked prefill.

Caveat (also in bench/RESULTS.md): this host sits behind a ~40 ms tunneled
link to the chip, so WALL-CLOCK numbers here understate a real deployment
where the host is attached by PCIe; the device-only per-step cost is what
bench/bench_decode_model.py measures.  The relative ordering of modes and
the latency distribution shapes are what transfer.

Run:  python bench/bench_serving.py [--n-requests 48] [--rate 8.0]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def make_trace(n_requests, rate, rng, max_prompt=1024, max_new=256):
    """Poisson arrivals (exp inter-arrival at ``rate`` req/s), lognormal
    prompt lengths, uniform output budgets."""
    t = np.cumsum(rng.exponential(1.0 / rate, n_requests))
    prompts = np.clip(rng.lognormal(4.5, 0.8, n_requests), 16,
                      max_prompt).astype(int)
    budgets = rng.integers(32, max_new + 1, n_requests)
    return [
        {"arrival": float(t[i]), "prompt_len": int(prompts[i]),
         "budget": int(budgets[i])}
        for i in range(n_requests)
    ]


def run_trace(engine_factory, trace, vocab, mode, n_many, rng):
    """Open-loop replay: requests become visible at their arrival times;
    the engine drains work as fast as it can.  Returns per-request token
    timestamp lists + makespan."""
    from tpu_flash.inference.engine import Request

    engine = engine_factory()
    pending = [
        (ex["arrival"],
         Request(uid=i, prompt=rng.integers(
             0, vocab, ex["prompt_len"]).tolist()))
        for i, ex in enumerate(trace)
    ]
    budgets = {i: ex["budget"] for i, ex in enumerate(trace)}
    token_times = {i: [] for i in budgets}
    # per-phase wall times (VERDICT r4 #7): the burst-ITL tail is the gap
    # between two emissions of one request — attribute it to admissions
    # (prefill work, chunked or not) vs decode steps directly
    phase_times = {"admit": [], "step": []}

    orig_emit = engine._host_emit

    def emit_hook(slot, tok, slot_len, update_last=True):
        uid = engine.slot_uid[slot]
        if uid is not None:
            token_times[uid].append(time.monotonic() - t0)
        return orig_emit(slot, tok, slot_len, update_last=update_last)

    engine._host_emit = emit_hook

    t0 = time.monotonic()
    i = 0
    while i < len(pending) or engine.has_work():
        now = time.monotonic() - t0
        while i < len(pending) and pending[i][0] <= now:
            engine.submit(pending[i][1])
            i += 1
        if not engine.has_work():
            time.sleep(max(0.0, pending[i][0] - (time.monotonic() - t0)))
            continue
        ta = time.monotonic()
        engine.admit()
        phase_times["admit"].append(time.monotonic() - ta)
        # enforce each request's own output budget: the remaining budget is
        # authoritative from host bookkeeping (engine budgets come from the
        # global sampling.max_new_tokens)
        for slot in range(engine.n_slots):
            uid = engine.slot_uid[slot]
            if uid is not None:
                engine.slot_budget[slot] = (
                    budgets[uid] - len(engine.slot_tokens[slot]))
        ts = time.monotonic()
        if mode == "many":
            engine.step_many(n_many)
        elif mode == "spec":
            engine.step_speculative()
        else:
            engine.step()
        phase_times["step"].append(time.monotonic() - ts)
    makespan = time.monotonic() - t0
    return token_times, makespan, phase_times


def summarize(token_times, makespan, trace, phase_times=None):
    total = sum(len(v) for v in token_times.values())
    gaps, means = [], []
    for uid, times in token_times.items():
        if len(times) > 1:
            gaps.extend(np.diff(times))
            # per-request mean ITL — the right summary under multi-token
            # steps, where tokens of one device scan surface in a burst
            # (raw within-burst gaps are ~0)
            means.append((times[-1] - times[0]) / (len(times) - 1))
    gaps = np.asarray(gaps) if gaps else np.asarray([0.0])
    means = np.asarray(means) if means else np.asarray([0.0])
    # time-to-first-token relative to arrival
    ttft = [times[0] - trace[uid]["arrival"]
            for uid, times in token_times.items() if times]
    out = {
        "tokens": int(total),
        "makespan_s": round(makespan, 2),
        "tokens_per_sec": round(total / makespan, 1),
        "itl_mean_p50_ms": round(float(np.percentile(means, 50)) * 1e3, 1),
        "itl_mean_p99_ms": round(float(np.percentile(means, 99)) * 1e3, 1),
        "itl_burst_p99_ms": round(float(np.percentile(gaps, 99)) * 1e3, 1),
        "ttft_p50_s": round(float(np.percentile(ttft, 50)), 2),
        "ttft_p99_s": round(float(np.percentile(ttft, 99)), 2),
    }
    if phase_times:
        # the attribution fields: a burst-ITL p99 that matches
        # admit_max_ms (+ one step) is admission-induced; one matching
        # step_p99_ms is scan-induced
        for name, ts in phase_times.items():
            if not ts:
                continue
            a = np.asarray(ts) * 1e3
            out[f"{name}_p50_ms"] = round(float(np.percentile(a, 50)), 1)
            out[f"{name}_p99_ms"] = round(float(np.percentile(a, 99)), 1)
            out[f"{name}_max_ms"] = round(float(a.max()), 1)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-requests", type=int, default=48)
    ap.add_argument("--rate", type=float, default=8.0,
                    help="Poisson arrival rate, requests/sec")
    ap.add_argument("--n-slots", type=int, default=8)
    ap.add_argument("--kv-quant", default="int8")
    ap.add_argument("--n-many", type=int, default=8)
    ap.add_argument("--small", action="store_true",
                    help="small model for CPU smoke runs")
    args = ap.parse_args()

    from tpu_flash import nn
    from tpu_flash.inference.engine import DecodeEngine
    from tpu_flash.inference.sampler import SamplingConfig

    if args.small:
        cfg = nn.DecoderConfig(
            n_vocab=512, n_embd=128, n_head=8, n_positions=2048, n_layer=2,
            p_dropout=0.0, attention_kind="flash", dtype=jnp.bfloat16)
        max_len, max_prompt, max_new = 2048, 256, 64
    else:
        cfg = nn.DecoderConfig(
            n_vocab=32768, n_embd=1024, n_head=16, n_positions=8192,
            n_layer=8, ff_middle_dim=4096, p_dropout=0.0,
            attention_kind="flash", dtype=jnp.bfloat16)
        max_len, max_prompt, max_new = 8192, 1024, 256
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    trace = make_trace(args.n_requests, args.rate, rng,
                       max_prompt=max_prompt, max_new=max_new)
    print(json.dumps({
        "model": f"E={cfg.n_embd} L{cfg.n_layer}",
        "trace": {"n": args.n_requests, "rate": args.rate,
                  "prompt_p50": int(np.median(
                      [t["prompt_len"] for t in trace])),
                  "new_p50": int(np.median([t["budget"] for t in trace]))},
    }))

    # greedy draft for the speculative row: same family, 2 layers
    draft_cfg = nn.DecoderConfig(
        n_vocab=cfg.n_vocab, n_embd=cfg.n_embd // 2, n_head=cfg.n_head // 2,
        n_positions=cfg.n_positions, n_layer=2, p_dropout=0.0,
        attention_kind="flash", dtype=jnp.bfloat16)
    draft_model = nn.DecoderLM(draft_cfg)
    draft_params = draft_model.init(jax.random.key(1))

    def factory(chunk=None, spec=False):
        return lambda: DecodeEngine(
            model, params, n_slots=args.n_slots, max_len=max_len,
            sampling=SamplingConfig(temperature=0.0),
            kv_quant=args.kv_quant, prefill_chunk=chunk,
            draft_model=draft_model if spec else None,
            draft_params=draft_params if spec else None, n_draft=4)

    for label, fac, mode in [
        ("per-token", factory(), "step"),
        (f"step_many({args.n_many})", factory(), "many"),
        (f"step_many({args.n_many})+chunked-prefill", factory(256), "many"),
        ("speculative(draft-2L,n=4)", factory(spec=True), "spec"),
    ]:
        tt, makespan, phases = run_trace(fac, trace, cfg.n_vocab, mode,
                                         args.n_many,
                                         np.random.default_rng(1))
        print(json.dumps({"mode": label,
                          **summarize(tt, makespan, trace, phases)}),
              flush=True)


if __name__ == "__main__":
    main()
