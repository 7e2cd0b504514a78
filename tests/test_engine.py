"""Continuous-batching engine tests: correctness vs the plain batched
generate path, slot reuse, and mid-flight admission."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.inference import SamplingConfig, generate
from tpu_flash.inference.engine import DecodeEngine, Request


def make_model():
    cfg = nn.DecoderConfig(n_vocab=64, n_embd=32, n_head=4, n_positions=128,
                           n_layer=2, p_dropout=0.0, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    return model, model.init(jax.random.key(0))


def greedy_reference(model, params, prompt, n):
    ids = list(prompt)
    for _ in range(n):
        logits = model(params, jnp.asarray([ids], jnp.int32))
        ids.append(int(jnp.argmax(logits[0, -1])))
    return ids[len(prompt):]


@pytest.mark.parametrize("kv_quant", ["none"])
def test_engine_matches_reference_greedy(kv_quant):
    model, params = make_model()
    engine = DecodeEngine(
        model, params, n_slots=2, max_len=64,
        sampling=SamplingConfig(max_new_tokens=5), kv_quant=kv_quant)
    prompts = {1: [5, 6, 7], 2: [9, 8, 7, 6], 3: [11, 12]}
    for uid, p in prompts.items():
        engine.submit(Request(uid, p))
    done = engine.run()
    assert sorted(c.uid for c in done) == [1, 2, 3]
    for c in done:
        exp = greedy_reference(model, params, prompts[c.uid], 5)
        assert c.tokens == exp, (c.uid, c.tokens, exp)


def test_engine_slot_reuse_more_requests_than_slots():
    model, params = make_model()
    engine = DecodeEngine(
        model, params, n_slots=2, max_len=64,
        sampling=SamplingConfig(max_new_tokens=3))
    for uid in range(6):
        engine.submit(Request(uid, [3 + uid, 4, 5]))
    done = engine.run()
    assert sorted(c.uid for c in done) == list(range(6))
    for c in done:
        assert len(c.tokens) <= 3
        assert c.finished_reason in ("eos", "length")


def test_engine_eos_stops_early():
    model, params = make_model()
    # make eos the first greedy token of this prompt -> empty completion
    logits = model(params, jnp.asarray([[3, 4]], jnp.int32))
    eos = int(jnp.argmax(logits[0, -1]))
    engine = DecodeEngine(
        model, params, n_slots=1, max_len=32,
        sampling=SamplingConfig(max_new_tokens=5, eos_id=eos))
    engine.submit(Request(0, [3, 4]))
    done = engine.run()
    assert done[0].finished_reason == "eos"
    assert done[0].tokens == []


def test_run_many_matches_single_step():
    """Greedy decode via n-token device steps == per-token stepping."""
    model, params = make_model()

    def engine():
        return DecodeEngine(
            model, params, n_slots=2, max_len=64,
            sampling=SamplingConfig(max_new_tokens=6))

    eng_a, eng_b = engine(), engine()
    prompts = [[5, 6, 7], [9, 8], [3, 3, 3, 3]]
    for i, p in enumerate(prompts):
        eng_a.submit(Request(i, list(p)))
        eng_b.submit(Request(i, list(p)))
    a = {c.uid: (c.tokens, c.finished_reason) for c in eng_a.run()}
    b = {c.uid: (c.tokens, c.finished_reason) for c in eng_b.run_many(4)}
    assert a == b


def test_run_many_eos_mid_scan_matches():
    """EOS landing mid-scan retires the slot identically to per-token
    stepping (device masks post-eos tokens; host discards them)."""
    model, params = make_model()
    ref = greedy_reference(model, params, [5, 6, 7], 6)
    eos = ref[2]   # forces retirement on the 3rd generated token

    def engine():
        return DecodeEngine(
            model, params, n_slots=2, max_len=64,
            sampling=SamplingConfig(max_new_tokens=6, eos_id=eos))

    eng_a, eng_b = engine(), engine()
    for e in (eng_a, eng_b):
        e.submit(Request(0, [5, 6, 7]))
        e.submit(Request(1, [9, 8]))
    a = {c.uid: (c.tokens, c.finished_reason) for c in eng_a.run()}
    b = {c.uid: (c.tokens, c.finished_reason) for c in eng_b.run_many(4)}
    assert a == b
    assert a[0][1] == "eos" and a[0][0] == ref[:2]


def test_run_many_matches_near_max_len():
    """Length-based retirement must use the per-token kv length, not the
    end-of-scan length (regression: step_many retired slots early)."""
    model, params = make_model()

    def engine():
        return DecodeEngine(
            model, params, n_slots=1, max_len=16,
            sampling=SamplingConfig(max_new_tokens=100))

    eng_a, eng_b = engine(), engine()
    for e in (eng_a, eng_b):
        e.submit(Request(0, [5, 6, 7, 8, 9, 10]))
    a = {c.uid: (c.tokens, c.finished_reason) for c in eng_a.run()}
    b = {c.uid: (c.tokens, c.finished_reason) for c in eng_b.run_many(8)}
    assert a == b


def test_run_many_staggered_budgets_matches_reference():
    """Slots admitted at different times have different remaining budgets;
    step_many must not clamp the scan length to the smallest one (that would
    degrade to per-token round-trips) and must still emit exactly the right
    tokens for every request (mid-scan budget retirement discards the rest)."""
    model, params = make_model()
    engine = DecodeEngine(
        model, params, n_slots=2, max_len=64,
        sampling=SamplingConfig(max_new_tokens=7))
    prompts = {1: [5, 6, 7], 2: [9, 8], 3: [11, 12, 13], 4: [3, 4]}
    for uid, p in prompts.items():
        engine.submit(Request(uid, p))
    done = engine.run_many(5)
    assert sorted(c.uid for c in done) == [1, 2, 3, 4]
    for c in done:
        exp = greedy_reference(model, params, prompts[c.uid], 7)
        assert c.tokens == exp[:len(c.tokens)] and len(c.tokens) == 7, (
            c.uid, c.tokens, exp)


def make_draft(seed=5):
    cfg = nn.DecoderConfig(n_vocab=64, n_embd=16, n_head=2, n_positions=128,
                           n_layer=1, p_dropout=0.0, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    return model, model.init(jax.random.key(seed))


def test_engine_speculative_matches_reference_greedy():
    """run_speculative must produce the target model's own greedy decode
    (speculative output is draft-agnostic) across slot reuse."""
    model, params = make_model()
    draft, dparams = make_draft()
    engine = DecodeEngine(
        model, params, n_slots=2, max_len=64,
        sampling=SamplingConfig(max_new_tokens=6),
        draft_model=draft, draft_params=dparams, n_draft=3)
    prompts = {1: [5, 6, 7], 2: [9, 8, 7, 6], 3: [11, 12], 4: [2, 3, 4, 5]}
    for uid, p in prompts.items():
        engine.submit(Request(uid, p))
    done = engine.run_speculative()
    assert sorted(c.uid for c in done) == [1, 2, 3, 4]
    for c in done:
        exp = greedy_reference(model, params, prompts[c.uid], 6)
        assert c.tokens == exp, (c.uid, c.tokens, exp)


def test_engine_speculative_near_capacity_matches_plain_engine():
    """Rounds shrink near max_len instead of retiring early: speculative
    completions (tokens AND finished_reason) must equal the plain engine's
    even when n_draft overshoots the remaining cache room."""
    model, params = make_model()
    samp = SamplingConfig(max_new_tokens=30)
    prompts = {1: [5, 6, 7, 9, 8, 7, 6, 11, 12], 2: [3, 4]}
    plain = DecodeEngine(model, params, n_slots=2, max_len=16,
                         sampling=samp)
    spec = DecodeEngine(model, params, n_slots=2, max_len=16,
                        sampling=samp, draft_model=model,
                        draft_params=params, n_draft=6)
    for uid, p in prompts.items():
        plain.submit(Request(uid, p))
        spec.submit(Request(uid, p))
    ref = {c.uid: (c.tokens, c.finished_reason) for c in plain.run_many(4)}
    got = {c.uid: (c.tokens, c.finished_reason)
           for c in spec.run_speculative()}
    assert got == ref, (got, ref)


def test_engine_speculative_acceptance_guard():
    """The acceptance-aware guard (VERDICT r4 #4): probation measures both
    modes, records a decision with the measured rates + acceptance, and —
    because greedy speculative decoding is output-invariant — the
    completions are identical to the plain engine REGARDLESS of which mode
    wins the timing race."""
    model, params = make_model()
    draft, dparams = make_draft()
    samp = SamplingConfig(max_new_tokens=20)
    prompts = {u: [2 + u, 3, 4 + u] for u in range(1, 7)}

    plain = DecodeEngine(model, params, n_slots=2, max_len=64,
                         sampling=samp)
    spec = DecodeEngine(model, params, n_slots=2, max_len=64,
                        sampling=samp, draft_model=draft,
                        draft_params=dparams, n_draft=3)
    for uid, p in prompts.items():
        plain.submit(Request(uid, p))
        spec.submit(Request(uid, p))
    ref = {c.uid: (c.tokens, c.finished_reason) for c in plain.run()}
    got = {c.uid: (c.tokens, c.finished_reason)
           for c in spec.run_speculative(probe_rounds=2)}
    assert got == ref, (got, ref)
    # probation completed and recorded an honest decision
    d = spec.spec_decision
    assert d is not None
    assert d["mode"] in ("speculative", "plain")
    assert d["spec_tps"] > 0 and d["plain_tps"] > 0
    assert 0.0 <= d["acceptance"] <= 1.0
    st = spec._spec_stats
    assert st["spec_timed"] >= 2 and st["plain_timed"] >= 2
    assert 0 <= st["accepted"] <= st["proposed"]

    # self-draft control: every proposal accepted -> acceptance == 1.0
    selfd = DecodeEngine(model, params, n_slots=2, max_len=64,
                         sampling=samp, draft_model=model,
                         draft_params=params, n_draft=3)
    for uid, p in prompts.items():
        selfd.submit(Request(uid, p))
    got3 = {c.uid: (c.tokens, c.finished_reason)
            for c in selfd.run_speculative(probe_rounds=None)}
    assert got3 == ref
    st3 = selfd._spec_stats
    # self-draft acceptance is near-perfect (eos/budget retirement clamps
    # the tail of some rounds) and far above the mismatched draft's
    self_acc = st3["accepted"] / st3["proposed"]
    rand_acc = st["accepted"] / max(st["proposed"], 1)
    assert self_acc >= 0.6, st3
    assert self_acc > rand_acc, (self_acc, rand_acc)

    # guard disabled: pure speculative, still identical output
    spec2 = DecodeEngine(model, params, n_slots=2, max_len=64,
                         sampling=samp, draft_model=draft,
                         draft_params=dparams, n_draft=3)
    for uid, p in prompts.items():
        spec2.submit(Request(uid, p))
    got2 = {c.uid: (c.tokens, c.finished_reason)
            for c in spec2.run_speculative(probe_rounds=None)}
    assert got2 == ref
    assert spec2.spec_decision is None


def test_engine_speculative_rejects_bad_n_draft():
    model, params = make_model()
    import pytest
    with pytest.raises(ValueError):
        DecodeEngine(model, params, n_slots=1, max_len=32,
                     sampling=SamplingConfig(max_new_tokens=4),
                     draft_model=model, draft_params=params, n_draft=0)


def test_engine_speculative_self_draft_round_trip_efficiency():
    """With draft == target every round emits n_draft tokens, so the number
    of speculative steps (host round-trips) is the minimum — and the draft
    cache machinery inside the engine must be intact for this to hold."""
    model, params = make_model()
    engine = DecodeEngine(
        model, params, n_slots=2, max_len=64,
        sampling=SamplingConfig(max_new_tokens=9),
        draft_model=model, draft_params=params, n_draft=4)
    engine.submit(Request(1, [5, 6, 7]))
    engine.admit()
    steps = 0
    while engine.has_work():
        engine.step_speculative()
        steps += 1
    done = engine.completions
    assert len(done) == 1 and len(done[0].tokens) == 9
    # 1 token from prefill + ceil(8 / 4) rounds
    assert steps == 2, steps
    exp = greedy_reference(model, params, [5, 6, 7], 9)
    assert done[0].tokens == exp


def test_chunked_prefill_matches_reference_greedy():
    """prefill_chunk admissions (with interleaved decode steps for active
    slots) must emit exactly the tokens of the bucketed-prefill engine and
    the step-by-step greedy oracle."""
    model, params = make_model()
    engine = DecodeEngine(
        model, params, n_slots=2, max_len=64,
        sampling=SamplingConfig(max_new_tokens=5), prefill_chunk=4)
    # prompts longer than one chunk; 3 requests on 2 slots so the third
    # admission happens while slots are active (interleave path)
    prompts = {1: [5, 6, 7, 9, 2, 4, 8, 1, 3], 2: [9, 8, 7, 6, 5, 4],
               3: [11, 12, 13, 1, 2, 3, 4, 5, 6, 7]}
    for uid, p in prompts.items():
        engine.submit(Request(uid, p))
    done = engine.run()
    assert sorted(c.uid for c in done) == [1, 2, 3]
    for c in done:
        exp = greedy_reference(model, params, prompts[c.uid], 5)
        assert c.tokens == exp, (c.uid, c.tokens, exp)


def test_chunked_prefill_speculative_engine():
    """Chunked prefill must fill BOTH the target and draft caches; the
    speculative loop then produces the exact greedy tokens."""
    model, params = make_model()
    engine = DecodeEngine(
        model, params, n_slots=2, max_len=64,
        sampling=SamplingConfig(max_new_tokens=5), prefill_chunk=4,
        draft_model=model, draft_params=params, n_draft=3)
    prompts = {1: [5, 6, 7, 9, 2], 2: [9, 8, 7, 6, 5, 4, 3]}
    for uid, p in prompts.items():
        engine.submit(Request(uid, p))
    done = engine.run_speculative()
    assert sorted(c.uid for c in done) == [1, 2]
    for c in done:
        exp = greedy_reference(model, params, prompts[c.uid], 5)
        assert c.tokens == exp, (c.uid, c.tokens, exp)


def test_prefix_caching_matches_uncached():
    """set_prefix (shared system prompt) must produce exactly the uncached
    engine's greedy tokens — including a prompt that IS the bare prefix."""
    model, params = make_model()
    prefix = [7, 3, 9, 4, 2, 8, 6]
    prompts = {1: prefix + [5, 6, 7], 2: prefix + [1], 3: prefix,
               4: [9, 9, 9]}  # 4: prefix miss -> normal path

    def run(with_prefix):
        engine = DecodeEngine(
            model, params, n_slots=2, max_len=64,
            sampling=SamplingConfig(max_new_tokens=5), prefill_chunk=4)
        if with_prefix:
            engine.set_prefix(prefix)
        for uid, p in prompts.items():
            engine.submit(Request(uid, p))
        return {c.uid: c.tokens for c in engine.run()}

    cached, uncached = run(True), run(False)
    assert cached == uncached
    for uid, p in prompts.items():
        exp = greedy_reference(model, params, p, 5)
        assert cached[uid] == exp, (uid, cached[uid], exp)


def test_chunked_prefill_near_max_len_no_clamp_corruption():
    """Regression (review 2026-08-18): a pad-filled final chunk whose write
    window crosses max_len used to clamp inside dynamic_update_slice and
    shift real KV rows.  Prompt of max_len-1 tokens with a non-dividing
    chunk size must still reproduce the bucketed engine exactly."""
    model, params = make_model()
    prompt = [1 + (i % 50) for i in range(31)]       # max_len-1 = 31

    # one generated token: its logits depend on every prompt position's KV
    def run1(chunk):
        engine = DecodeEngine(
            model, params, n_slots=1, max_len=34,
            sampling=SamplingConfig(max_new_tokens=1), prefill_chunk=chunk)
        engine.submit(Request(1, prompt))
        return engine.run()[0].tokens

    exp = greedy_reference(model, params, prompt, 1)
    for chunk in (5, 7, 31):                          # 31 % 5 = 1 pad-heavy
        assert run1(chunk) == exp, (chunk, run1(chunk), exp)
