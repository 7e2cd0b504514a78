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
