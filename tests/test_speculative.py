"""Speculative decoding tests.  The core guarantee is exactness: greedy
speculative output must equal the target model's own greedy decode token
for token, for ANY draft model — the draft only changes how many target
forwards it takes (serving capability beyond the reference, whose generate
re-runs the full prefix per token)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.inference import SamplingConfig, generate, speculative_generate


def make_model(seed=0, **kw):
    base = dict(n_vocab=64, n_embd=32, n_head=4, n_positions=128, n_layer=2,
                p_dropout=0.0, attention_kind="naive")
    base.update(kw)
    cfg = nn.DecoderConfig(**base)
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(seed))
    return model, params


def prompts(rng, B=3, Lp=9, vocab=64):
    ids = jnp.asarray(rng.integers(1, vocab, (B, Lp)), jnp.int32)
    lengths = jnp.asarray([Lp] + [int(x) for x in rng.integers(2, Lp, B - 1)],
                          jnp.int32)
    return ids, lengths


@pytest.mark.parametrize("n_draft", [1, 2, 4])
def test_speculative_matches_greedy(rng, n_draft):
    model, params = make_model(0)
    draft, dparams = make_model(1, n_embd=16, n_layer=1, n_head=2)
    ids, lengths = prompts(rng)
    cfg = SamplingConfig(max_new_tokens=12, temperature=0.0)
    ref_toks, ref_n = generate(model, params, ids, lengths, cfg, max_len=64)
    toks, n = speculative_generate(
        model, params, draft, dparams, ids, lengths, cfg,
        max_len=64, n_draft=n_draft)
    np.testing.assert_array_equal(toks, ref_toks)
    np.testing.assert_array_equal(n, ref_n)


def test_speculative_self_draft_exact(rng):
    """draft == target: every draft must be accepted (this is the test
    that notices a corrupted draft cache — output equality alone holds for
    ANY draft by construction) and the output is the plain greedy
    decode in the minimum number of rounds."""
    model, params = make_model(0)
    ids, lengths = prompts(rng)
    n_draft, max_new = 4, 10
    cfg = SamplingConfig(max_new_tokens=max_new, temperature=0.0)
    ref_toks, _ = generate(model, params, ids, lengths, cfg, max_len=64)
    toks, _, stats = speculative_generate(
        model, params, model, params, ids, lengths, cfg,
        max_len=64, n_draft=n_draft, return_stats=True)
    np.testing.assert_array_equal(toks, ref_toks)
    np.testing.assert_array_equal(stats["accepted"], stats["drafted"])
    # each round emits n_draft tokens when everything is accepted; the
    # first token comes from prefill
    assert int(stats["rounds"]) == -(-(max_new - 1) // n_draft)


def test_speculative_eos_stops(rng):
    """Per-sequence eos inside an accepted run truncates exactly like the
    vanilla loop (later emissions dropped, generation frozen)."""
    model, params = make_model(0)
    draft, dparams = make_model(2, n_embd=16, n_layer=1, n_head=2)
    ids, lengths = prompts(rng)
    cfg = SamplingConfig(max_new_tokens=16, temperature=0.0)
    ref_toks, ref_n = generate(model, params, ids, lengths, cfg, max_len=64)
    # pick the token the reference emits mid-stream as "eos" so the
    # speculative run must stop at the same place
    eos = int(np.asarray(ref_toks)[0, 4])
    cfg_eos = SamplingConfig(max_new_tokens=16, temperature=0.0, eos_id=eos)
    ref_toks, ref_n = generate(model, params, ids, lengths, cfg_eos,
                               max_len=64)
    toks, n = speculative_generate(
        model, params, draft, dparams, ids, lengths, cfg_eos,
        max_len=64, n_draft=3)
    np.testing.assert_array_equal(toks, ref_toks)
    np.testing.assert_array_equal(n, ref_n)


def test_speculative_flash_and_rope(rng):
    """Flash-attention target with RoPE: the verification forward (multi-
    token cached attention with explicit positions) must agree with the
    single-token decode-kernel path."""
    model, params = make_model(0, attention_kind="flash", positional="rope")
    draft, dparams = make_model(3, n_embd=16, n_layer=1, n_head=2,
                                positional="rope")
    ids, lengths = prompts(rng)
    cfg = SamplingConfig(max_new_tokens=12, temperature=0.0)
    ref_toks, _ = generate(model, params, ids, lengths, cfg, max_len=64)
    toks, _ = speculative_generate(
        model, params, draft, dparams, ids, lengths, cfg,
        max_len=64, n_draft=4)
    np.testing.assert_array_equal(toks, ref_toks)


def test_stochastic_matches_target_distribution(rng):
    """Rejection sampling must make each emitted token distributed exactly
    as target-only sampling regardless of the draft: compare the empirical
    joint of the first two generated tokens against the analytically
    computed target joint (tiny vocab makes it enumerable)."""
    V = 8
    model, params = make_model(0, n_vocab=V, n_embd=16, n_layer=1,
                               n_head=2, n_positions=32)
    draft, dparams = make_model(7, n_vocab=V, n_embd=16, n_layer=1,
                                n_head=2, n_positions=32)
    temp = 0.8
    prompt = jnp.asarray([[3, 1, 5, 2]], jnp.int32)
    Lp = prompt.shape[1]

    # exact target joint P(t1, t2 | prompt)
    def next_dist(ids):
        logits = model(params, ids)[:, -1]
        return jax.nn.softmax(logits / temp, axis=-1)[0]

    p1 = next_dist(prompt)                                   # [V]
    p2 = jnp.stack([
        next_dist(jnp.concatenate(
            [prompt, jnp.asarray([[v]], jnp.int32)], axis=1))
        for v in range(V)
    ])                                                       # [V, V]
    joint = np.asarray(p1[:, None] * p2, np.float64)

    # B bounded by interpret-mode kernel speed (the decode kernel's grid is
    # per-sequence); accumulate two independently-keyed runs instead.
    B, runs = 2048, 2
    ids = jnp.broadcast_to(prompt, (B, Lp))
    lengths = jnp.full((B,), Lp, jnp.int32)
    cfg = SamplingConfig(max_new_tokens=2, temperature=temp)
    emp = np.zeros((V, V), np.float64)
    for r in range(runs):
        toks, _ = speculative_generate(
            model, params, draft, dparams, ids, lengths, cfg,
            max_len=16, n_draft=3, key=jax.random.key(42 + r))
        toks = np.asarray(toks)
        np.add.at(emp, (toks[:, 0], toks[:, 1]), 1.0)
    emp /= B * runs
    tv = 0.5 * np.abs(emp - joint).sum()
    # sampling noise at n=4096 over 64 cells gives TV ~0.06; a draft this
    # different from the target would show TV ~0.3 if acceptance were biased
    assert tv < 0.13, f"TV distance {tv:.3f}"


def test_stochastic_topk_topp_smoke(rng):
    """Filtered sampling configs (top-k + top-p) compose with the
    rejection-sampling path: runs to completion, emits valid ids."""
    V = 32
    model, params = make_model(0, n_vocab=V)
    draft, dparams = make_model(9, n_vocab=V, n_embd=16, n_layer=1,
                                n_head=2)
    ids, lengths = prompts(rng, vocab=V)
    cfg = SamplingConfig(max_new_tokens=8, temperature=0.9, top_k=4,
                         top_p=0.95)
    toks, n = speculative_generate(
        model, params, draft, dparams, ids, lengths, cfg,
        max_len=64, n_draft=3, key=jax.random.key(1))
    assert toks.shape == (3, 8)
    assert np.all(np.asarray(toks) >= 0) and np.all(np.asarray(toks) < V)
    assert np.all(np.asarray(n) >= 1)
