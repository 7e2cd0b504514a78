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
    """draft == target: every draft is accepted and the output is still the
    plain greedy decode."""
    model, params = make_model(0)
    ids, lengths = prompts(rng)
    cfg = SamplingConfig(max_new_tokens=10, temperature=0.0)
    ref_toks, _ = generate(model, params, ids, lengths, cfg, max_len=64)
    toks, _ = speculative_generate(
        model, params, model, params, ids, lengths, cfg,
        max_len=64, n_draft=4)
    np.testing.assert_array_equal(toks, ref_toks)


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


def test_speculative_rejects_stochastic():
    model, params = make_model(0)
    with pytest.raises(NotImplementedError):
        speculative_generate(
            model, params, model, params,
            jnp.zeros((1, 4), jnp.int32), jnp.asarray([4], jnp.int32),
            SamplingConfig(max_new_tokens=4, temperature=1.0), max_len=32)
