"""Heads-minor decode-kernel layout tests: the [B, S, H*d] cache (the
serving-side layout redesign over the reference's nonexistent decode path,
SURVEY.md §3.5) across head configurations the block-diagonal-query
formulation has to get right — MQA/GQA group folding, sublane padding of
odd head counts, per-KV-head quantization-scale expansion (resident and
per-tile fetch modes), sliding window, and the legacy 4-D entry point."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash.inference import KVCache
from tpu_flash.kernels import decode
from tpu_flash.kernels.decode import flash_decode_attention


def oracle(q, k, v, lengths, window=None):
    """q [B,Hq,Lq,d] (the last Lq cached tokens) vs dequantized k/v
    [B,Hkv,S,d]: query i attends positions < lengths - Lq + i + 1."""
    B, Hkv, S, d = k.shape
    Lq = q.shape[2]
    g = q.shape[1] // Hkv
    kk = jnp.repeat(k, g, axis=1).astype(jnp.float32)
    vv = jnp.repeat(v, g, axis=1).astype(jnp.float32)
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32), kk) / np.sqrt(d)
    pos = jnp.arange(S)[None, None, None, :]
    limit = (lengths[:, None, None, None] - Lq + 1
             + jnp.arange(Lq)[None, None, :, None])
    m = pos < limit
    if window is not None:
        m &= pos >= (limit - window)
    p = jax.nn.softmax(jnp.where(m, s, -1e30), -1)
    return jnp.einsum("bhqk,bhkd->bhqd", p, vv)


def run_case(rng, B, Hq, Hkv, S, d, dtype, quant, window=None, block_s=None,
             Lq=1):
    q = jnp.asarray(rng.standard_normal((B, Hq, Lq, d)) * 0.5, dtype)
    k4 = jnp.asarray(rng.standard_normal((B, Hkv, S, d)) * 0.5, dtype)
    v4 = jnp.asarray(rng.standard_normal((B, Hkv, S, d)) * 0.5, dtype)
    lengths = jnp.asarray(
        [S] + [int(x) for x in rng.integers(Lq, S, B - 1)], jnp.int32)
    cache = KVCache.create(B, Hkv, S, d, quant=quant, compute_dtype=dtype)
    cache = cache.append(k4, v4)
    kw = {} if block_s is None else {"block_s": block_s}
    out = flash_decode_attention(q, cache.k, cache.v, lengths,
                                 cache.k_scale, cache.v_scale,
                                 window=window, **kw)
    ref = oracle(q, cache.read_k(), cache.read_v(), lengths, window)
    tol = 1e-5 if dtype == jnp.float32 else 3e-2
    np.testing.assert_allclose(
        out.astype(jnp.float32), ref, atol=tol, rtol=tol)


@pytest.mark.parametrize(
    "B,Hq,Hkv,S,d,dtype,quant,window",
    [
        (3, 8, 8, 513, 64, jnp.float32, "none", None),   # pad path, MHA
        (2, 8, 2, 768, 64, jnp.bfloat16, "none", None),  # GQA g=4
        (2, 8, 1, 640, 64, jnp.bfloat16, "int8", None),  # MQA g=8, Hpad=1
        (2, 6, 3, 512, 64, jnp.bfloat16, "int8", None),  # odd heads, g=2
        (2, 8, 8, 900, 64, jnp.bfloat16, "fp8", 300),    # fp8 + window
        (2, 8, 4, 1024, 64, jnp.bfloat16, "int8", 300),  # GQA+quant+window
        (1, 5, 5, 384, 64, jnp.float32, "int8", None),   # 5 heads -> Hpad 8
        (2, 4, 4, 512, 128, jnp.float32, "none", None),  # d=128
    ],
)
def test_heads_minor_matches_oracle(rng, B, Hq, Hkv, S, d, dtype, quant,
                                    window):
    run_case(rng, B, Hq, Hkv, S, d, dtype, quant, window)


@pytest.mark.parametrize(
    "Lq,B,Hq,Hkv,S,d,dtype,quant,window",
    [
        (4, 2, 8, 8, 513, 64, jnp.float32, "none", None),   # MHA verify
        (3, 2, 8, 2, 640, 64, jnp.bfloat16, "int8", None),  # GQA + quant
        (2, 2, 5, 5, 384, 64, jnp.float32, "none", None),   # odd heads
        (4, 2, 8, 4, 768, 64, jnp.bfloat16, "fp8", 200),    # window
        (8, 1, 4, 1, 512, 32, jnp.float32, "none", None),   # MQA, Lq=8
    ],
)
def test_multi_token_queries_match_oracle(rng, Lq, B, Hq, Hkv, S, d, dtype,
                                          quant, window):
    """Speculative-verification path: the last Lq cached tokens attend in
    one cache pass, each query row with its own causal limit."""
    run_case(rng, B, Hq, Hkv, S, d, dtype, quant, window, Lq=Lq)


def test_multi_token_window_multi_tile(rng):
    """Lq>1 + sliding window across MULTIPLE key tiles: exercises the
    Lq-adjusted first-in-window tile clamp and the straddling-tile
    masked-row handling (small block_s forces num_s > 1)."""
    run_case(rng, 2, 8, 4, 1536, 64, jnp.float32, "none", window=300,
             block_s=256, Lq=3)


def test_short_lengths_rows_zero(rng):
    """lengths[b] < Lq: query rows whose causal limit is <= 0 have an
    empty attention set and must return exactly 0 (not a mean over stale
    tile contents)."""
    B, H, S, d, Lq = 2, 4, 512, 64, 4
    q = jnp.asarray(rng.standard_normal((B, H, Lq, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    lengths = jnp.asarray([S, 2], jnp.int32)
    out = flash_decode_attention(q, k, v, lengths)
    # row i of sequence 1 attends positions < 2 - 4 + i + 1 = i - 1
    np.testing.assert_array_equal(out[1, :, :2], jnp.zeros((H, 2, d)))
    ref = oracle(q, k, v, lengths)
    np.testing.assert_allclose(out[1, :, 2:], ref[1, :, 2:],
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(out[0], ref[0], atol=1e-5, rtol=1e-5)


def test_non_resident_scale_tiles(rng, monkeypatch):
    """Past SCALE_RESIDENT_BUDGET the quantization scales ride the per-tile
    clamped kv index instead of staying VMEM-resident — results must be
    identical."""
    monkeypatch.setattr(decode, "SCALE_RESIDENT_BUDGET", 1024)
    run_case(rng, 2, 8, 4, 1024, 64, jnp.bfloat16, "int8", block_s=256)


def test_legacy_4d_cache_layout(rng):
    """The kernel accepts [B, H, S, d] caches (transposed on entry)."""
    B, H, S, d = 2, 4, 384, 32
    q = jnp.asarray(rng.standard_normal((B, H, 1, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, d)), jnp.float32)
    lengths = jnp.asarray([S, 100], jnp.int32)
    out = flash_decode_attention(q, k, v, lengths)
    np.testing.assert_allclose(out, oracle(q, k, v, lengths),
                               atol=1e-5, rtol=1e-5)


def test_cache_append_roundtrip_heads_minor(rng):
    """append() interleaves into [B, max_len, H*d]; read_k/read_v must
    de-interleave back to exactly what went in (fp cache)."""
    B, H, L, d = 2, 3, 10, 8
    k = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
    cache = KVCache.create(B, H, 16, d)
    cache = cache.append(k, v)
    np.testing.assert_array_equal(cache.read_k()[:, :, :L], k)
    np.testing.assert_array_equal(cache.read_v()[:, :, :L], v)
    assert cache.head_dim == d and cache.max_len == 16


def test_n_head_is_required():
    """The fused layout is uninterpretable without n_head — constructing a
    cache without it must fail loudly, not default to 1."""
    z = jnp.zeros((2, 16, 32))
    ln = jnp.zeros((2,), jnp.int32)
    with pytest.raises(TypeError):
        KVCache(z, z, None, None, ln)
    c = KVCache(z, z, None, None, ln, n_head=4)
    assert dataclasses.replace(c, lengths=ln + 1).n_head == 4
    leaves, treedef = jax.tree_util.tree_flatten(c)
    assert jax.tree_util.tree_unflatten(treedef, leaves).n_head == 4
