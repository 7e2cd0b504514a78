"""Tensor-parallel decode: flash-decode kernel inside shard_map (heads over
the model axis, sequences over data) matches single-device decode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn, parallel
from tpu_flash.inference.sampler import make_caches


@pytest.mark.parametrize("quant", ["none", "int8"])
def test_tp_decode_matches_single_device(rng, quant):
    cfg = nn.DecoderConfig(
        n_vocab=64, n_embd=64, n_head=4, n_positions=64, n_layer=2,
        p_dropout=0.0, attention_kind="flash")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    B, L = 4, 12
    ids = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)

    def decode_all(params):
        caches = make_caches(model, B, 32, quant=quant)
        logits, caches = model(params, ids[:, :4], kv_caches=caches,
                               positions=jnp.arange(4)[None, :].repeat(B, 0))
        outs = [logits[:, -1]]
        for t in range(4, L):
            logits, caches = model(
                params, ids[:, t:t + 1], kv_caches=caches,
                positions=jnp.full((B, 1), t, jnp.int32))
            outs.append(logits[:, 0])
        return jnp.stack(outs, 1)

    ref = decode_all(params)

    ctx = parallel.make_mesh(data=2, model=2, devices=jax.devices()[:4])
    try:
        parallel.set_parallel_context(ctx)
        out = decode_all(params)
    finally:
        parallel.set_parallel_context(None)
    tol = dict(atol=1e-4, rtol=1e-4) if quant == "none" else \
        dict(atol=2e-3, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **tol)


def test_tp_decode_applies_window(rng):
    """Sliding-window models must apply the window inside the tensor-parallel
    shard_map decode path too (regression: the sharded lambdas dropped
    window=, silently attending the full prefix)."""
    cfg = nn.DecoderConfig(
        n_vocab=64, n_embd=64, n_head=4, n_positions=64, n_layer=2,
        p_dropout=0.0, attention_kind="flash", window=4)
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    B, L = 4, 12
    ids = jnp.asarray(rng.integers(0, 64, (B, L)), jnp.int32)

    def decode_all(params):
        caches = make_caches(model, B, 32)
        logits, caches = model(params, ids[:, :4], kv_caches=caches,
                               positions=jnp.arange(4)[None, :].repeat(B, 0))
        outs = [logits[:, -1]]
        for t in range(4, L):
            logits, caches = model(
                params, ids[:, t:t + 1], kv_caches=caches,
                positions=jnp.full((B, 1), t, jnp.int32))
            outs.append(logits[:, 0])
        return jnp.stack(outs, 1)

    ref = decode_all(params)
    ctx = parallel.make_mesh(data=2, model=2, devices=jax.devices()[:4])
    try:
        parallel.set_parallel_context(ctx)
        out = decode_all(params)
    finally:
        parallel.set_parallel_context(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-4, rtol=1e-4)
