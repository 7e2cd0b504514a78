"""Mixture-of-Experts FFN: routing math vs a token-loop oracle, model
integration, and expert-parallel execution on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.nn.moe import MoEConfig, MoEFeedForward


def _oracle(params, x, top_k, capacity):
    """Per-token numpy reimplementation of capacity-bounded top-k routing."""
    B, L, E = x.shape
    X = params["router"].shape[1]
    tokens = np.asarray(x, np.float32).reshape(-1, E)
    router = np.asarray(params["router"], np.float32)
    logits = tokens @ router
    probs = np.exp(logits - logits.max(-1, keepdims=True))
    probs = probs / probs.sum(-1, keepdims=True)

    out = np.zeros_like(tokens)
    fill = np.zeros(X, np.int64)
    rem = probs.copy()
    for _ in range(top_k):
        # same round semantics as the vectorized version: positions within a
        # round are assigned in token order on top of the carried fill level
        round_fill = fill.copy()
        chosen = rem.argmax(-1)
        gate = rem.max(-1)
        for t in range(tokens.shape[0]):
            e = chosen[t]
            if round_fill[e] < capacity:
                pre = (tokens[t] @ np.asarray(params["w_in"][e], np.float32)
                       + np.asarray(params["b_in"][e], np.float32))
                # tanh-GELU, same approximation as jax.nn.gelu(approximate)
                act = 0.5 * pre * (1 + np.tanh(
                    np.sqrt(2 / np.pi) * (pre + 0.044715 * pre ** 3)))
                y = act @ np.asarray(params["w_out"][e], np.float32) \
                    + np.asarray(params["b_out"][e], np.float32)
                out[t] += gate[t] * y
                round_fill[e] += 1
            rem[t, e] = 0.0
        fill = round_fill
    return out.reshape(B, L, E)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_routing_matches_oracle(rng, top_k):
    moe = MoEConfig(n_experts=4, top_k=top_k, capacity_factor=0.75)
    ff = MoEFeedForward(n_embd=16, middle_dim=32, moe=moe)
    params = ff.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((2, 8, 16)), jnp.float32)

    T = 2 * 8
    capacity = int(np.ceil(top_k * T / 4 * 0.75))
    y, aux = ff(params, x)
    y_ref = _oracle(params, x, top_k, capacity)
    np.testing.assert_allclose(np.asarray(y), y_ref, atol=1e-5, rtol=1e-4)
    assert float(aux) > 0.0


def test_moe_full_capacity_routes_everything(rng):
    """With capacity >= T no token is dropped: top-1 output equals the
    gate-weighted argmax expert applied to every token."""
    moe = MoEConfig(n_experts=4, top_k=1, capacity_factor=4.0)
    ff = MoEFeedForward(n_embd=16, middle_dim=32, moe=moe)
    params = ff.init(jax.random.key(1))
    x = jnp.asarray(rng.standard_normal((1, 16, 16)), jnp.float32)
    y, _ = ff(params, x)

    tokens = np.asarray(x, np.float32).reshape(-1, 16)
    logits = tokens @ np.asarray(params["router"], np.float32)
    probs = jax.nn.softmax(jnp.asarray(logits), -1)
    for t in range(tokens.shape[0]):
        e = int(np.argmax(logits[t]))
        pre = tokens[t] @ np.asarray(params["w_in"][e]) \
            + np.asarray(params["b_in"][e])
        act = 0.5 * pre * (1 + np.tanh(
            np.sqrt(2 / np.pi) * (pre + 0.044715 * pre ** 3)))
        yt = act @ np.asarray(params["w_out"][e]) \
            + np.asarray(params["b_out"][e])
        np.testing.assert_allclose(
            np.asarray(y).reshape(-1, 16)[t],
            float(probs[t, e]) * yt, atol=1e-5, rtol=1e-4)


def test_moe_decoder_trains(rng):
    cfg = nn.DecoderConfig(
        n_vocab=64, n_embd=32, n_head=2, n_positions=32, n_layer=2,
        p_dropout=0.0, attention_kind="flash",
        moe=MoEConfig(n_experts=4, top_k=2))
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 64, (2, 16)), jnp.int32)

    def loss_fn(p):
        logits, aux = model(p, ids, return_aux=True)
        ce = jnp.mean(nn.functional.softmax_loss(logits, tgt))
        return ce + cfg.moe.aux_weight * aux

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    gnorm = jnp.sqrt(sum(jnp.sum(g ** 2)
                         for g in jax.tree_util.tree_leaves(grads)))
    assert np.isfinite(float(gnorm)) and float(gnorm) > 0
    # router must receive gradient (through combine weights)
    rg = grads["layers"]["0"]["ff"]["router"]
    assert float(jnp.max(jnp.abs(rg))) > 0


def test_moe_expert_parallel_matches_single_device(rng):
    """Experts sharded over an 8-device mesh (GSPMD all-to-alls) produce the
    same logits as unsharded execution."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    from tpu_flash.nn.moe import expert_param_specs

    moe = MoEConfig(n_experts=8, top_k=1, capacity_factor=2.0)
    ff = MoEFeedForward(n_embd=16, middle_dim=32, moe=moe)
    params = ff.init(jax.random.key(0))
    x = jnp.asarray(rng.standard_normal((4, 32, 16)), jnp.float32)
    y_ref, aux_ref = ff(params, x)

    mesh = Mesh(np.asarray(jax.devices()[:8]), ("expert",))
    specs = expert_param_specs("expert")
    sharded = {k: jax.device_put(v, NamedSharding(mesh, specs[k]))
               for k, v in params.items()}
    x_sh = jax.device_put(x, NamedSharding(mesh, P()))
    y, aux = jax.jit(lambda p, x: ff(p, x))(sharded, x_sh)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(float(aux), float(aux_ref), rtol=1e-5)
