"""Pipeline parallelism (GPipe over a 'pipe' mesh axis) vs the plain model.

Runs on the 8-virtual-device CPU mesh (conftest.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.parallel.pipeline import (
    make_pipeline_mesh,
    pipelined_decoder_apply,
    stack_layer_params,
    unstack_layer_params,
)


def _model(n_layer=4):
    cfg = nn.DecoderConfig(
        n_vocab=128, n_embd=64, n_head=4, n_positions=64, n_layer=n_layer,
        p_dropout=0.0, attention_kind="flash")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    return model, params


def test_stack_roundtrip():
    model, params = _model()
    stacked = stack_layer_params(params, model.cfg.n_layer)
    back = unstack_layer_params(stacked, model.cfg.n_layer)
    for i in range(model.cfg.n_layer):
        a = jax.tree_util.tree_leaves(params["layers"][str(i)])
        b = jax.tree_util.tree_leaves(back[str(i)])
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("pipe,data", [(4, 1), (2, 2), (4, 2)])
def test_pipeline_forward_matches(rng, pipe, data):
    model, params = _model()
    mesh = make_pipeline_mesh(pipe=pipe, data=data,
                              devices=jax.devices()[:pipe * data])
    B, L = 8, 32
    ids = jnp.asarray(rng.integers(0, 128, (B, L)), jnp.int32)
    ref = model(params, ids)

    @jax.jit
    def fwd(params, ids):
        return pipelined_decoder_apply(
            model, params, ids, mesh=mesh, n_micro=4,
            data_axis="data" if data > 1 else None)

    out = fwd(params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_backward_matches(rng):
    model, params = _model()
    mesh = make_pipeline_mesh(pipe=4, data=1, devices=jax.devices()[:4])
    B, L = 4, 16
    ids = jnp.asarray(rng.integers(0, 128, (B, L)), jnp.int32)
    tgt = jnp.asarray(rng.integers(0, 128, (B, L)), jnp.int32)

    def loss_ref(params):
        return jnp.mean(nn.functional.softmax_loss(model(params, ids), tgt))

    def loss_pp(params):
        logits = pipelined_decoder_apply(
            model, params, ids, mesh=mesh, n_micro=4, data_axis=None)
        return jnp.mean(nn.functional.softmax_loss(logits, tgt))

    g_ref = jax.grad(loss_ref)(params)
    g_pp = jax.jit(jax.grad(loss_pp))(params)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_pp = dict(jax.tree_util.tree_leaves_with_path(g_pp))
    assert len(flat_ref) == len(flat_pp)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(
            np.asarray(flat_pp[path]), np.asarray(leaf),
            atol=1e-5, rtol=1e-4,
            err_msg=jax.tree_util.keystr(path))


def test_pipeline_dropout_runs(rng):
    """Training mode with dropout keys threads per-(step, stage, layer) keys
    through the schedule without error (stochastic — just smoke + finite)."""
    model, params = _model()
    model.cfg.p_dropout = 0.1
    mesh = make_pipeline_mesh(pipe=2, data=1, devices=jax.devices()[:2])
    ids = jnp.asarray(rng.integers(0, 128, (4, 16)), jnp.int32)
    out = jax.jit(lambda p, i: pipelined_decoder_apply(
        model, p, i, mesh=mesh, n_micro=2, key=jax.random.key(1),
        training=True, data_axis=None))(params, ids)
    assert bool(jnp.isfinite(out).all())


def test_pipeline_rope_matches_plain(rng):
    cfg = nn.DecoderConfig(
        n_vocab=128, n_embd=64, n_head=4, n_positions=64, n_layer=2,
        p_dropout=0.0, attention_kind="flash", positional="rope")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    mesh = make_pipeline_mesh(pipe=2, data=1, devices=jax.devices()[:2])
    ids = jnp.asarray(rng.integers(0, 128, (4, 16)), jnp.int32)
    out = jax.jit(lambda p, i: pipelined_decoder_apply(
        model, p, i, mesh=mesh, n_micro=2, data_axis=None))(params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(model(params, ids)),
                               atol=2e-5, rtol=2e-5)


def test_pipeline_moe_matches_plain(rng):
    cfg = nn.DecoderConfig(
        n_vocab=128, n_embd=64, n_head=4, n_positions=64, n_layer=2,
        p_dropout=0.0, attention_kind="flash",
        moe=nn.MoEConfig(n_experts=4, top_k=1, capacity_factor=4.0))
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    mesh = make_pipeline_mesh(pipe=2, data=1, devices=jax.devices()[:2])
    ids = jnp.asarray(rng.integers(0, 128, (4, 16)), jnp.int32)

    out, aux = jax.jit(lambda p, i: pipelined_decoder_apply(
        model, p, i, mesh=mesh, n_micro=2, data_axis=None,
        return_aux=True))(params, ids)
    ref, ref_aux = model(params, ids, return_aux=True)
    # MoE routing capacity is computed per microbatch (T = B_m*L), but with
    # a generous capacity_factor nothing is dropped and outputs must match;
    # aux is the microbatch-averaged router balance, equal in expectation
    # and here exactly (same tokens, per-microbatch means averaged).
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert np.isfinite(float(aux)) and float(aux) > 0
