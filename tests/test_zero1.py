"""ZeRO-1 optimizer-state sharding (parallel/zero.py) on the virtual
8-device CPU mesh: losses must match the plain sharded train step exactly
(the update is elementwise — only the reduction placement changes), and the
Adam moments must actually be partitioned over the data axis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpu_flash import nn, parallel


@pytest.fixture(autouse=True)
def clear_ctx():
    yield
    parallel.set_parallel_context(None)


def make_model():
    cfg = nn.DecoderConfig(n_vocab=128, n_embd=64, n_head=8, n_positions=32,
                           n_layer=2, p_dropout=0.0, attention_kind="flash")
    return nn.DecoderLM(cfg)


def loss_fn_for(model):
    def loss_fn(params, batch, key=None, training=False):
        logits = model(params, batch["input_ids"], key=key, training=training)
        losses = nn.functional.softmax_loss(logits, batch["labels"])
        return jnp.mean(losses * batch["label_token_weights"])
    return loss_fn


def make_batch(rng, B=8, L=32, V=128):
    return {
        "input_ids": rng.integers(0, V, (B, L)).astype(np.int32),
        "labels": rng.integers(0, V, (B, L)).astype(np.int32),
        "label_token_weights": rng.random((B, L)).astype(np.float32),
    }


def test_zero1_specs_fill_unsharded_dims():
    ctx = parallel.make_mesh(data=4, model=2)
    model = make_model()
    params = model.init(jax.random.key(0))
    specs = parallel.decoder_param_specs(model, params)
    z = parallel.zero1_specs(ctx, params, specs)
    att = z["layers"]["0"]["attention"]
    # TP left dim 0 of the out-sharded q weight free -> data goes there
    assert att["q_projection"]["weight"] == P("data", "model")
    # in-sharded out_projection: dim 0 taken by model -> data on dim 1
    assert att["out_projection"]["weight"] == P("model", "data")
    # out-sharded bias is already on the model axis -> unchanged
    assert att["q_projection"]["bias"] == P("model")
    # replicated [64] LN gamma is divisible by data=4 -> sharded
    assert z["ln"]["gamma"] == P("data")


@pytest.mark.parametrize("data,model_p", [(8, 1), (4, 2)])
def test_zero1_losses_match_plain_sharded_step(rng, data, model_p):
    ctx = parallel.make_mesh(data=data, model=model_p)
    model = make_model()
    opt = nn.adamw(lr=1e-3, weight_decay=0.01)
    loss_fn = loss_fn_for(model)
    raw = make_batch(rng)
    batch = parallel.put_batch(ctx, raw)

    params, opt_state, _, _ = parallel.init_zero1(
        ctx, model, opt, jax.random.key(0))
    zstep = parallel.make_zero1_train_step(ctx, model, opt, loss_fn)
    z_losses = []
    for i in range(3):
        params, opt_state, loss = zstep(params, opt_state, batch,
                                        jax.random.key(i))
        z_losses.append(float(loss))

    parallel.set_parallel_context(None)
    p, o, _ = parallel.init_sharded(ctx, model, opt, jax.random.key(0))
    step = parallel.make_sharded_train_step(ctx, model, opt, loss_fn)
    ref_losses = []
    for i in range(3):
        p, o, loss = step(p, o, batch, jax.random.key(i))
        ref_losses.append(float(loss))

    np.testing.assert_allclose(z_losses, ref_losses, rtol=1e-5, atol=1e-6)


def test_zero1_state_is_data_sharded_and_smaller():
    ctx = parallel.make_mesh(data=4, model=2)
    model = make_model()
    opt = nn.adamw(lr=1e-3)
    params, opt_state, _, zspecs = parallel.init_zero1(
        ctx, model, opt, jax.random.key(0))
    m_w = opt_state.exp_avg["layers"]["0"]["attention"]["q_projection"][
        "weight"]
    assert m_w.sharding.spec == P("data", "model")
    # each device holds 1/(data*model) of the moment vs 1/model for params
    w = params["layers"]["0"]["attention"]["q_projection"]["weight"]
    per_dev_m = m_w.addressable_shards[0].data.size
    per_dev_w = w.addressable_shards[0].data.size
    assert per_dev_m * ctx.data_size == per_dev_w

    # sharding survives a step (output state stays zero1-partitioned)
    loss_fn = loss_fn_for(model)
    rng = np.random.default_rng(0)
    batch = parallel.put_batch(ctx, make_batch(rng))
    zstep = parallel.make_zero1_train_step(ctx, model, opt, loss_fn)
    params, opt_state, _ = zstep(params, opt_state, batch, jax.random.key(0))
    m_w = opt_state.exp_avg["layers"]["0"]["attention"]["q_projection"][
        "weight"]
    assert m_w.sharding.spec == P("data", "model")


def test_zero1_composes_with_skip_nonfinite():
    """The generic state-sharding trick must survive optimizer wrappers
    whose state nests the inner one."""
    ctx = parallel.make_mesh(data=8, model=1)
    model = make_model()
    opt = nn.optim.skip_nonfinite(nn.adamw(lr=1e-3))
    loss_fn = loss_fn_for(model)
    params, opt_state, _, _ = parallel.init_zero1(
        ctx, model, opt, jax.random.key(0))
    inner = opt_state.inner.exp_avg["layers"]["0"]["attention"][
        "q_projection"]["weight"]
    assert inner.sharding.spec == P("data", "model")
    rng = np.random.default_rng(1)
    batch = parallel.put_batch(ctx, make_batch(rng))
    zstep = parallel.make_zero1_train_step(ctx, model, opt, loss_fn)
    params, opt_state, loss = zstep(params, opt_state, batch,
                                    jax.random.key(0))
    assert np.isfinite(float(loss))
    assert int(opt_state.skipped) == 0


def test_zero1_composes_with_mixed_precision():
    """The fp32 masters live in the optimizer state at ``master/<param
    path>``, so the path-suffix state sharding must land them on the data
    axis — that is the whole point of composing ZeRO-1 with mixed
    precision (masters cost 4/data_size bytes per weight)."""
    ctx = parallel.make_mesh(data=8, model=1)
    cfg = nn.DecoderConfig(n_vocab=128, n_embd=64, n_head=8, n_positions=32,
                           n_layer=2, p_dropout=0.0, attention_kind="flash",
                           dtype=jnp.bfloat16)
    model = nn.DecoderLM(cfg)
    opt = nn.mixed_precision(nn.adamw(lr=1e-3))
    params, opt_state, _, _ = parallel.init_zero1(
        ctx, model, opt, jax.random.key(0))
    w = params["layers"]["0"]["attention"]["q_projection"]["weight"]
    master = opt_state.master["layers"]["0"]["attention"]["q_projection"][
        "weight"]
    moment = opt_state.inner.exp_avg["layers"]["0"]["attention"][
        "q_projection"]["weight"]
    assert w.dtype == jnp.bfloat16
    assert master.dtype == jnp.float32 and moment.dtype == jnp.float32
    assert master.sharding.spec == P("data", "model")
    assert moment.sharding.spec == P("data", "model")
    assert master.addressable_shards[0].data.size * ctx.data_size == w.size

    loss_fn = loss_fn_for(model)
    rng = np.random.default_rng(1)
    batch = parallel.put_batch(ctx, make_batch(rng))
    zstep = parallel.make_zero1_train_step(ctx, model, opt, loss_fn)
    params, opt_state, loss = zstep(params, opt_state, batch,
                                    jax.random.key(0))
    assert np.isfinite(float(loss))
    w = params["layers"]["0"]["attention"]["q_projection"]["weight"]
    assert w.dtype == jnp.bfloat16
    m2 = opt_state.master["layers"]["0"]["attention"]["q_projection"][
        "weight"]
    # GSPMD may canonicalize away the size-1 model axis in the output spec;
    # what matters is that the masters stay 1/data_size per device.
    assert m2.sharding.spec[0] == "data"
    assert m2.addressable_shards[0].data.size * ctx.data_size == w.size
