"""Module/layer/optimizer parity tests — the analog of the reference's
tests/test_modules_basic.py (torch.nn oracles with copied weights) and an
optimizer check against the reference Adam update rule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from tpu_flash import nn
from tpu_flash.nn import functional as F

TOL = dict(atol=1e-5, rtol=1e-5)


def rand(rng, shape):
    return jnp.asarray(rng.standard_normal(shape), jnp.float32)


def test_linear_vs_torch(rng):
    layer = nn.Linear(16, 32)
    params = layer.init(jax.random.key(0))
    x = rng.standard_normal((4, 16)).astype(np.float32)

    t = torch.nn.Linear(16, 32)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(np.asarray(params["weight"]).T))
        t.bias.copy_(torch.from_numpy(np.asarray(params["bias"])))
    got = layer(params, jnp.asarray(x))
    exp = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, exp, **TOL)


def test_embedding_gather_equals_one_hot(rng):
    gather = nn.Embedding(50, 8)
    onehot = nn.Embedding(50, 8, one_hot_matmul=True)
    params = gather.init(jax.random.key(1))
    ids = jnp.asarray(rng.integers(0, 50, (3, 7)), jnp.int32)
    np.testing.assert_allclose(
        gather(params, ids), onehot(params, ids), **TOL)

    t = torch.nn.Embedding(50, 8)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(np.asarray(params["weight"])))
    exp = t(torch.from_numpy(np.asarray(ids)).long()).detach().numpy()
    np.testing.assert_allclose(gather(params, ids), exp, **TOL)


def test_layernorm_vs_torch(rng):
    layer = nn.LayerNorm(32, eps=1e-5)
    params = layer.init(jax.random.key(2))
    params = {"gamma": rand(rng, (32,)), "beta": rand(rng, (32,))}
    x = rng.standard_normal((6, 32)).astype(np.float32)

    t = torch.nn.LayerNorm(32, eps=1e-5)
    with torch.no_grad():
        t.weight.copy_(torch.from_numpy(np.asarray(params["gamma"])))
        t.bias.copy_(torch.from_numpy(np.asarray(params["beta"])))
    got = layer(params, jnp.asarray(x))
    exp = t(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(got, exp, atol=1e-4, rtol=1e-4)


def test_fused_layernorm_matches_composed(rng):
    composed = nn.LayerNorm(64, eps=1e-8, fused=False)
    fused = nn.LayerNorm(64, eps=1e-8, fused=True)
    params = {"gamma": rand(rng, (64,)), "beta": rand(rng, (64,))}
    x = rand(rng, (4, 10, 64))
    np.testing.assert_allclose(
        composed(params, x), fused(params, x), atol=1e-4, rtol=1e-4)


def test_dropout_semantics(rng):
    layer = nn.Dropout(0.5)
    x = jnp.ones((1000,))
    # eval mode: identity
    np.testing.assert_array_equal(layer({}, x, training=False), x)
    # train mode: inverted dropout preserves expectation
    y = layer({}, x, key=jax.random.key(0), training=True)
    kept = float(jnp.mean((y > 0).astype(jnp.float32)))
    assert 0.4 < kept < 0.6
    np.testing.assert_allclose(float(jnp.mean(y)), 1.0, atol=0.1)
    assert float(jnp.max(y)) == pytest.approx(2.0)


def test_gelu_matches_torch_tanh_approx(rng):
    x = rand(rng, (100,))
    exp = torch.nn.functional.gelu(
        torch.from_numpy(np.asarray(x)), approximate="tanh").numpy()
    np.testing.assert_allclose(F.gelu(x), exp, atol=1e-5, rtol=1e-5)


def test_softmax_loss_matches_torch(rng):
    logits = rand(rng, (5, 17))
    targets = jnp.asarray(rng.integers(0, 17, (5,)), jnp.int32)
    got = F.softmax_loss(logits, targets)
    exp = torch.nn.functional.cross_entropy(
        torch.from_numpy(np.asarray(logits)),
        torch.from_numpy(np.asarray(targets)).long(),
        reduction="none").numpy()
    np.testing.assert_allclose(got, exp, **TOL)


def test_named_parameters_tree():
    cfg = nn.DecoderConfig(n_vocab=100, n_embd=32, n_head=4, n_positions=16,
                           n_layer=2, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    names = dict(nn.named_parameters(params))
    assert "token_embeddings.weight" in names
    assert "layers.0.attention.q_projection.weight" in names
    assert "layers.1.ff.linear_out.bias" in names
    assert nn.num_parameters(params) == sum(p.size for p in names.values())


def test_adam_matches_torch(rng):
    w0 = rand(rng, (7, 3))
    g = rand(rng, (7, 3))
    opt = nn.adam(lr=0.01)
    state = opt.init({"w": w0})
    params = {"w": w0}
    tw = torch.from_numpy(np.asarray(w0)).clone().requires_grad_(True)
    topt = torch.optim.Adam([tw], lr=0.01)
    for _ in range(5):
        params, state = opt.update({"w": g}, state, params)
        tw.grad = torch.from_numpy(np.asarray(g)).clone()
        topt.step()
    np.testing.assert_allclose(params["w"], tw.detach().numpy(),
                               atol=1e-5, rtol=1e-4)


def test_adam_minitorch_compat_differs():
    """compat mode reproduces the reference's (1-beta1) second-moment bug."""
    w0 = jnp.ones((4,))
    g = jnp.full((4,), 0.5)
    correct = nn.adam(lr=0.1)
    compat = nn.adam(lr=0.1, minitorch_compat=True)
    p1, _ = correct.update({"w": g}, correct.init({"w": w0}), {"w": w0})
    p2, _ = compat.update({"w": g}, compat.init({"w": w0}), {"w": w0})
    assert not np.allclose(p1["w"], p2["w"])
    # hand-check compat: v = (1-b1)*g^2 = 0.1*0.25
    v = 0.1 * 0.25
    m = 0.1 * 0.5
    step_size = 0.1 * np.sqrt(1 - 0.999) / (1 - 0.9)
    expected = 1.0 - step_size * m / (np.sqrt(v) + 1e-8)
    np.testing.assert_allclose(p2["w"], np.full((4,), expected), rtol=1e-5)


def test_sgd():
    opt = nn.sgd(lr=0.5)
    params = {"w": jnp.ones((3,))}
    state = opt.init(params)
    params, _ = opt.update({"w": jnp.full((3,), 2.0)}, state, params)
    np.testing.assert_allclose(params["w"], jnp.zeros((3,)), atol=1e-7)


def test_clip_by_global_norm():
    grads = {"a": jnp.full((4,), 3.0), "b": jnp.full((9,), 4.0)}
    # norm = sqrt(4*9 + 9*16) = sqrt(180)
    clipped, norm = nn.clip_by_global_norm(grads, 1.0)
    np.testing.assert_allclose(float(norm), np.sqrt(180.0), rtol=1e-5)
    total = np.sqrt(sum(float(jnp.sum(jnp.square(v))) for v in clipped.values()))
    np.testing.assert_allclose(total, 1.0, rtol=1e-4)


def test_adamw_decoupled_decay_and_schedule(rng):
    """AdamW decays params directly (not via grads) and honors a schedule."""
    import jax
    import jax.numpy as jnp
    from tpu_flash import nn

    params = {"w": jnp.ones((4,), jnp.float32)}
    grads = {"w": jnp.zeros((4,), jnp.float32)}
    opt = nn.adamw(lr=0.1, weight_decay=0.5)
    state = opt.init(params)
    new, state = opt.update(grads, state, params)
    # zero grads: the only change is the decoupled decay lr*wd*p = 0.05
    np.testing.assert_allclose(np.asarray(new["w"]), 0.95, rtol=1e-6)

    sched = nn.cosine_schedule(peak_lr=1.0, warmup_steps=10, total_steps=100)
    assert float(sched(jnp.asarray(5))) == pytest.approx(0.5)
    assert float(sched(jnp.asarray(10))) == pytest.approx(1.0)
    assert float(sched(jnp.asarray(100))) == pytest.approx(0.0, abs=1e-6)
    opt = nn.adamw(lr=sched)
    state = opt.init(params)
    new, state = opt.update(grads, state, params)
    assert np.isfinite(np.asarray(new["w"])).all()


def test_gradient_accumulation_matches_full_batch(rng):
    """Accumulated microbatch grads == full-batch grads (mean loss)."""
    import jax
    import jax.numpy as jnp
    from tpu_flash import nn

    w = jnp.asarray(rng.standard_normal((4, 3)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((8, 4)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((8, 3)), jnp.float32)

    def loss_fn(params, batch):
        pred = batch["x"] @ params
        return jnp.mean((pred - batch["y"]) ** 2)

    full_loss, full_g = jax.value_and_grad(loss_fn)(w, {"x": x, "y": y})
    micro = {"x": x.reshape(4, 2, 4), "y": y.reshape(4, 2, 3)}
    acc_loss, acc_g = nn.accumulate_gradients(loss_fn, 4)(w, micro)
    np.testing.assert_allclose(float(acc_loss), float(full_loss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(acc_g), np.asarray(full_g),
                               atol=1e-6, rtol=1e-6)


def test_skip_nonfinite_updates():
    from tpu_flash.nn import optim

    tx = optim.skip_nonfinite(optim.adam(0.1))
    params = {"w": jnp.ones((3,)), "b": jnp.zeros((2,))}
    state = tx.init(params)

    good = {"w": jnp.full((3,), 0.5), "b": jnp.full((2,), -0.5)}
    p1, state = jax.jit(tx.update)(good, state, params)
    assert float(jnp.max(jnp.abs(p1["w"] - params["w"]))) > 0.0
    assert int(state.skipped) == 0

    bad = {"w": jnp.asarray([0.1, jnp.nan, 0.2]), "b": good["b"]}
    p2, state = jax.jit(tx.update)(bad, state, p1)
    np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(p1["w"]))
    np.testing.assert_array_equal(np.asarray(p2["b"]), np.asarray(p1["b"]))
    assert int(state.skipped) == 1
    # inner adam state untouched by the bad step
    p3, state = jax.jit(tx.update)(good, state, p2)
    assert int(state.skipped) == 1
    assert int(state.inner.step) == 2  # two applied steps, one skipped


def test_mixed_precision_matches_fp32_trajectory():
    """mixed_precision(adam) on bf16 params must follow the fp32 Adam
    trajectory exactly when fed grads that are exact in bf16: the fp32
    masters ARE the fp32 run, and the bf16 params are their per-step cast."""
    from tpu_flash.nn import optim

    rng = np.random.default_rng(0)
    w0 = jnp.asarray(rng.standard_normal((16, 8)), jnp.float32)
    p32 = {"w": w0}
    p16 = {"w": w0.astype(jnp.bfloat16)}
    # bf16 init loses mantissa bits; run the fp32 oracle from the SAME
    # (bf16-representable) starting point
    p32 = {"w": p16["w"].astype(jnp.float32)}

    tx32 = optim.adam(0.01)
    tx16 = optim.mixed_precision(optim.adam(0.01))
    s32, s16 = tx32.init(p32), tx16.init(p16)
    up32, up16 = jax.jit(tx32.update), jax.jit(tx16.update)
    for i in range(10):
        g16 = jnp.asarray(rng.standard_normal((16, 8))).astype(jnp.bfloat16)
        p32, s32 = up32({"w": g16.astype(jnp.float32)}, s32, p32)
        p16, s16 = up16({"w": g16}, s16, p16)
        assert p16["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(s16.master["w"]),
                                  np.asarray(p32["w"]))
    np.testing.assert_array_equal(np.asarray(p16["w"]),
                                  np.asarray(p32["w"].astype(jnp.bfloat16)))


def test_mixed_precision_accumulates_sub_ulp_updates():
    """The failure mode the wrapper exists for: near 1.0, one bf16 ulp is
    2^-8, so a pure-bf16 optimizer rounds every ~1e-4 Adam step to zero and
    the weight never moves; fp32 masters accumulate them."""
    from tpu_flash.nn import optim

    params = {"w": jnp.ones((4,), jnp.bfloat16)}
    g = {"w": jnp.ones((4,), jnp.bfloat16)}

    naive = optim.adam(1e-4)
    s = naive.init(params)
    p_naive = params
    up = jax.jit(naive.update)
    for _ in range(100):
        p_naive, s = up(g, s, p_naive)

    mp = optim.mixed_precision(optim.adam(1e-4))
    s = mp.init(params)
    p_mp = params
    up = jax.jit(mp.update)
    for _ in range(100):
        p_mp, s = up(g, s, p_mp)

    # pure bf16: stuck at exactly 1.0 (and must STAY bf16 — the update
    # once silently promoted params to fp32); mixed: ~1.0 - 100*1e-4
    assert p_naive["w"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(np.asarray(p_naive["w"], np.float32),
                                  np.ones(4, np.float32))
    assert float(p_mp["w"][0]) < 0.995
    np.testing.assert_allclose(np.asarray(s.master["w"]),
                               np.full(4, 1.0 - 100e-4), rtol=1e-3)


def test_mixed_precision_composes_with_skip_nonfinite():
    from tpu_flash.nn import optim

    tx = optim.skip_nonfinite(optim.mixed_precision(optim.adam(0.1)))
    params = {"w": jnp.ones((3,), jnp.bfloat16)}
    state = tx.init(params)
    good = {"w": jnp.full((3,), 0.5, jnp.bfloat16)}
    p1, state = jax.jit(tx.update)(good, state, params)
    assert p1["w"].dtype == jnp.bfloat16
    assert float(jnp.max(jnp.abs(p1["w"].astype(jnp.float32) - 1.0))) > 0
    bad = {"w": jnp.asarray([0.1, np.nan, 0.2], jnp.bfloat16)}
    p2, state = jax.jit(tx.update)(bad, state, p1)
    np.testing.assert_array_equal(np.asarray(p2["w"], np.float32),
                                  np.asarray(p1["w"], np.float32))
    assert int(state.skipped) == 1
    assert int(state.inner.inner.step) == 1
