"""Vocab-parallel (Megatron-style) fused lm_head + cross-entropy tests.

The reference computes its loss on full single-GPU logits
(minitorch/nn.py:256-274); `parallel.vocab_parallel_softmax_loss` shards the
lm_head over the model axis and merges per-shard online-softmax partials
with pmax/psum — these tests pin fwd + grads against the dense composed
oracle on the 8-virtual-device CPU mesh, including uneven vocabs where the
global pad swallows an ENTIRE shard.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn, parallel
from tpu_flash.nn import functional as F


@pytest.fixture(autouse=True)
def clear_ctx():
    yield
    parallel.set_parallel_context(None)


def _composed(hidden, weight, bias, labels):
    logits = jnp.dot(hidden, weight, preferred_element_type=jnp.float32)
    if bias is not None:
        logits = logits + bias
    return F.softmax_loss(logits, labels)


@pytest.mark.parametrize("V,n_chunks", [
    (96, 2),      # even split across 4 shards x 2 chunks
    (100, 2),     # uneven: last shard's last chunk padded
    (97, 1),      # prime vocab, dense per shard
    (5, 2),       # pathological: pad > one shard -> shard 3 is ALL padding
])
def test_vocab_parallel_matches_dense(rng, V, n_chunks):
    ctx = parallel.make_mesh(data=2, model=4)
    hidden = jnp.asarray(rng.standard_normal((4, 6, 16)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((16, V)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((V,)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (4, 6)), jnp.int32)

    got = parallel.vocab_parallel_softmax_loss(
        hidden, weight, bias, labels, n_chunks=n_chunks, ctx=ctx)
    exp = _composed(hidden, weight, bias, labels)
    assert got.shape == labels.shape
    np.testing.assert_allclose(got, exp, atol=1e-5, rtol=1e-5)


def test_vocab_parallel_grads_match_dense(rng):
    ctx = parallel.make_mesh(data=2, model=4)
    V = 100
    hidden = jnp.asarray(rng.standard_normal((2, 5, 16)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((16, V)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((V,)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (2, 5)), jnp.int32)
    w_tok = jnp.asarray(rng.random((2, 5)), jnp.float32)

    def par(h, w, b):
        return jnp.sum(parallel.vocab_parallel_softmax_loss(
            h, w, b, labels, n_chunks=2, ctx=ctx) * w_tok)

    def dense(h, w, b):
        return jnp.sum(_composed(h, w, b, labels) * w_tok)

    g_got = jax.grad(par, argnums=(0, 1, 2))(hidden, weight, bias)
    g_exp = jax.grad(dense, argnums=(0, 1, 2))(hidden, weight, bias)
    for got, exp, name in zip(g_got, g_exp, ["dhidden", "dweight", "dbias"]):
        np.testing.assert_allclose(got, exp, atol=1e-4, rtol=1e-4,
                                   err_msg=name)


def test_vocab_parallel_no_bias_jit(rng):
    """Production form: jitted value_and_grad, no bias, weight placed
    vocab-sharded on the mesh (the shard_map in_spec keeps it resident —
    no all-gather of the lm_head)."""
    ctx = parallel.make_mesh(data=2, model=4)
    V = 64
    hidden = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    weight = jax.device_put(
        jnp.asarray(rng.standard_normal((16, V)), jnp.float32),
        ctx.sharding(None, "model"))
    labels = jnp.asarray(rng.integers(0, V, (4,)), jnp.int32)

    @jax.jit
    def f(h, w):
        return jnp.mean(parallel.vocab_parallel_softmax_loss(
            h, w, None, labels, n_chunks=2, ctx=ctx))

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(hidden, weight)
    exp_val, exp_grads = jax.value_and_grad(
        lambda h, w: jnp.mean(_composed(h, w, None, labels)),
        argnums=(0, 1))(hidden, weight)
    np.testing.assert_allclose(val, exp_val, atol=1e-5, rtol=1e-5)
    for got, exp in zip(grads, exp_grads):
        np.testing.assert_allclose(got, exp, atol=1e-4, rtol=1e-4)


def test_fallback_without_context(rng):
    """No mesh / model_size 1 / indivisible batch -> single-device chunked."""
    V = 50
    hidden = jnp.asarray(rng.standard_normal((3, 16)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((16, V)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (3,)), jnp.int32)
    got = parallel.vocab_parallel_softmax_loss(hidden, weight, None, labels)
    np.testing.assert_allclose(got, _composed(hidden, weight, None, labels),
                               atol=1e-5, rtol=1e-5)
    # B=3 does not divide data=2 -> fallback path, still exact
    ctx = parallel.make_mesh(data=2, model=4)
    got = parallel.vocab_parallel_softmax_loss(hidden, weight, None, labels,
                                               ctx=ctx)
    np.testing.assert_allclose(got, _composed(hidden, weight, None, labels),
                               atol=1e-5, rtol=1e-5)


def test_sharded_train_step_with_vocab_parallel_loss(rng):
    """Full SPMD train step using the vocab-parallel loss must track the
    single-device dense-loss step (same params after one update)."""
    cfg = nn.DecoderConfig(n_vocab=96, n_embd=64, n_head=8, n_positions=32,
                           n_layer=1, p_dropout=0.0, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    opt = nn.optim.sgd(lr=0.1)
    batch = {
        "input_ids": rng.integers(0, 96, (4, 16)).astype(np.int32),
        "labels": rng.integers(0, 96, (4, 16)).astype(np.int32),
        "label_token_weights": rng.random((4, 16)).astype(np.float32),
    }
    key = jax.random.key(0)

    def dense_loss(params, batch, key=None, training=False):
        logits = model(params, batch["input_ids"], key=key,
                       training=training)
        losses = F.softmax_loss(logits, batch["labels"])
        return jnp.mean(losses * batch["label_token_weights"])

    params0 = model.init(jax.random.key(1))
    opt_state0 = opt.init(params0)
    l_ref, g_ref = jax.value_and_grad(dense_loss)(
        params0, {k: jnp.asarray(v) for k, v in batch.items()}, key=key,
        training=True)
    params_ref, _ = opt.update(g_ref, opt_state0, params0)

    ctx = parallel.make_mesh(data=2, model=4)

    def vp_loss(params, batch, key=None, training=False):
        hidden = model(params, batch["input_ids"], key=key,
                       training=training, return_hidden=True)
        lm = params["lm_head"]
        losses = parallel.vocab_parallel_softmax_loss(
            hidden, lm["weight"], lm.get("bias"), batch["labels"],
            n_chunks=2, ctx=ctx)
        return jnp.mean(losses * batch["label_token_weights"])

    params = jax.device_put(params0)
    params, specs = parallel.shard_params(ctx, model, params)
    opt_state = opt.init(params)
    step = parallel.make_sharded_train_step(ctx, model, opt, vp_loss)
    sbatch = parallel.put_batch(ctx, batch)
    params, opt_state, loss = step(params, opt_state, sbatch, key)
    np.testing.assert_allclose(float(loss), float(l_ref), atol=1e-5,
                               rtol=1e-5)
    flat_ref = dict(nn.named_parameters(params_ref))
    flat = dict(nn.named_parameters(jax.device_get(params)))
    for k in flat_ref:
        np.testing.assert_allclose(flat[k], flat_ref[k], atol=1e-4,
                                   rtol=1e-4, err_msg=k)


def test_chunked_loss_axis_form_grad_inside_shard_map(rng):
    """The functional-level ``chunked_softmax_loss(axis_name=, batch_axis=)``
    form is for manual-SPMD loops where jax.grad runs INSIDE the shard_map
    body (its docstring forbids differentiating THROUGH the shard_map).
    Pin that pattern's value and all three grads against the dense oracle."""
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    ctx = parallel.make_mesh(data=2, model=4)
    V, E = 64, 16                     # V_local=16, n_chunks=2 -> C=8
    hidden = jnp.asarray(rng.standard_normal((4, E)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((E, V)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((V,)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (4,)), jnp.int32)
    w_tok = jnp.asarray(rng.random((4,)), jnp.float32)

    def body(h, w, b, y, wt):
        def local_loss(h, w, b):
            losses = F.chunked_softmax_loss(
                h, w, b, y, n_chunks=2, axis_name="model",
                batch_axis="data")
            return jnp.sum(losses * wt)

        val, grads = jax.value_and_grad(local_loss, argnums=(0, 1, 2))(
            h, w, b)
        return (jax.lax.psum(val, "data"),) + grads

    fn = jax.shard_map(
        body, mesh=ctx.mesh,
        in_specs=(P("data"), P(None, "model"), P("model"), P("data"),
                  P("data")),
        out_specs=(P(), P("data"), P(None, "model"), P("model")),
        check_vma=False)
    val, dh, dw, db = fn(hidden, weight, bias, labels, w_tok)

    def dense(h, w, b):
        return jnp.sum(_composed(h, w, b, labels) * w_tok)

    exp_val = dense(hidden, weight, bias)
    exp = jax.grad(dense, argnums=(0, 1, 2))(hidden, weight, bias)
    np.testing.assert_allclose(val, exp_val, atol=1e-5, rtol=1e-5)
    for got, e, name in zip((dh, dw, db), exp, ["dh", "dw", "db"]):
        np.testing.assert_allclose(got, e, atol=1e-4, rtol=1e-4,
                                   err_msg=name)


def test_evaluate_loss_under_tp_context(rng):
    """Regression: apps.machine_translation.evaluate_loss must trace under
    the active parallel context — a bare jit against TP-sharded params
    skips the Pallas ops' shard_map wrapping (caught in review 2026-08-18).
    Pins the sharded-eval value against the unsharded model."""
    from tpu_flash.apps.machine_translation import evaluate_loss, make_loss_fn

    cfg = nn.DecoderConfig(n_vocab=64, n_embd=32, n_head=4, n_positions=16,
                           n_layer=1, p_dropout=0.0, attention_kind="flash")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))

    B, L = 4, 16
    def collate_fn(examples):
        r = np.random.default_rng(sum(examples))
        return {
            "input_ids": r.integers(0, 64, (B, L)).astype(np.int32),
            "labels": r.integers(0, 64, (B, L)).astype(np.int32),
            "label_token_weights": np.ones((B, L), np.float32),
        }
    examples = list(range(8))

    ref = evaluate_loss(model, params, examples, collate_fn, B,
                        chunked_vocab=2)

    ctx = parallel.make_mesh(data=2, model=4)
    sparams, _ = parallel.shard_params(ctx, model, params)
    parallel.set_parallel_context(None)  # evaluate_loss must manage it
    got = evaluate_loss(model, sparams, examples, collate_fn, B,
                        chunked_vocab=2, ctx=ctx)
    np.testing.assert_allclose(got, ref, atol=1e-5, rtol=1e-5)


def test_generate_translations_under_tp_context():
    """Regression (review 2026-08-18): BLEU generation against TP-sharded
    params must trace under the parallel context, like evaluate_loss."""
    from tpu_flash.apps.machine_translation import generate_translations
    from tpu_flash.data import mt

    data = mt.synthetic_translation_dataset(n_train=32, n_validation=1,
                                            n_test=4)
    tok = mt.get_tokenizer(data["train"], 300, "de", "en",
                           workdir="/tmp/test_tp_gen_tok")
    cfg = nn.DecoderConfig(n_vocab=300, n_embd=32, n_head=4, n_positions=64,
                           n_layer=1, p_dropout=0.0, attention_kind="flash")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))

    ref = generate_translations(model, params, data["test"], "de", "en",
                                tok, 32, batch_size=4)

    ctx = parallel.make_mesh(data=2, model=2, devices=jax.devices()[:4])
    sparams, _ = parallel.shard_params(ctx, model, params)
    parallel.set_parallel_context(None)
    got = generate_translations(model, sparams, data["test"], "de", "en",
                                tok, 32, batch_size=4, ctx=ctx)
    assert got == ref
