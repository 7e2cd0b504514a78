"""Chunked (fused lm_head + cross-entropy) loss tests.

The reference materializes the full [B, L, V] logits tensor and feeds it to
softmax_loss (minitorch/nn.py:256-274).  ``functional.chunked_softmax_loss``
must be numerically identical to that composition while never building the
logits tensor — these tests check fwd and grads against the composed oracle,
including the uneven-vocab padding path where whole chunks are padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.nn import functional as F


def _composed(hidden, weight, bias, labels):
    logits = hidden @ weight
    if bias is not None:
        logits = logits + bias
    return F.softmax_loss(logits, labels)


@pytest.mark.parametrize("V,n_chunks", [
    (64, 8),      # even split
    (100, 8),     # uneven: last chunk padded
    (10, 8),      # pathological: C=2, three whole chunks are padding
    (97, 3),      # prime vocab
])
def test_chunked_matches_composed_forward(rng, V, n_chunks):
    hidden = jnp.asarray(rng.standard_normal((4, 6, 16)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((16, V)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((V,)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (4, 6)), jnp.int32)

    got = F.chunked_softmax_loss(hidden, weight, bias, labels,
                                 n_chunks=n_chunks)
    exp = _composed(hidden, weight, bias, labels)
    assert got.shape == labels.shape
    np.testing.assert_allclose(got, exp, atol=1e-5, rtol=1e-5)


def test_chunked_no_bias(rng):
    hidden = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((16, 50)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 50, (8,)), jnp.int32)
    got = F.chunked_softmax_loss(hidden, weight, None, labels, n_chunks=4)
    exp = _composed(hidden, weight, None, labels)
    np.testing.assert_allclose(got, exp, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("V,n_chunks", [(100, 8), (64, 4)])
def test_chunked_grads_match_composed(rng, V, n_chunks):
    hidden = jnp.asarray(rng.standard_normal((3, 5, 16)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((16, V)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((V,)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, V, (3, 5)), jnp.int32)
    # non-uniform per-token weights so dL/dlogits isn't a constant scale
    w_tok = jnp.asarray(rng.random((3, 5)), jnp.float32)

    def mean_chunked(h, w, b):
        return jnp.sum(
            F.chunked_softmax_loss(h, w, b, labels, n_chunks=n_chunks)
            * w_tok)

    def mean_composed(h, w, b):
        return jnp.sum(_composed(h, w, b, labels) * w_tok)

    g_got = jax.grad(mean_chunked, argnums=(0, 1, 2))(hidden, weight, bias)
    g_exp = jax.grad(mean_composed, argnums=(0, 1, 2))(hidden, weight, bias)
    for got, exp, name in zip(g_got, g_exp, ["dhidden", "dweight", "dbias"]):
        np.testing.assert_allclose(got, exp, atol=1e-4, rtol=1e-4,
                                   err_msg=name)


def test_chunked_bf16_weights(rng):
    """bf16 hidden/weight with fp32 accumulation: chunked and composed paths
    must agree when the composed path also dots in bf16 with fp32 accum."""
    hidden = jnp.asarray(rng.standard_normal((4, 16)), jnp.bfloat16)
    weight = jnp.asarray(rng.standard_normal((16, 40)), jnp.bfloat16)
    labels = jnp.asarray(rng.integers(0, 40, (4,)), jnp.int32)
    got = F.chunked_softmax_loss(hidden, weight, None, labels, n_chunks=4)
    logits = jnp.dot(hidden, weight, preferred_element_type=jnp.float32)
    exp = F.softmax_loss(logits, labels)
    np.testing.assert_allclose(got, exp, atol=1e-3, rtol=1e-3)


def test_chunked_jit_and_value_and_grad(rng):
    """The production usage: jitted value_and_grad through the custom_vjp."""
    hidden = jnp.asarray(rng.standard_normal((6, 16)), jnp.float32)
    weight = jnp.asarray(rng.standard_normal((16, 33)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 33, (6,)), jnp.int32)

    @jax.jit
    def f(h, w):
        return jnp.mean(F.chunked_softmax_loss(h, w, None, labels,
                                               n_chunks=5))

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(hidden, weight)
    exp_val, exp_grads = jax.value_and_grad(
        lambda h, w: jnp.mean(_composed(h, w, None, labels)),
        argnums=(0, 1))(hidden, weight)
    np.testing.assert_allclose(val, exp_val, atol=1e-5, rtol=1e-5)
    for got, exp in zip(grads, exp_grads):
        np.testing.assert_allclose(got, exp, atol=1e-4, rtol=1e-4)


def test_decoder_return_hidden_chunked_equals_logits_path(rng):
    """DecoderLM(return_hidden=True) + chunked loss == logits + softmax_loss."""
    cfg = nn.DecoderConfig(n_vocab=101, n_embd=32, n_head=4, n_positions=16,
                           n_layer=2, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    ids = jnp.asarray(rng.integers(0, 101, (2, 12)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, 101, (2, 12)), jnp.int32)

    logits = model(params, ids)
    exp = F.softmax_loss(logits, labels)

    hidden = model(params, ids, return_hidden=True)
    assert hidden.shape == (2, 12, 32)
    lm = params["lm_head"]
    got = F.chunked_softmax_loss(hidden, lm["weight"], lm.get("bias"),
                                 labels, n_chunks=8)
    np.testing.assert_allclose(got, exp, atol=1e-4, rtol=1e-4)


def test_mt_loss_fn_chunked_matches_dense(rng):
    """make_loss_fn(chunked_vocab=N) computes the same scalar loss and grads
    as the dense path on a packed-style batch."""
    from tpu_flash.apps.machine_translation import make_loss_fn

    cfg = nn.DecoderConfig(n_vocab=67, n_embd=32, n_head=4, n_positions=16,
                           n_layer=1, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(1))
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 67, (2, 10)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 67, (2, 10)), jnp.int32),
        "label_token_weights": jnp.asarray(
            rng.integers(0, 2, (2, 10)), jnp.float32),
    }
    dense = make_loss_fn(model)
    chunked = make_loss_fn(model, chunked_vocab=4)
    v0, g0 = jax.value_and_grad(dense)(params, batch)
    v1, g1 = jax.value_and_grad(chunked)(params, batch)
    np.testing.assert_allclose(v1, v0, atol=1e-5, rtol=1e-5)
    flat0 = dict(nn.named_parameters(g0))
    flat1 = dict(nn.named_parameters(g1))
    assert flat0.keys() == flat1.keys()
    for k in flat0:
        np.testing.assert_allclose(flat1[k], flat0[k], atol=1e-4, rtol=1e-4,
                                   err_msg=k)
