"""Multi-device sharding tests on the virtual 8-device CPU mesh: the SPMD
train step (Megatron TP over 'model' + data parallelism over 'data') must
reproduce single-device losses exactly, and the shard_map'ed Pallas kernels
must agree with their unsharded results."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from tpu_flash import nn, parallel
from tpu_flash.ops import flash_attention, layer_norm, naive_attention


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


def make_batch(rng, B=4, L=32, V=128):
    return {
        "input_ids": rng.integers(0, V, (B, L)).astype(np.int32),
        "labels": rng.integers(0, V, (B, L)).astype(np.int32),
        "label_token_weights": rng.random((B, L)).astype(np.float32),
    }


def test_mesh_construction():
    ctx = parallel.make_mesh(data=2, model=4)
    assert ctx.data_size == 2 and ctx.model_size == 4
    with pytest.raises(ValueError):
        parallel.make_mesh(data=3, model=3)


def test_param_specs_layout():
    model = make_model()
    params = model.init(jax.random.key(0))
    specs = parallel.decoder_param_specs(model, params)
    att = specs["layers"]["0"]["attention"]
    assert att["q_projection"]["weight"] == P(None, "model")
    assert att["out_projection"]["weight"] == P("model", None)
    assert specs["layers"]["0"]["ff"]["linear_in"]["weight"] == P(None, "model")
    assert specs["ln"]["gamma"] == P(None)


def test_sharded_flash_attention_matches(rng):
    ctx = parallel.make_mesh(data=2, model=4)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 8, 64, 32)), jnp.float32)
               for _ in range(3))
    expected = naive_attention(q, k, v, causal=True)
    with parallel.parallel_context(ctx):
        out = flash_attention(q, k, v, causal=True)
    assert out.sharding.spec == P("data", "model", None, None)
    np.testing.assert_allclose(out, expected, atol=1e-3, rtol=1e-3)


def test_sharded_layer_norm_matches(rng):
    ctx = parallel.make_mesh(data=8, model=1)
    x = jnp.asarray(rng.standard_normal((8, 16, 64)), jnp.float32)
    g = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    expected = layer_norm(x, g, b)
    with parallel.parallel_context(ctx):
        out = layer_norm(x, g, b)
    np.testing.assert_allclose(out, expected, atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("data,model_p", [(8, 1), (2, 4), (1, 8)])
def test_sharded_train_step_matches_single_device(rng, data, model_p):
    ctx = parallel.make_mesh(data=data, model=model_p)
    model = make_model()
    opt = nn.adam(lr=1e-3)
    loss_fn = loss_fn_for(model)

    params, opt_state, _ = parallel.init_sharded(
        ctx, model, opt, jax.random.key(0))
    raw = make_batch(rng, B=8)
    batch = parallel.put_batch(ctx, raw)
    step = parallel.make_sharded_train_step(ctx, model, opt, loss_fn)
    sharded_losses = []
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.key(i))
        sharded_losses.append(float(loss))

    parallel.set_parallel_context(None)
    p = model.init(jax.random.key(0))
    o = opt.init(p)

    @jax.jit
    def step1(p, o, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch, key=key,
                                                  training=True)
        p, o = opt.update(grads, o, p)
        return p, o, loss

    host_batch = {k: jnp.asarray(v) for k, v in raw.items()}
    single_losses = []
    for i in range(3):
        p, o, loss = step1(p, o, host_batch, jax.random.key(i))
        single_losses.append(float(loss))

    np.testing.assert_allclose(sharded_losses, single_losses,
                               rtol=1e-5, atol=1e-6)


def test_sharded_flash_attention_dropout_runs(rng):
    """Dropout under a parallel context: the seed rides shard_map as a
    replicated operand; determinism per seed and sensitivity across seeds
    still hold."""
    ctx = parallel.make_mesh(data=2, model=4)
    q, k, v = (jnp.asarray(rng.standard_normal((2, 8, 64, 32)), jnp.float32)
               for _ in range(3))
    with parallel.parallel_context(ctx):
        a = flash_attention(q, k, v, causal=True, dropout_rate=0.3,
                            dropout_seed=11)
        b = flash_attention(q, k, v, causal=True, dropout_rate=0.3,
                            dropout_seed=11)
        c = flash_attention(q, k, v, causal=True, dropout_rate=0.3,
                            dropout_seed=12)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(jnp.max(jnp.abs(a - c))) > 0.0
    assert a.sharding.spec == P("data", "model", None, None)


@pytest.mark.parametrize("data,model_p", [(2, 4), (4, 2), (8, 1)])
def test_sharded_dropout_bit_identical_to_unsharded(rng, data, model_p):
    """The dropout hash mixes GLOBAL (batch, head) indices via the shard
    offsets packed into the seed vector, so ANY mesh layout produces the
    same bits as the single-device run — forward and backward."""
    ctx = parallel.make_mesh(data=data, model=model_p)
    # B divisible by every data size so the shard_map kernel path (not the
    # GSPMD dense fallback) is what runs in all three layouts.
    q, k, v, do = (jnp.asarray(rng.standard_normal((8, 8, 64, 32)),
                               jnp.float32) for _ in range(4))

    def loss(q, k, v):
        out = flash_attention(q, k, v, causal=True, dropout_rate=0.25,
                              dropout_seed=7)
        return jnp.sum(out * do), out

    with parallel.parallel_context(ctx):
        (_, sharded), sgrads = jax.value_and_grad(
            loss, (0, 1, 2), has_aux=True)(q, k, v)
    parallel.set_parallel_context(None)
    (_, single), grads = jax.value_and_grad(
        loss, (0, 1, 2), has_aux=True)(q, k, v)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))
    for sg, g in zip(sgrads, grads):
        np.testing.assert_array_equal(np.asarray(sg), np.asarray(g))


def test_sequence_parallel_matches_single_device(rng):
    """Megatron-SP activation sharding (DecoderConfig.sequence_parallel) is
    a pure layout annotation: the sharded train step must reproduce
    single-device losses, and generation/decode must be unaffected."""
    cfg = nn.DecoderConfig(n_vocab=128, n_embd=64, n_head=8, n_positions=32,
                           n_layer=2, p_dropout=0.0, attention_kind="flash",
                           sequence_parallel=True)
    model = nn.DecoderLM(cfg)
    opt = nn.adam(lr=1e-3)
    loss_fn = loss_fn_for(model)

    ctx = parallel.make_mesh(data=2, model=4)
    params, opt_state, _ = parallel.init_sharded(
        ctx, model, opt, jax.random.key(0))
    raw = make_batch(rng, B=8)
    batch = parallel.put_batch(ctx, raw)
    step = parallel.make_sharded_train_step(ctx, model, opt, loss_fn)
    sharded_losses = []
    for i in range(3):
        params, opt_state, loss = step(params, opt_state, batch,
                                       jax.random.key(i))
        sharded_losses.append(float(loss))

    parallel.set_parallel_context(None)
    p = model.init(jax.random.key(0))
    o = opt.init(p)

    @jax.jit
    def step1(p, o, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(p, batch, key=key,
                                                  training=True)
        p, o = opt.update(grads, o, p)
        return p, o, loss

    host_batch = {k: jnp.asarray(v) for k, v in raw.items()}
    single_losses = []
    for i in range(3):
        p, o, loss = step1(p, o, host_batch, jax.random.key(i))
        single_losses.append(float(loss))
    np.testing.assert_allclose(sharded_losses, single_losses,
                               rtol=1e-5, atol=1e-6)

    # decode path (L=1 steps) must ignore SP: cached generation under the
    # ctx still matches the unsharded model's logits
    from tpu_flash.inference.sampler import make_caches
    ids = jnp.asarray(rng.integers(0, 128, (4, 8)), jnp.int32)

    def decode_all(prm):
        caches = make_caches(model, 4, 16)
        logits, caches = model(prm, ids[:, :4], kv_caches=caches,
                               positions=jnp.arange(4)[None, :].repeat(4, 0))
        outs = [logits[:, -1]]
        for t in range(4, 8):
            logits, caches = model(prm, ids[:, t:t + 1], kv_caches=caches,
                                   positions=jnp.full((4, 1), t, jnp.int32))
            outs.append(logits[:, 0])
        return jnp.stack(outs, 1)

    ref = decode_all(p)
    parallel.set_parallel_context(ctx)
    try:
        got = decode_all(params)
    finally:
        parallel.set_parallel_context(None)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-4, rtol=2e-4)


def test_multistep_full_composition_matches_single_device(rng):
    """VERDICT round-1 item 9: N sharded steps with EVERYTHING on at once —
    module dropout keys, packed batches (segment ids + per-example
    positions), chunked vocab-parallel loss, ZeRO-1 + mixed precision —
    pinned against the identical single-device composition step by step.
    The individual features are tested elsewhere; this pins their
    composition over time (optimizer state evolution included).

    attn_dropout stays off: the in-kernel hash mask indexes by shard-LOCAL
    (batch*head) under shard_map, so it is the one feature that cannot be
    bit-equal across layouts (ops/attention.py NOTE); its plumbing is
    exercised by test_sharded_flash_attention_dropout_runs."""
    cfg = nn.DecoderConfig(n_vocab=128, n_embd=64, n_head=8, n_positions=32,
                           n_layer=2, p_dropout=0.1, attention_kind="flash",
                           sequence_parallel=True)
    model = nn.DecoderLM(cfg)
    opt = nn.mixed_precision(nn.adam(lr=1e-3))
    ctx = parallel.make_mesh(data=2, model=4)

    def make_loss_fn(loss_ctx):
        def loss_fn(params, batch, key=None, training=False):
            hidden = model(params, batch["input_ids"],
                           segment_ids=batch["segment_ids"],
                           positions=batch["positions"], key=key,
                           training=training, return_hidden=True)
            lm = params["lm_head"]
            losses = parallel.vocab_parallel_softmax_loss(
                hidden, lm["weight"], lm.get("bias"), batch["labels"],
                n_chunks=2, ctx=loss_ctx)
            return jnp.mean(losses * batch["label_token_weights"])
        return loss_fn

    B, L = 8, 32
    seg = np.sort(rng.integers(0, 3, (B, L))).astype(np.int32)
    pos = np.zeros((B, L), np.int32)
    for b in range(B):
        for sid in np.unique(seg[b]):
            sl = np.where(seg[b] == sid)[0]
            pos[b, sl] = np.arange(len(sl))
    raw = make_batch(rng, B=B, L=L)
    raw["segment_ids"], raw["positions"] = seg, pos

    # sharded: ZeRO-1 (optimizer state sharded over data) on the mesh
    zparams, zopt_state, _, _ = parallel.init_zero1(
        ctx, model, opt, jax.random.key(0))
    batch = parallel.put_batch(ctx, raw)
    zstep = parallel.make_zero1_train_step(ctx, model, opt,
                                           make_loss_fn(ctx))
    sharded_losses = []
    for i in range(4):
        zparams, zopt_state, loss = zstep(zparams, zopt_state, batch,
                                          jax.random.key(i))
        sharded_losses.append(float(loss))
    parallel.set_parallel_context(None)

    # single-device oracle: same init/batch/keys, plain jit step
    p = model.init(jax.random.key(0))
    o = opt.init(p)
    oracle_loss_fn = make_loss_fn(None)

    @jax.jit
    def step1(p, o, batch, key):
        loss, grads = jax.value_and_grad(oracle_loss_fn)(
            p, batch, key=key, training=True)
        p, o = opt.update(grads, o, p)
        return p, o, loss

    host_batch = {k: jnp.asarray(v) for k, v in raw.items()}
    single_losses = []
    for i in range(4):
        p, o, loss = step1(p, o, host_batch, jax.random.key(i))
        single_losses.append(float(loss))

    np.testing.assert_allclose(sharded_losses, single_losses,
                               rtol=1e-5, atol=1e-6)


def test_hybrid_mesh_construction():
    """dcn_data builds the (h*data, model) hybrid layout with model inside
    each granule and data ordered [DCN slower, ICI faster]
    (parallel/context.py)."""
    ctx = parallel.make_mesh(data=2, model=2, dcn_data=2)
    assert ctx.data_size == 4 and ctx.model_size == 2
    # single-process emulation: granule h owns the contiguous device block
    devs = ctx.mesh.devices
    flat = [d.id for d in devs.reshape(-1)]
    assert flat == sorted(flat)  # [dcn, data, model] row-major order
    with pytest.raises(ValueError):
        parallel.make_mesh(data=2, model=2, dcn_data=3)


def test_hybrid_mesh_train_step_matches_single_device(rng):
    """The 2-granule hybrid mesh compiles and pins to the single-device
    oracle, exactly like the flat mesh."""
    ctx = parallel.make_mesh(data=1, model=4, dcn_data=2)
    model = make_model()
    opt = nn.adam(lr=1e-3)
    loss_fn = loss_fn_for(model)

    params, opt_state, _ = parallel.init_sharded(
        ctx, model, opt, jax.random.key(0))
    raw = make_batch(rng, B=8)
    batch = parallel.put_local_batch(ctx, raw)  # 1-process: == put_batch
    step = parallel.make_sharded_train_step(ctx, model, opt, loss_fn)
    params, opt_state, loss = step(params, opt_state, batch,
                                   jax.random.key(0))

    parallel.set_parallel_context(None)
    p = model.init(jax.random.key(0))

    @jax.jit
    def loss1(p, batch, key):
        return loss_fn(p, batch, key=key, training=True)

    single = float(loss1(p, {k: jnp.asarray(v) for k, v in raw.items()},
                         jax.random.key(0)))
    np.testing.assert_allclose(float(loss), single, rtol=1e-5, atol=1e-6)


def test_initialize_distributed_idempotent():
    """Single-process calls must not raise (defensive-call contract),
    whether the XLA backend is already up or the distributed service was
    already joined."""
    jax.devices()  # ensure the backend is initialized
    parallel.initialize_distributed(
        coordinator_address="127.0.0.1:12345", num_processes=1, process_id=0)
    # second call must be a no-op too
    parallel.initialize_distributed(
        coordinator_address="127.0.0.1:12345", num_processes=1, process_id=0)


@pytest.mark.parametrize("mode", ["int8", "fp8"])
def test_sharded_kv_quant_matches_unsharded(rng, mode):
    """Quantized-KV attention under a parallel context runs the kernel in
    shard_map (per-shard quantize == global: scales are per-(b,h,pos)) and
    must match the unsharded run bit-exactly, fw and bw."""
    ctx = parallel.make_mesh(data=2, model=4)
    q, k, v, do = (jnp.asarray(rng.standard_normal((2, 8, 64, 32)),
                               jnp.float32) for _ in range(4))

    def loss(q, k, v):
        out = flash_attention(q, k, v, causal=True, kv_quant=mode)
        return jnp.sum(out * do), out

    with parallel.parallel_context(ctx):
        (_, sharded), sgrads = jax.value_and_grad(
            loss, (0, 1, 2), has_aux=True)(q, k, v)
    parallel.set_parallel_context(None)
    (_, single), grads = jax.value_and_grad(
        loss, (0, 1, 2), has_aux=True)(q, k, v)
    np.testing.assert_array_equal(np.asarray(sharded), np.asarray(single))
    for sg, g in zip(sgrads, grads):
        np.testing.assert_array_equal(np.asarray(sg), np.asarray(g))
