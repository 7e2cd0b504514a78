"""Sequence packing (segment-id attention): kernel parity, model-level
packed==unpacked equivalence, and the packed MT collate's label semantics.

New capability vs the reference (whose collate pads every example to
model_max_length, run_machine_translation.py:87-154): multiple examples per
row under in-kernel block-diagonal masking, with per-example positions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import nn
from tpu_flash.data import mt
from tpu_flash.ops import flash_attention


def random_segments(rng, B, L, max_segs=4):
    """Sorted random segment ids with unaligned boundaries."""
    return jnp.asarray(np.sort(rng.integers(0, max_segs, (B, L))), jnp.int32)


@pytest.mark.parametrize("causal", [False, True])
def test_segment_kernel_matches_dense(rng, causal):
    B, H, L, d = 2, 2, 200, 32     # L exercises the padding path
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    seg = random_segments(rng, B, L)
    out = flash_attention(q, k, v, causal=causal, segment_ids=seg,
                          impl="pallas")
    ref = flash_attention(q, k, v, causal=causal, segment_ids=seg,
                          impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-4)


def test_segment_kernel_grads_match_dense(rng):
    B, H, L, d = 1, 2, 160, 32
    q, k, v, do = (jnp.asarray(rng.standard_normal((B, H, L, d)),
                               jnp.float32) for _ in range(4))
    seg = random_segments(rng, B, L)

    def loss(impl):
        return lambda q, k, v: jnp.sum(flash_attention(
            q, k, v, causal=True, segment_ids=seg, impl=impl) * do)

    gp = jax.grad(loss("pallas"), (0, 1, 2))(q, k, v)
    gx = jax.grad(loss("xla"), (0, 1, 2))(q, k, v)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4, rtol=1e-4)


def test_segment_composes_with_window_dropout_quant(rng):
    """segments + window, segments + dropout and segments + int8-KV all run
    and stay finite; the no-extras case is the parity anchor above."""
    B, H, L, d = 1, 2, 128, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    seg = random_segments(rng, B, L)
    for kwargs in ({"window": 32}, {"dropout_rate": 0.2, "dropout_seed": 3},
                   {"kv_quant": "int8"}):
        out = flash_attention(q, k, v, causal=True, segment_ids=seg, **kwargs)
        assert bool(jnp.isfinite(out).all()), kwargs


def test_segment_ids_validation(rng):
    q = k = v = jnp.zeros((1, 1, 64, 32), jnp.float32)
    with pytest.raises(ValueError):
        flash_attention(q, k, v, causal=True,
                        segment_ids=jnp.zeros((1, 32), jnp.int32))  # bad L
    kshort = jnp.zeros((1, 1, 32, 32), jnp.float32)
    with pytest.raises(ValueError):
        flash_attention(q, kshort, kshort, causal=True,
                        segment_ids=jnp.zeros((1, 64), jnp.int32))


def _model(kind="flash"):
    cfg = nn.DecoderConfig(
        n_vocab=64, n_embd=64, n_head=4, n_positions=64, n_layer=2,
        p_dropout=0.0, attention_kind=kind)
    model = nn.DecoderLM(cfg)
    return model, model.init(jax.random.key(0))


@pytest.mark.parametrize("kind", ["flash", "naive"])
def test_model_packed_equals_unpacked(rng, kind):
    """Two examples packed into one row (segment ids + per-example
    positions) produce exactly the logits of the two separate forwards —
    on both the kernel and the dense attention paths."""
    model, params = _model(kind)
    a = jnp.asarray(rng.integers(0, 64, (1, 10)), jnp.int32)
    b = jnp.asarray(rng.integers(0, 64, (1, 14)), jnp.int32)
    la, lb = model(params, a), model(params, b)
    packed = jnp.concatenate([a, b], axis=1)
    seg = jnp.asarray([[0] * 10 + [1] * 14], jnp.int32)
    pos = jnp.asarray([list(range(10)) + list(range(14))], jnp.int32)
    lp = model(params, packed, segment_ids=seg, positions=pos)
    tol = dict(atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(lp[:, :10]), np.asarray(la), **tol)
    np.testing.assert_allclose(np.asarray(lp[:, 10:]), np.asarray(lb), **tol)


def test_model_packed_grads_flow(rng):
    model, params = _model()
    ids = jnp.asarray(rng.integers(0, 64, (2, 32)), jnp.int32)
    seg = random_segments(rng, 2, 32, 3)

    def loss(params):
        return jnp.mean(model(params, ids, segment_ids=seg) ** 2)

    val, grads = jax.value_and_grad(loss)(params)
    assert jnp.isfinite(val)
    assert all(bool(jnp.isfinite(g).all())
               for g in jax.tree_util.tree_leaves(grads))


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    data = mt.synthetic_translation_dataset(
        n_train=300, n_validation=30, n_test=20, n_words=50)
    tok = mt.get_tokenizer(
        data["train"], vocab_size=500, src_key="de", tgt_key="en",
        workdir=str(tmp_path_factory.mktemp("tok")))
    return data, tok


def test_collate_packed_semantics(small_corpus):
    data, tok = small_corpus
    L = 48
    examples = data["train"][:6]
    batch = mt.collate_packed(examples, "de", "en", tok, L)
    pad_id = tok.vocab["<pad>"]
    n, _ = batch["input_ids"].shape
    assert n < 6   # actually packed multiple examples per row
    # per-row invariants
    for r in range(n):
        ids = batch["input_ids"][r]
        seg = batch["segment_ids"][r]
        pos = batch["positions"][r]
        w = batch["label_token_weights"][r]
        lab = batch["labels"][r]
        assert (np.diff(seg) >= 0).all()          # segments are contiguous
        for sid in np.unique(seg):
            sl = np.where(seg == sid)[0]
            assert (pos[sl] == np.arange(len(sl))).all()  # per-seg positions
            # next-token labels stay inside the segment
            assert (lab[sl[:-1]] == ids[sl[1:]]).all()
            assert w[sl[-1]] == 0.0               # last position: no target
        # weighted positions predict real (non-pad) tokens
        assert (lab[w > 0] != pad_id).all()
    # packing round-trips every example (ids re-concatenated in order)
    flat = []
    for r in range(n):
        row_ids = batch["input_ids"][r]
        flat.extend(row_ids[row_ids != pad_id].tolist())
    orig = []
    for ex in examples:
        orig.extend(tok(f"{ex['de']}<eos_de>")["input_ids"])
        orig.extend(tok(f"{ex['en']}<eos_en>")["input_ids"])
    assert flat == orig[:len(flat)]


def test_collate_packed_fixed_rows(small_corpus):
    data, tok = small_corpus
    batch = mt.collate_packed(data["train"][:3], "de", "en", tok, 48,
                              fixed_rows=5)
    assert batch["input_ids"].shape == (5, 48)
    # padding rows carry zero loss weight
    assert batch["label_token_weights"][-1].sum() == 0.0


def test_packed_loss_matches_unpacked(small_corpus):
    """The packed masked-MLE SUM over examples equals the sum of unpacked
    per-example losses (collate_batch with mask_padding=True minus its
    meaningless final-eos-predicts-pad term)."""
    data, tok = small_corpus
    L = 48
    examples = data["train"][:4]
    model, params = _model()
    # re-map token ids into the tiny test vocab
    def clamp(x):
        return np.asarray(x) % 64

    packed = mt.collate_packed(examples, "de", "en", tok, L)
    logits = model(params, jnp.asarray(clamp(packed["input_ids"])),
                   segment_ids=jnp.asarray(packed["segment_ids"]),
                   positions=jnp.asarray(packed["positions"]))
    losses = nn.functional.softmax_loss(
        logits, jnp.asarray(clamp(packed["labels"])))
    packed_sum = float(jnp.sum(losses * packed["label_token_weights"]))

    unpacked_sum = 0.0
    for ex in examples:
        b = mt.collate_batch([ex], "de", "en", tok, L, mask_padding=True)
        w = b["label_token_weights"][0].copy()
        n_real = int((b["input_ids"][0] != tok.vocab["<pad>"]).sum())
        w[n_real - 1] = 0.0     # drop the final eos->pad term (see collate)
        lg = model(params, jnp.asarray(clamp(b["input_ids"])),
                   positions=jnp.arange(L, dtype=jnp.int32)[None, :])
        ls = nn.functional.softmax_loss(lg, jnp.asarray(clamp(b["labels"])))
        unpacked_sum += float(jnp.sum(ls * w))
    np.testing.assert_allclose(packed_sum, unpacked_sum, rtol=1e-4)


def test_segment_attention_under_parallel_context(rng):
    """segment_ids shard over the data axis inside the shard_map attention
    path; sharded == unsharded."""
    from tpu_flash import parallel

    B, H, L, d = 4, 4, 128, 32
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, L, d)), jnp.float32)
               for _ in range(3))
    seg = random_segments(rng, B, L)
    ref = flash_attention(q, k, v, causal=True, segment_ids=seg)
    ctx = parallel.make_mesh(data=2, model=2, devices=jax.devices()[:4])
    try:
        parallel.set_parallel_context(ctx)
        out = flash_attention(q, k, v, causal=True, segment_ids=seg)
    finally:
        parallel.set_parallel_context(None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)
