"""MT data pipeline tests: synthetic dataset determinism, tokenizer specials,
and the packing/masking semantics of collate_batch
(the reference's protocol, run_machine_translation.py:87-154)."""

import numpy as np
import pytest

from tpu_flash.data import mt


@pytest.fixture(scope="module")
def small_corpus(tmp_path_factory):
    data = mt.synthetic_translation_dataset(
        n_train=300, n_validation=30, n_test=20, n_words=50)
    tok = mt.get_tokenizer(
        data["train"], vocab_size=500, src_key="de", tgt_key="en",
        workdir=str(tmp_path_factory.mktemp("tok")))
    return data, tok


def test_synthetic_dataset_deterministic():
    a = mt.synthetic_translation_dataset(n_train=10, n_validation=2, n_test=2)
    b = mt.synthetic_translation_dataset(n_train=10, n_validation=2, n_test=2)
    assert a == b
    # bijective word-level translation: same number of words
    for ex in a["train"]:
        assert len(ex["de"].split()) == len(ex["en"].split())


def test_get_dataset_filters_and_caps():
    data, src, tgt = mt.get_dataset(model_max_length=12, synthetic=True,
                                    n_train=500, n_test=300)
    assert src == "de" and tgt == "en"
    assert len(data["test"]) <= 100  # reference caps test at 100
    for ex in data["train"]:
        assert len(ex[src].split()) + len(ex[tgt].split()) < 12


def test_tokenizer_specials(small_corpus):
    _, tok = small_corpus
    for special in ["<eos_de>", "<eos_en>", "<pad>"]:
        assert special in tok.vocab
    # specials encode to single ids
    assert len(tok("<eos_de>")["input_ids"]) == 1


def test_collate_batch_packing(small_corpus):
    data, tok = small_corpus
    L = 32
    batch = mt.collate_batch(data["train"][:4], "de", "en", tok, L)
    assert batch["input_ids"].shape == (4, L)
    assert batch["labels"].shape == (4, L)
    assert batch["label_token_weights"].shape == (4, L)

    pad = tok.vocab["<pad>"]
    eos_de = tok.vocab["<eos_de>"]
    for i, ex in enumerate(data["train"][:4]):
        ids_src = tok(f'{ex["de"]}<eos_de>')["input_ids"]
        ids_tgt = tok(f'{ex["en"]}<eos_en>')["input_ids"]
        real = (ids_src + ids_tgt)[:L]
        row = batch["input_ids"][i]
        assert list(row[:len(real)]) == real
        assert all(t == pad for t in row[len(real):])
        # labels are next tokens
        assert list(batch["labels"][i][:len(real) - 1]) == real[1:]
        # weights: zero on the source prefix (up to eos_de inclusive-1)
        w = batch["label_token_weights"][i]
        n_src = len(ids_src)
        assert np.all(w[:n_src - 1] == 0)
        assert np.all(w[n_src - 1:] == 1)   # reference keeps pads at weight 1


def test_collate_mask_padding(small_corpus):
    data, tok = small_corpus
    L = 32
    batch = mt.collate_batch(data["train"][:2], "de", "en", tok, L,
                             mask_padding=True)
    pad = tok.vocab["<pad>"]
    for i in range(2):
        row = batch["input_ids"][i]
        n_real = int(np.sum(row != pad))
        if n_real < L:
            assert np.all(batch["label_token_weights"][i][n_real:] == 0)


def test_mt_cli_end_to_end_with_checkpoint(tmp_path):
    """The full CLI main() on CPU: synthetic data, one tiny epoch,
    checkpoint save + resume restore (would have caught the
    save_checkpoint scope regression)."""
    from tpu_flash.apps import machine_translation as app

    args = ["--synthetic", "--n-epochs", "1", "--max-iters-per-epoch", "2",
            "--samples-per-epoch", "64", "--batch-size", "8",
            "--model-max-length", "16", "--n-vocab", "300",
            "--n-embd", "32", "--n-head", "2", "--n-layer", "1",
            "--checkpoint-every", "1", "--skip-bleu",
            "--workdir", str(tmp_path)]
    app.main(args)
    ckpts = list((tmp_path / "checkpoints").iterdir())
    assert ckpts, "no checkpoint written"
    assert (tmp_path / "metrics.jsonl").exists()
    # resume path restores and runs (same epoch count -> restores, no-op loop)
    app.main(args + ["--resume"])


def test_accum_steps_matches_full_batch_step():
    """make_train_step(accum_steps=A) must produce the same loss and params
    as the plain full-batch step (same semantics, 1/A activation memory)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from tpu_flash import nn
    from tpu_flash.apps.machine_translation import make_train_step

    cfg = nn.DecoderConfig(n_vocab=64, n_embd=32, n_head=4, n_positions=16,
                           n_layer=1, p_dropout=0.0, attention_kind="naive")
    model = nn.DecoderLM(cfg)
    params = model.init(jax.random.key(0))
    opt = nn.adam(lr=1e-2)
    opt_state = opt.init(params)

    rng = np.random.default_rng(0)
    batch = {
        "input_ids": jnp.asarray(rng.integers(0, 64, (8, 16)), jnp.int32),
        "labels": jnp.asarray(rng.integers(0, 64, (8, 16)), jnp.int32),
        "label_token_weights": jnp.asarray(rng.random((8, 16)), jnp.float32),
        "loss_norm": jnp.float32(8 * 16),
    }
    key = jax.random.key(1)
    full = make_train_step(model, opt, chunked_vocab=2)
    acc = make_train_step(model, opt, chunked_vocab=2, accum_steps=4)
    p1, _, l1 = full(params, opt_state, batch, key)
    p2, _, l2 = acc(params, opt_state, batch, key)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        # microbatch grad sums reassociate fp adds vs the one-batch grad
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_local_deen_corpus():
    """The checked-in real de-en corpus loads, splits cleanly, and carries
    genuinely parallel text (German source, English target)."""
    from tpu_flash.data import mt
    from tpu_flash.data.deen_corpus import load_dataset

    ds = load_dataset()
    assert len(ds["train"]) > 2000
    assert len(ds["validation"]) > 100 and len(ds["test"]) > 100
    # disjoint splits
    tr = {e["de"] for e in ds["train"]}
    assert not tr & {e["de"] for e in ds["test"]}
    # via the standard loader, with the reference's length filter applied
    data, src, tgt = mt.get_dataset("local", 40)
    assert src == "de" and tgt == "en"
    assert len(data["test"]) == 100
    sample = data["train"][0]
    assert sample["de"] != sample["en"]
    assert sample["de"].strip() and sample["en"].strip()


def test_compositional_split_holds_out_combinations():
    """The quality-sensitive split (VERDICT r4 #5): every val/test pair
    instantiates a (subject x verb [x place/object]) combination key that
    NEVER occurs in training — zero leakage — while the lexical items
    themselves all still occur in training in other combinations."""
    from tpu_flash.data import mt
    from tpu_flash.data.deen_corpus import (
        build_pairs_keyed, compositional_split)

    keyed = build_pairs_keyed()
    key_of = {(d, e): k for d, e, k in keyed}
    ds = compositional_split()
    assert len(ds["train"]) > 2000
    assert len(ds["validation"]) >= 250 and len(ds["test"]) >= 200
    train_keys = {key_of[(ex["de"], ex["en"])] for ex in ds["train"]}
    eval_keys = {key_of[(ex["de"], ex["en"])]
                 for ex in ds["validation"] + ds["test"]}
    assert None not in eval_keys        # hand pairs stay in train
    assert not train_keys & eval_keys   # combination-level holdout
    # lexical coverage: eval vocabulary is (almost entirely) seen in train
    train_vocab = {w for ex in ds["train"]
                   for w in (ex["de"] + " " + ex["en"]).lower().split()}
    eval_vocab = {w for ex in ds["validation"] + ds["test"]
                  for w in (ex["de"] + " " + ex["en"]).lower().split()}
    unseen = eval_vocab - train_vocab
    assert len(unseen) / len(eval_vocab) < 0.02, sorted(unseen)[:20]
    # deterministic and reachable through the standard loader
    ds2 = compositional_split()
    assert ds["validation"][0] == ds2["validation"][0]
    data, _, _ = mt.get_dataset("local-comp", 40)
    assert len(data["test"]) == 100     # reference protocol cap
