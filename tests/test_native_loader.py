"""Native (C++) packing loader: parity with the Python collate_batch and
background-prefetch behavior."""

import numpy as np
import pytest

from tpu_flash.data import mt

native = pytest.importorskip("tpu_flash.data.native_loader")


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    data = mt.synthetic_translation_dataset(
        n_train=200, n_validation=10, n_test=10, n_words=40)
    tok = mt.get_tokenizer(
        data["train"], vocab_size=400, src_key="de", tgt_key="en",
        workdir=str(tmp_path_factory.mktemp("tok_native")))
    return data["train"], tok


def test_pack_batch_matches_python_collate(corpus):
    examples, tok = corpus
    try:
        flats = native.tokenize_corpus(examples, "de", "en", tok)
    except native.NativeUnavailable as e:
        pytest.skip(str(e))
    src_flat, src_off, tgt_flat, tgt_off = flats
    L = 32
    idx = np.asarray([0, 3, 17, 5], np.int64)
    got = native.pack_batch(src_flat, src_off, tgt_flat, tgt_off, idx, L,
                            tok.vocab["<pad>"])
    exp = mt.collate_batch([examples[i] for i in idx], "de", "en", tok, L)
    np.testing.assert_array_equal(got["input_ids"], exp["input_ids"])
    np.testing.assert_array_equal(got["labels"], exp["labels"])
    np.testing.assert_array_equal(got["label_token_weights"],
                                  exp["label_token_weights"])


def test_background_loader_streams_batches(corpus):
    examples, tok = corpus
    try:
        src_flat, src_off, tgt_flat, tgt_off = native.tokenize_corpus(
            examples, "de", "en", tok)
        loader = native.NativeBatchLoader(
            src_flat, src_off, tgt_flat, tgt_off, max_len=32,
            pad_id=tok.vocab["<pad>"], batch_size=8, seed=1, n_threads=2)
    except native.NativeUnavailable as e:
        pytest.skip(str(e))
    seen = set()
    for _ in range(30):   # > one epoch (200/8 = 25 batches)
        b = loader.next()
        assert b["input_ids"].shape == (8, 32)
        assert b["labels"].shape == (8, 32)
        # labels are shifted input_ids
        np.testing.assert_array_equal(b["labels"][:, :-1],
                                      b["input_ids"][:, 1:])
        seen.add(b["input_ids"].tobytes())
    assert len(seen) > 20   # shuffled, not repeating one batch
    loader.close()


def test_native_packed_matches_python_collate(corpus):
    """pack_batch_packed (C++) is byte-identical to mt.collate_packed
    (Python) on the same example indices."""
    examples, tok = corpus
    examples = examples[:12]
    try:
        flats = native.tokenize_corpus(examples, "de", "en", tok)
    except native.NativeUnavailable as e:
        pytest.skip(str(e))
    L = 48
    py = mt.collate_packed(examples, "de", "en", tok, L, fixed_rows=6)
    nat = native.pack_batch_packed(
        *flats, indices=np.arange(len(examples), dtype=np.int64),
        max_len=L, pad_id=tok.vocab["<pad>"], fixed_rows=6)
    for key in py:
        np.testing.assert_array_equal(nat[key], py[key], err_msg=key)


def test_native_packed_loader_stream(corpus):
    """Threaded packed loader emits well-formed fixed-shape batches."""
    examples, tok = corpus
    try:
        flats = native.tokenize_corpus(examples[:64], "de", "en", tok)
    except native.NativeUnavailable as e:
        pytest.skip(str(e))
    loader = native.NativeBatchLoader(
        *flats, max_len=48, pad_id=tok.vocab["<pad>"], batch_size=16,
        seed=0, n_threads=2, packed=True, fixed_rows=8)
    try:
        for _ in range(4):
            b = loader.next()
            assert b["input_ids"].shape == (8, 48)
            assert set(b) == {"input_ids", "labels", "label_token_weights",
                              "segment_ids", "positions"}
            for r in range(8):
                seg = b["segment_ids"][r]
                assert (np.diff(seg) >= 0).all()
                w = b["label_token_weights"][r]
                pad = b["input_ids"][r] == tok.vocab["<pad>"]
                # loss never lands on a pad prediction target
                assert (b["labels"][r][w > 0] != tok.vocab["<pad>"]).all()
                assert (w[pad] == 0).all()
    finally:
        loader.close()
