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
