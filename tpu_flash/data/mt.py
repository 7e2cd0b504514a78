"""Machine-translation data pipeline.

The analog of project/run_machine_translation.py:25-154 in the reference
(IWSLT'14 de-en via HF datasets, ByteLevelBPE tokenizer with
``<eos_de>/<eos_en>/<pad>`` specials, and src+eos+tgt+eos+pad packing with
next-token labels and source-masked label weights).

Differences by design:
  * ``get_dataset`` falls back to a deterministic synthetic translation task
    when the HF dataset is unavailable (this framework must train end-to-end
    in an offline environment).  The synthetic task is word-level
    translation with a bijective lexicon plus word-order reversal — a real
    seq2seq mapping, so loss and BLEU are meaningful.
  * ``collate_batch`` returns numpy arrays with a *static* ``model_max_length``
    shape, so the jitted train step compiles exactly once.
  * label weights can optionally also mask padding (the reference counts pad
    positions at weight 1 after the target, run_machine_translation.py:134-140
    — ``mask_padding=False`` reproduces that).
"""

from __future__ import annotations

import json
import os
from typing import Any

import numpy as np

SRC_KEY, TGT_KEY = "de", "en"


# ---------------------------------------------------------------------------
# Datasets
# ---------------------------------------------------------------------------

def _synthetic_lexicon(n_words: int, seed: int):
    """Bijective pseudo-word lexicon: src word i <-> tgt word perm[i]."""
    rng = np.random.default_rng(seed)
    syll_a = ["ka", "mo", "ri", "ze", "lu", "ta", "ven", "dor", "shi", "gal"]
    syll_b = ["na", "pel", "vi", "ruk", "so", "em", "ba", "tli", "our", "ke"]
    src_words, tgt_words = [], []
    for i in range(n_words):
        a, b, c = i % 10, (i // 10) % 10, i // 100
        src_words.append(f"{syll_a[a]}{syll_b[b]}{syll_a[c % 10]}")
        tgt_words.append(f"{syll_b[a]}{syll_a[b]}{syll_b[c % 10]}")
    perm = rng.permutation(n_words)
    return src_words, tgt_words, perm


def synthetic_translation_dataset(
    n_train: int = 20_000,
    n_validation: int = 1_000,
    n_test: int = 100,
    n_words: int = 400,
    min_len: int = 3,
    max_len: int = 12,
    seed: int = 0,
) -> dict[str, list[dict[str, str]]]:
    """Deterministic offline translation corpus.

    Target = lexicon-mapped source words in *reversed* order, so the model
    must learn both a vocabulary mapping and a reordering rule.
    """
    src_words, tgt_words, perm = _synthetic_lexicon(n_words, seed)
    rng = np.random.default_rng(seed + 1)

    def make(n, salt):
        local = np.random.default_rng(seed + 2 + salt)
        out = []
        for _ in range(n):
            ln = int(local.integers(min_len, max_len + 1))
            ids = local.integers(0, n_words, ln)
            src = " ".join(src_words[i] for i in ids)
            tgt = " ".join(tgt_words[perm[i]] for i in ids[::-1])
            out.append({SRC_KEY: src, TGT_KEY: tgt})
        return out

    return {
        "train": make(n_train, 0),
        "validation": make(n_validation, 1),
        "test": make(n_test, 2),
    }


def get_dataset(
    dataset_name: str = "bbaaaa/iwslt14-de-en",
    model_max_length: int = 40,
    synthetic: bool | None = None,
    **synthetic_kwargs,
):
    """Load the MT dataset, filtering pairs longer than ``model_max_length``
    words and truncating test to 100 examples — the reference's protocol
    (run_machine_translation.py:25-48).

    ``synthetic=None`` tries the HF dataset first and falls back to the
    synthetic task; True/False force one path.

    ``dataset_name="local"`` (or ``"deen"``) loads the checked-in REAL
    German-English corpus (data/deen_corpus.py) — no network needed, BLEU
    on real text.  ``"local-comp"`` uses its COMPOSITIONAL split instead
    (held-out subject x verb combinations — the quality-sensitive eval,
    deen_corpus.compositional_split).
    """
    if dataset_name in ("local", "deen", "local-deen", "local-comp"):
        from tpu_flash.data.deen_corpus import (
            compositional_split, load_dataset as _load_deen)

        dataset = (compositional_split() if dataset_name == "local-comp"
                   else _load_deen())
        dataset = {
            split: [ex for ex in dataset[split]
                    if len(ex[SRC_KEY].split()) + len(ex[TGT_KEY].split())
                    < model_max_length]
            for split in dataset
        }
        dataset["test"] = dataset["test"][:100]
        return dataset, SRC_KEY, TGT_KEY
    dataset = None
    if synthetic is not True:
        try:
            import datasets as hf_datasets

            dataset = {
                split: hf_datasets.load_dataset(dataset_name, split=split)[
                    "translation"]
                for split in ["train", "validation", "test"]
            }
        except Exception as e:  # offline / dataset missing
            if synthetic is False:
                raise
            dataset = None
    if dataset is None:
        dataset = synthetic_translation_dataset(**synthetic_kwargs)

    dataset = {
        split: [
            ex for ex in dataset[split]
            if len(ex[SRC_KEY].split()) + len(ex[TGT_KEY].split())
            < model_max_length
        ]
        for split in dataset
    }
    dataset["test"] = dataset["test"][:100]
    return dataset, SRC_KEY, TGT_KEY


# ---------------------------------------------------------------------------
# Tokenizer
# ---------------------------------------------------------------------------

def get_tokenizer(examples, vocab_size: int, src_key: str, tgt_key: str,
                  workdir: str):
    """Byte-level BPE trained on the corpus with eos/pad specials, persisted
    to ``workdir`` (run_machine_translation.py:51-84)."""
    from tokenizers import ByteLevelBPETokenizer

    os.makedirs(workdir, exist_ok=True)
    tokenizer = ByteLevelBPETokenizer()
    tokenizer.train_from_iterator(
        [[ex[src_key], ex[tgt_key]] for ex in examples],
        vocab_size=vocab_size,
        special_tokens=[f"<eos_{src_key}>", f"<eos_{tgt_key}>", "<pad>"],
    )
    tokenizer.save(f"{workdir}/tokenizer.json")
    json.dump({"model_type": "gpt2"}, open(f"{workdir}/config.json", "w"))

    from transformers import AutoTokenizer

    return AutoTokenizer.from_pretrained(
        workdir, eos_token=None, bos_token=None, pad_token=None,
        unk_token=None)


# ---------------------------------------------------------------------------
# Collation
# ---------------------------------------------------------------------------

def collate_batch(
    examples,
    src_key: str,
    tgt_key: str,
    tokenizer,
    model_max_length: int,
    mask_padding: bool = False,
) -> dict[str, np.ndarray]:
    """Pack ``src + <eos_src> + tgt + <eos_tgt> + pads`` to a fixed length
    with next-token labels and source-masked label weights
    (run_machine_translation.py:87-154).

    ``mask_padding=False`` reproduces the reference exactly (pad positions
    after the target keep weight 1); True additionally zeroes them — the
    correct MLE and the default for new training runs is False for parity.
    """
    pad_id = tokenizer.vocab["<pad>"]
    ids_out, labels_out, weights_out = [], [], []
    for ex in examples:
        ids_src = tokenizer(f"{ex[src_key]}<eos_{src_key}>")["input_ids"]
        ids_tgt = tokenizer(f"{ex[tgt_key]}<eos_{tgt_key}>")["input_ids"]
        token_ids = (ids_src + ids_tgt)[:model_max_length]
        n_real = len(token_ids)
        token_ids = token_ids + [pad_id] * (model_max_length - n_real)
        labels = token_ids[1:] + [pad_id]
        weights = [1] * model_max_length
        for i in range(min(model_max_length, len(ids_src) - 1)):
            weights[i] = 0
        if mask_padding:
            for i in range(n_real, model_max_length):
                weights[i] = 0
        ids_out.append(token_ids)
        labels_out.append(labels)
        weights_out.append(weights)
    return {
        "input_ids": np.asarray(ids_out, np.int32),
        "labels": np.asarray(labels_out, np.int32),
        "label_token_weights": np.asarray(weights_out, np.float32),
    }


def collate_packed(
    examples,
    src_key: str,
    tgt_key: str,
    tokenizer,
    row_length: int,
    max_rows: int | None = None,
    fixed_rows: int | None = None,
    drop_counter: list | None = None,
) -> dict[str, np.ndarray]:
    """Sequence-packed collation: greedily fills ``row_length``-token rows
    with whole ``src + <eos_src> + tgt + <eos_tgt>`` examples and emits
    ``segment_ids`` / ``positions`` so attention and position embeddings
    stay per-example (ops.flash_attention ``segment_ids``).

    TPU-first replacement for the reference's fixed-length padding collate
    (run_machine_translation.py:87-154): instead of padding every example to
    ``model_max_length`` (and spending FLOPs on pad tokens), multiple
    examples share a row and only the row tail is padded.  Label semantics
    per example match ``collate_batch(mask_padding=True)`` except the final
    (target-eos) position, which predicts nothing here and weighs 0 — the
    fixed-length collate gives it weight 1 predicting the first pad, a
    meaningless term this collate drops.  Labels never cross segment
    boundaries.

    Returns input_ids / labels / label_token_weights / segment_ids /
    positions, all ``[rows, row_length]``.  Examples longer than
    ``row_length`` are truncated to it (same as the reference's clamp).
    ``fixed_rows`` pads (with all-pad, zero-weight rows) or trims the batch
    to a static row count so one jitted train step serves every batch;
    examples in trimmed rows are DROPPED (appended to ``drop_counter`` when
    given so callers can report the rate — size ``fixed_rows`` with margin,
    e.g. the app's shuffled-probe max + 1, to keep it near zero).
    """
    pad_id = tokenizer.vocab["<pad>"]
    rows = []            # each: list of (ids, n_src) tuples
    cur, cur_len = [], 0
    for ex in examples:
        ids_src = tokenizer(f"{ex[src_key]}<eos_{src_key}>")["input_ids"]
        ids_tgt = tokenizer(f"{ex[tgt_key]}<eos_{tgt_key}>")["input_ids"]
        ids = (ids_src + ids_tgt)[:row_length]
        if cur_len + len(ids) > row_length:
            rows.append(cur)
            cur, cur_len = [], 0
            if max_rows is not None and len(rows) >= max_rows:
                break
        cur.append((ids, len(ids_src)))
        cur_len += len(ids)
    if cur and (max_rows is None or len(rows) < max_rows):
        rows.append(cur)
    if fixed_rows is not None:
        if drop_counter is not None:
            drop_counter.append(sum(len(r) for r in rows[fixed_rows:]))
        rows = rows[:fixed_rows]
        while len(rows) < fixed_rows:
            rows.append([])               # all-pad row, zero loss weight

    n = len(rows)
    input_ids = np.full((n, row_length), pad_id, np.int32)
    labels = np.full((n, row_length), pad_id, np.int32)
    weights = np.zeros((n, row_length), np.float32)
    # pads get their own segment id (one per row, after the real examples)
    segment_ids = np.zeros((n, row_length), np.int32)
    positions = np.zeros((n, row_length), np.int32)
    for r, row in enumerate(rows):
        off = 0
        for sid, (ids, n_src) in enumerate(row):
            ln = len(ids)
            input_ids[r, off:off + ln] = ids
            # next-token labels WITHIN the segment; the last token of each
            # example predicts pad (weight 0 there anyway unless it is the
            # target's eos predecessor — handled by the shift below).
            labels[r, off:off + ln - 1] = ids[1:]
            weights[r, off:off + ln] = 1.0
            weights[r, off:off + min(ln, n_src - 1)] = 0.0
            weights[r, off + ln - 1] = 0.0   # last position predicts nothing
            segment_ids[r, off:off + ln] = sid
            positions[r, off:off + ln] = np.arange(ln)
            off += ln
        segment_ids[r, off:] = len(row)      # pad-tail segment
        positions[r, off:] = np.arange(row_length - off)
    return {
        "input_ids": input_ids,
        "labels": labels,
        "label_token_weights": weights,
        "segment_ids": segment_ids,
        "positions": positions,
    }
