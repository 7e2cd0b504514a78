"""ctypes bindings for the native (C++) batch packing / prefetch loader.

The shared library is built from ``tpu_flash/native/collate.cpp`` on first
use (g++, cached next to the source by content hash).  See the .cpp header
for the design; Python-side this exposes:

  * ``pack_batch(...)``       — synchronous native packing (collate fast path);
  * ``NativeBatchLoader``     — background worker-pool loader with a bounded
                                 ring buffer; iteration yields numpy batches
                                 ready for ``jnp.asarray``.

Falls back cleanly: callers should catch ``NativeUnavailable`` and use
``tpu_flash.data.mt.collate_batch`` (pure Python) if no C++ toolchain exists.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess

import numpy as np

_SRC = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "native", "collate.cpp")


class NativeUnavailable(RuntimeError):
    pass


_lib = None


def _build_and_load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SRC):
        raise NativeUnavailable(f"missing {_SRC}")
    with open(_SRC, "rb") as f:
        digest = hashlib.sha256(f.read()).hexdigest()[:16]
    so_path = os.path.join(os.path.dirname(_SRC), f"libcollate-{digest}.so")
    if not os.path.exists(so_path):
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC,
               "-o", so_path, "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True)
        except (subprocess.CalledProcessError, FileNotFoundError) as e:
            raise NativeUnavailable(f"build failed: {e}") from e
    lib = ctypes.CDLL(so_path)
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_int64, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_uint64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
    ]
    lib.loader_next.restype = ctypes.c_int32
    lib.loader_next.argtypes = [ctypes.c_void_p] + [ctypes.c_void_p] * 3
    lib.loader_next_packed.restype = ctypes.c_int32
    lib.loader_next_packed.argtypes = [ctypes.c_void_p] + \
        [ctypes.c_void_p] * 5
    lib.loader_dropped.restype = ctypes.c_int64
    lib.loader_dropped.argtypes = [ctypes.c_void_p]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.pack_batch.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
    ]
    lib.pack_batch_packed.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_void_p,
    ]
    _lib = lib
    return lib


def _flatten(token_lists):
    """list of int lists -> (flat int32, offsets int64)."""
    offsets = np.zeros(len(token_lists) + 1, np.int64)
    for i, t in enumerate(token_lists):
        offsets[i + 1] = offsets[i] + len(t)
    flat = np.empty(offsets[-1], np.int32)
    for i, t in enumerate(token_lists):
        flat[offsets[i]:offsets[i + 1]] = t
    return flat, offsets


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.c_void_p)


def tokenize_corpus(examples, src_key, tgt_key, tokenizer):
    """Pre-tokenize once: returns (src_flat, src_off, tgt_flat, tgt_off)."""
    src = [tokenizer(f"{ex[src_key]}<eos_{src_key}>")["input_ids"]
           for ex in examples]
    tgt = [tokenizer(f"{ex[tgt_key]}<eos_{tgt_key}>")["input_ids"]
           for ex in examples]
    return _flatten(src) + _flatten(tgt)


def pack_batch(src_flat, src_off, tgt_flat, tgt_off, indices, max_len,
               pad_id, mask_padding=False):
    """Native synchronous packing of the selected examples."""
    lib = _build_and_load()
    n = len(indices)
    indices = np.ascontiguousarray(indices, np.int64)
    ids = np.empty((n, max_len), np.int32)
    labels = np.empty((n, max_len), np.int32)
    weights = np.empty((n, max_len), np.float32)
    lib.pack_batch(_ptr(src_flat), _ptr(src_off), _ptr(tgt_flat),
                   _ptr(tgt_off), _ptr(indices), n, max_len, pad_id,
                   int(mask_padding), _ptr(ids), _ptr(labels), _ptr(weights))
    return {"input_ids": ids, "labels": labels,
            "label_token_weights": weights}


def pack_batch_packed(src_flat, src_off, tgt_flat, tgt_off, indices, max_len,
                      pad_id, fixed_rows):
    """Native synchronous sequence-packed collation (the C++ twin of
    ``mt.collate_packed(fixed_rows=)``; byte-identical output)."""
    lib = _build_and_load()
    n = len(indices)
    indices = np.ascontiguousarray(indices, np.int64)
    shape = (fixed_rows, max_len)
    ids = np.empty(shape, np.int32)
    labels = np.empty(shape, np.int32)
    weights = np.empty(shape, np.float32)
    seg = np.empty(shape, np.int32)
    pos = np.empty(shape, np.int32)
    lib.pack_batch_packed(
        _ptr(src_flat), _ptr(src_off), _ptr(tgt_flat), _ptr(tgt_off),
        _ptr(indices), n, max_len, pad_id, fixed_rows,
        _ptr(ids), _ptr(labels), _ptr(weights), _ptr(seg), _ptr(pos))
    return {"input_ids": ids, "labels": labels,
            "label_token_weights": weights, "segment_ids": seg,
            "positions": pos}


class NativeBatchLoader:
    """Background-thread packing loader; iterate for an endless stream of
    shuffled epoch batches."""

    def __init__(self, src_flat, src_off, tgt_flat, tgt_off, *, max_len,
                 pad_id, batch_size, mask_padding=False, seed=0,
                 n_threads=2, ring_capacity=8, packed=False, fixed_rows=0):
        self._lib = _build_and_load()
        self.batch_size = batch_size
        self.max_len = max_len
        self.packed = packed
        self.fixed_rows = fixed_rows
        if packed and fixed_rows < 1:
            raise ValueError("packed mode requires fixed_rows >= 1")
        # keep the arrays alive for the duration of loader_create's copy
        src_flat = np.ascontiguousarray(src_flat, np.int32)
        tgt_flat = np.ascontiguousarray(tgt_flat, np.int32)
        src_off = np.ascontiguousarray(src_off, np.int64)
        tgt_off = np.ascontiguousarray(tgt_off, np.int64)
        self._handle = self._lib.loader_create(
            _ptr(src_flat), _ptr(src_off), _ptr(tgt_flat), _ptr(tgt_off),
            len(src_off) - 1, max_len, pad_id, batch_size,
            int(mask_padding), seed, n_threads, ring_capacity,
            int(packed), fixed_rows)
        if not self._handle:
            raise NativeUnavailable("loader_create returned NULL")

    def next(self):
        if self.packed:
            shape = (self.fixed_rows, self.max_len)
            ids = np.empty(shape, np.int32)
            labels = np.empty(shape, np.int32)
            weights = np.empty(shape, np.float32)
            seg = np.empty(shape, np.int32)
            pos = np.empty(shape, np.int32)
            n = self._lib.loader_next_packed(
                self._handle, _ptr(ids), _ptr(labels), _ptr(weights),
                _ptr(seg), _ptr(pos))
            if n == 0:
                raise StopIteration
            return {"input_ids": ids, "labels": labels,
                    "label_token_weights": weights, "segment_ids": seg,
                    "positions": pos}
        ids = np.empty((self.batch_size, self.max_len), np.int32)
        labels = np.empty((self.batch_size, self.max_len), np.int32)
        weights = np.empty((self.batch_size, self.max_len), np.float32)
        n = self._lib.loader_next(self._handle, _ptr(ids), _ptr(labels),
                                  _ptr(weights))
        if n == 0:
            raise StopIteration
        return {"input_ids": ids, "labels": labels,
                "label_token_weights": weights}

    def __iter__(self):
        return self

    __next__ = next

    def dropped(self) -> int:
        """Packed mode: total examples dropped to batch overflow so far
        (size fixed_rows with margin to keep this near zero)."""
        if not self._handle:
            return 0
        return int(self._lib.loader_dropped(self._handle))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.loader_destroy(self._handle)
            self._handle = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
