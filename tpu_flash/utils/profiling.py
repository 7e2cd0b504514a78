"""Profiling, tracing and numerics-debugging helpers.

Replaces the reference's ad-hoc instrumentation (SURVEY.md §5.1-5.2):
compile-time ``#ifdef TIME`` clock printf inside CUDA kernels, per-phase
wall timers in the train loop, and post-hoc ``gpuErrchk`` — with the
TPU-native equivalents:

  * ``trace(...)``        — jax.profiler device traces (open in XProf /
                             TensorBoard: per-kernel timelines, HBM usage,
                             roofline counters);
  * ``annotate(name)``    — names a region inside a trace
                             (jax.profiler.TraceAnnotation);
  * ``PhaseTimer``        — train-loop phase accounting (fwd/bwd/opt) with a
                             host-readback sync, matching the reference's
                             per-phase timers (run_machine_translation.py:196-220)
                             but correct under async dispatch;
  * ``checked(fn)``       — jax.experimental.checkify wrapper that turns
                             silent NaN/Inf/OOB into actionable errors (the
                             role CHECK_NAN_INF never played in the
                             reference, src/includes/cuda_util.h:41-46).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Callable

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (shows up on the timeline)."""
    return jax.profiler.TraceAnnotation(name)


def _sync(x) -> None:
    """Force completion via a scalar host readback (block_until_ready is not
    reliable over tunneled PJRT transports — see utils/timing.py)."""
    leaves = [l for l in jax.tree_util.tree_leaves(x)
              if hasattr(l, "dtype")]
    if leaves:
        float(jnp.sum(leaves[0].astype(jnp.float32)).real)


class PhaseTimer:
    """Accumulates wall time per named phase.

    with timer.phase("forward", out=loss): ...
    The phase exits only after `out` is synced, so the measurement covers
    device execution, not dispatch.
    """

    def __init__(self):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str, out=None):
        t0 = time.perf_counter()
        yield
        if out is not None:
            _sync(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def measure(self, name: str, fn: Callable, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        _sync(out)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1
        return out

    def summary(self) -> dict[str, float]:
        return {k: self.totals[k] / max(1, self.counts[k])
                for k in self.totals}

    def report(self) -> str:
        parts = [f"{k}: {v * 1e3:.2f} ms/call" for k, v in
                 sorted(self.summary().items())]
        return ", ".join(parts)


def checked(fn: Callable, *, jit: bool = True) -> Callable:
    """Wrap fn with checkify NaN/Inf/div/OOB checks; the wrapper raises with
    the original source location when a check trips."""
    from jax.experimental import checkify

    errors = checkify.float_checks | checkify.index_checks | checkify.div_checks
    cf = checkify.checkify(fn, errors=errors)
    if jit:
        cf = jax.jit(cf)

    def wrapper(*args, **kwargs):
        err, out = cf(*args, **kwargs)
        checkify.check_error(err)
        return out

    return wrapper
