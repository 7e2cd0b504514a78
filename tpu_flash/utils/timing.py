"""Benchmark timing harness.

The TPU analog of the reference's measurement protocol (test_utils.py:190-217:
warmup run, ``nrepeat`` runs bracketed by device synchronization, mean
wall-clock ms, speedup = baseline/custom).  Two differences forced by XLA's
async dispatch model:

  * every timed run is data-dependent on the previous one (a zero-valued
    function of the prior output is folded into the next input), so the device
    cannot overlap or elide back-to-back executions — the failure mode of
    naive ``for: f(x)`` loops under async dispatch;
  * the repeat loop runs *inside* one jit as a ``lax.scan``, so per-call
    host→device dispatch latency (large over a tunneled link) is excluded
    from the measurement.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp


@dataclass
class BenchResult:
    name: str
    mean_ms: float
    iters: int
    flops: float | None = None

    @property
    def tflops(self) -> float | None:
        if self.flops is None:
            return None
        return self.flops / (self.mean_ms * 1e-3) / 1e12

    def __str__(self) -> str:
        s = f"{self.name}: {self.mean_ms:.3f} ms"
        if self.flops is not None:
            s += f"  ({self.tflops:.1f} TFLOP/s)"
        return s


def _chain(args: tuple, out: Any) -> tuple:
    """Fold a runtime near-zero that depends on `out` into the first float
    leaf of the args pytree, creating a serializing data dependency between
    iterations.

    The perturbation is ``sum(out) * 1e-30`` — numerically a no-op after
    rounding, but a *runtime* value, so XLA cannot algebraically fold it away
    and dead-code the loop body (which it happily does for a literal
    ``0.0 * sum(out)``).

    The perturbed leaf is the first float leaf in flattening order — the same
    leaf ``_first_float_leaf`` finds — so the final host readback always
    depends on every iteration (perturbing a *different* leaf than the one
    read back lets XLA dead-code the whole loop, e.g. for (params_dict, x)
    argument tuples)."""
    # Fold in EVERY float output leaf: chaining only one of several outputs
    # lets XLA dead-code whole sibling computations (e.g. returning just dq
    # from a (dq, dk, dv) backward silently removed the dK/dV kernel from
    # the measurement).
    eps = jnp.array(0.0, jnp.float32)
    for leaf in jax.tree_util.tree_leaves(out):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            eps = eps + jnp.sum(leaf.astype(jnp.float32)) * 1e-30
    flat, treedef = jax.tree_util.tree_flatten(args)
    for i, a in enumerate(flat):
        if (hasattr(a, "dtype")
                and jnp.issubdtype(a.dtype, jnp.floating)):
            flat[i] = a + eps.astype(a.dtype)
            break
    return jax.tree_util.tree_unflatten(treedef, flat)


def _first_float_leaf(tree):
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            return leaf
    return None


def _total_time(f: Callable, args: tuple, iters: int, repeats: int) -> float:
    """Wall time of `iters` chained executions of f inside one jit, synced by
    a scalar host readback (block_until_ready does not reliably block over
    tunneled/async PJRT transports)."""

    @jax.jit
    def loop(args):
        def body(carry_args, _):
            out = f(*carry_args)
            return _chain(carry_args, out), 0
        final_args, _ = jax.lax.scan(body, args, None, length=iters)
        leaf = _first_float_leaf(final_args)
        return jnp.sum(leaf.astype(jnp.float32))

    float(loop(args))  # warmup incl. compile
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop(args))
        best = min(best, time.perf_counter() - t0)
    return best


_OVERHEAD: float | None = None


def _dispatch_overhead() -> float:
    """Fixed cost of one jit dispatch + scalar readback (measured once per
    process; ~tens of ms over a tunneled PJRT link, ~100us local)."""
    global _OVERHEAD
    if _OVERHEAD is None:
        noop = jax.jit(lambda x: x + 1.0)
        x = jnp.float32(0.0)
        float(noop(x))  # compile
        best = float("inf")
        for _ in range(5):
            t0 = time.perf_counter()
            float(noop(x))
            best = min(best, time.perf_counter() - t0)
        _OVERHEAD = best
    return _OVERHEAD


def benchmark(
    f: Callable,
    *args,
    iters: int | None = None,
    warmup: int = 2,       # kept for API compat; _total_time always warms up
    name: str = "fn",
    flops: float | None = None,
    repeats: int = 3,
    target_ms: float = 150.0,
    max_iters: int = 16384,
) -> BenchResult:
    """Time `f(*args)` by *marginal* cost: run chained loops of iters/4 and
    iters iterations and divide the time difference — this cancels the fixed
    per-call dispatch/readback overhead (tens of ms over a tunneled link).

    ``iters=None`` (default) auto-calibrates: a probe loop estimates the
    per-iteration cost, then the iteration count is chosen so the marginal
    signal is ~``target_ms`` — per-call wall noise over the tunnel is
    +-5-10 ms, so differencing anything much smaller returns garbage
    (including negative times)."""
    args = tuple(args)
    if iters is None:
        # The lo loop doubles as the calibration probe (remote compiles over
        # the tunnel cost ~40 s each, so only two loop lengths are compiled).
        # The fixed dispatch+readback overhead (~tens of ms tunneled) must be
        # subtracted or tiny ops look huge and get far too few iterations.
        lo = 16
        t_lo = _total_time(f, args, lo, repeats)
        per_est = max((t_lo - _dispatch_overhead()) / lo, 1e-7)
        iters = int(min(max_iters,
                        max(4 * lo, (target_ms * 1e-3) / per_est)))
    else:
        lo = max(1, iters // 4)
        t_lo = _total_time(f, args, lo, repeats)
    t_hi = _total_time(f, args, iters, repeats)
    per_iter = max((t_hi - t_lo) / (iters - lo), 1e-9)
    return BenchResult(name=name, mean_ms=per_iter * 1e3, iters=iters,
                       flops=flops)


def compare(
    custom: Callable,
    baseline: Callable,
    *args,
    iters: int = 50,
    flops: float | None = None,
    names: Sequence[str] = ("custom", "baseline"),
):
    """Benchmark two implementations on the same inputs; returns
    (custom_result, baseline_result, speedup) — the analog of the reference
    harness's speedup printout (test_utils.py:214-217)."""
    rc = benchmark(custom, *args, iters=iters, name=names[0], flops=flops)
    rb = benchmark(baseline, *args, iters=iters, name=names[1], flops=flops)
    return rc, rb, rb.mean_ms / rc.mean_ms


def attention_flops(B: int, H: int, L: int, d: int, *, causal: bool,
                    fwd_and_bwd: bool = False) -> float:
    """Matmul FLOPs of one attention call: 2 GEMMs forward (QK^T and PV),
    5 total in backward; causal halves the work."""
    per_gemm = 2.0 * B * H * L * L * d
    n_gemm = 2 + (5 if fwd_and_bwd else 0)
    total = per_gemm * n_gemm
    return total * 0.5 if causal else total
