"""Optimizers as pure pytree transforms — the analog of minitorch/optim.py.

Optax-style ``(init, update)`` pairs: state is an explicit pytree so an
optimizer step is a pure function that jits/shards like everything else (the
reference mutates Parameter objects in Python per-tensor, optim.py:50-79 —
~6 device round-trips per parameter per step; here the entire update is one
fused XLA program).

``adam`` implements the textbook rule with the step-size form the reference
uses (``lr * sqrt(1-b2^t)/(1-b1^t)``).  ``minitorch_compat=True`` reproduces
the reference's second-moment accumulation exactly — including its bug of
using ``(1 - beta1)`` as the coefficient on ``grad**2`` (optim.py:68) — for
bit-for-bit loss-curve matching against the reference implementation.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class Transform(NamedTuple):
    init: Callable[[Any], Any]
    update: Callable[[Any, Any, Any], tuple[Any, Any]]
    # update(grads, state, params) -> (new_params, new_state)


def sgd(lr: float = 0.01) -> Transform:
    """Plain SGD (optim.py:140-151)."""

    def init(params):
        return ()

    def update(grads, state, params):
        new_params = jax.tree_util.tree_map(
            lambda p, g: (p - lr * g).astype(p.dtype), params, grads)
        return new_params, state

    return Transform(init, update)


class AdamState(NamedTuple):
    step: jax.Array
    exp_avg: Any
    exp_avg_sq: Any


def adam(
    lr: float = 1e-3,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    minitorch_compat: bool = False,
) -> Transform:
    """Adam (optim.py:33-79).  ``denom = sqrt(v) + eps``;
    ``step_size = lr * sqrt(1 - b2^t) / (1 - b1^t)``."""

    sq_coeff = (1.0 - beta1) if minitorch_compat else (1.0 - beta2)

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(jnp.zeros((), jnp.int32), zeros,
                         jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        step = state.step + 1
        # moments keep their own dtype: fp32 grads (e.g. from
        # accumulate_gradients) must not promote a bf16 state tree
        exp_avg = jax.tree_util.tree_map(
            lambda m, g: (beta1 * m + (1.0 - beta1) * g).astype(m.dtype),
            state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: (beta2 * v + sq_coeff * jnp.square(g))
            .astype(v.dtype),
            state.exp_avg_sq, grads)
        bc1 = 1.0 - beta1 ** step.astype(jnp.float32)
        bc2 = 1.0 - beta2 ** step.astype(jnp.float32)
        step_size = lr * jnp.sqrt(bc2) / bc1
        # .astype(p.dtype): step_size is a traced fp32 scalar, so without
        # the cast the subtraction would silently promote bf16 params to
        # fp32 after the first step (dtype instability + a retrace).
        new_params = jax.tree_util.tree_map(
            lambda p, m, v: (p - step_size * m / (jnp.sqrt(v) + eps))
            .astype(p.dtype),
            params, exp_avg, exp_avg_sq)
        return new_params, AdamState(step, exp_avg, exp_avg_sq)

    return Transform(init, update)


def clip_by_global_norm(grads, max_norm: float):
    """Global-norm gradient clipping (not in the reference; standard for LM
    training stability)."""
    leaves = jax.tree_util.tree_leaves(grads)
    norm = jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32)))
                        for g in leaves))
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale.astype(g.dtype), grads), norm


def adamw(
    lr: float | Callable[[jax.Array], jax.Array] = 1e-3,
    beta1: float = 0.9,
    beta2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
) -> Transform:
    """AdamW: decoupled weight decay (decay applied to the parameters, not
    the gradients) — the standard LM-training optimizer; not in the
    reference.  ``lr`` may be a schedule fn ``step -> learning rate``."""

    def init(params):
        zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
        return AdamState(jnp.zeros((), jnp.int32), zeros,
                         jax.tree_util.tree_map(jnp.zeros_like, params))

    def update(grads, state, params):
        step = state.step + 1
        lr_t = lr(step) if callable(lr) else lr
        exp_avg = jax.tree_util.tree_map(
            lambda m, g: (beta1 * m + (1.0 - beta1) * g).astype(m.dtype),
            state.exp_avg, grads)
        exp_avg_sq = jax.tree_util.tree_map(
            lambda v, g: (beta2 * v + (1.0 - beta2) * jnp.square(g))
            .astype(v.dtype),
            state.exp_avg_sq, grads)
        bc1 = 1.0 - beta1 ** step.astype(jnp.float32)
        bc2 = 1.0 - beta2 ** step.astype(jnp.float32)
        step_size = lr_t * jnp.sqrt(bc2) / bc1
        new_params = jax.tree_util.tree_map(
            lambda p, m, v: (p - step_size * m / (jnp.sqrt(v) + eps)
                             - lr_t * weight_decay * p).astype(p.dtype),
            params, exp_avg, exp_avg_sq)
        return new_params, AdamState(step, exp_avg, exp_avg_sq)

    return Transform(init, update)


def cosine_schedule(peak_lr: float, warmup_steps: int, total_steps: int,
                    min_lr: float = 0.0):
    """Linear warmup to ``peak_lr`` then cosine decay to ``min_lr``."""

    def lr(step):
        step = step.astype(jnp.float32)
        warm = peak_lr * step / max(1, warmup_steps)
        progress = jnp.clip(
            (step - warmup_steps) / max(1, total_steps - warmup_steps),
            0.0, 1.0)
        cos = min_lr + 0.5 * (peak_lr - min_lr) * (
            1.0 + jnp.cos(jnp.pi * progress))
        return jnp.where(step < warmup_steps, warm, cos)

    return lr


def accumulate_gradients(loss_fn, accum_steps: int):
    """Gradient accumulation: returns ``(params, batch, *args) -> (loss,
    grads)`` where ``batch`` leaves carry a leading microbatch axis of size
    ``accum_steps`` and gradients/losses are averaged over it via
    ``lax.scan`` (activation memory of one microbatch, not the full batch).
    Not in the reference; standard for large-batch LM training."""

    def compute(params, batch, *args):
        def body(carry, micro):
            loss, grads = jax.value_and_grad(loss_fn)(params, micro, *args)
            acc_loss, acc_grads = carry
            # accumulate in fp32: summing A bf16 microbatch grads in bf16
            # loses low bits exactly where accumulation matters
            acc_grads = jax.tree_util.tree_map(
                lambda a, g: a + g.astype(jnp.float32), acc_grads, grads)
            return (acc_loss + loss, acc_grads), None

        zero_grads = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), params)
        (loss_sum, grad_sum), _ = jax.lax.scan(
            body, (jnp.zeros((), jnp.float32), zero_grads), batch)
        inv = 1.0 / accum_steps
        # grads stay fp32 (the optimizers are param-dtype-stable regardless
        # of grad dtype, and mixed_precision consumes fp32 directly — a
        # bf16 down-cast here would throw away the accumulation)
        return loss_sum * inv, jax.tree_util.tree_map(
            lambda g: g * inv, grad_sum)

    return compute


class MixedPrecisionState(NamedTuple):
    inner: Any
    master: Any             # fp32 master copy of every parameter


def mixed_precision(tx: Transform) -> Transform:
    """Mixed-precision training: fp32 master weights inside the optimizer
    state, while the model's own parameters stay in their compute dtype
    (bf16 on TPU).

    Not in the reference (it is fp32-only, minitorch/optim.py); this is the
    standard TPU recipe: matmuls run in bf16 on the MXU at 2x the fp32
    rate, but naively keeping *parameters* in bf16 makes Adam accumulate
    moments and apply ~1e-3-relative updates in a 8-bit-mantissa format —
    small updates round to zero and loss curves diverge from fp32.  Here
    ``update`` casts the incoming (bf16) grads up, steps the inner
    transform on the fp32 masters, and re-casts the result down, so the
    training trajectory matches fp32 Adam to within one rounding of the
    weights per step.  bf16 shares fp32's exponent range, so no loss
    scaling is needed (unlike fp16).

    Composes with the rest of the stack: ``skip_nonfinite(mixed_precision(
    adamw(...)))`` works, and under ZeRO-1 the ``master/<param path>``
    state leaves are path-suffix-matched by ``parallel.zero.state_shardings``
    and sharded over the data axis — masters then cost ``4/data_size``
    bytes per weight instead of 4.
    """

    def init(params):
        master = jax.tree_util.tree_map(
            lambda p: p.astype(jnp.float32), params)
        return MixedPrecisionState(tx.init(master), master)

    def update(grads, state, params):
        grads32 = jax.tree_util.tree_map(
            lambda g: g.astype(jnp.float32), grads)
        new_master, new_inner = tx.update(grads32, state.inner, state.master)
        new_params = jax.tree_util.tree_map(
            lambda m, p: m.astype(p.dtype), new_master, params)
        return new_params, MixedPrecisionState(new_inner, new_master)

    return Transform(init, update)


class SkipState(NamedTuple):
    inner: Any
    skipped: jax.Array      # int32 count of skipped (non-finite) updates


def skip_nonfinite(tx: Transform) -> Transform:
    """Robustness wrapper: if ANY gradient leaf contains NaN/Inf, leave
    params and the inner optimizer state untouched and count the skip.

    The failure-detection analog the reference lacks entirely (its kernels
    ``exit(EXIT_FAILURE)``, SURVEY.md §5.3): one bad batch (overflow spike,
    corrupted record) no longer poisons Adam moments or weights, and
    ``state.skipped`` is a cheap training-health metric.  Pure and
    jit-compatible: the inner update always runs, the results are selected
    per-leaf with ``jnp.where``.
    """

    def init(params):
        return SkipState(tx.init(params), jnp.zeros((), jnp.int32))

    def update(grads, state, params):
        leaves = jax.tree_util.tree_leaves(grads)
        finite = jnp.all(jnp.stack(
            [jnp.all(jnp.isfinite(g)) for g in leaves]))
        new_params, new_inner = tx.update(grads, state.inner, params)
        keep = lambda new, old: jax.tree_util.tree_map(
            lambda n, o: jnp.where(finite, n, o), new, old)
        return keep(new_params, params), SkipState(
            keep(new_inner, state.inner),
            state.skipped + jnp.where(finite, 0, 1).astype(jnp.int32))

    return Transform(init, update)
