"""Central-difference gradient checking.

User-facing equivalent of the reference's ``minitorch.grad_check``
(minitorch/tensor_functions.py:670-709): sample random positions of each
input, perturb ±eps, and compare the central difference of ``sum(fn(*args))``
against the analytic reverse-mode gradient.  The reference casts to torch
float64 for the difference; here the function under test runs in its native
dtype (fp32 kernels) and the comparison uses the same tolerant defaults the
reference applies for its kernel-backed ops — tight enough to catch a wrong
VJP term (sign error, missing rescale, dropped mask) while robust to fp32
evaluation noise.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def central_difference(fn, *args, arg: int = 0, idx: tuple, eps: float = 1e-3):
    """d sum(fn(*args)) / d args[arg][idx] by symmetric difference
    (the analog of tensor_functions.py:670-678)."""
    def shifted(delta):
        moved = list(args)
        base = np.asarray(moved[arg], np.float64)
        pert = base.copy()
        pert[idx] += delta
        moved[arg] = jnp.asarray(pert, args[arg].dtype)
        return float(jnp.sum(fn(*moved)))

    return (shifted(eps) - shifted(-eps)) / (2.0 * eps)


def grad_check(
    fn,
    *args,
    n_samples: int = 4,
    eps: float = 1e-3,
    rtol: float = 1e-2,
    atol: float = 1e-2,
    seed: int = 0,
) -> bool:
    """Check ``jax.grad`` of ``sum(fn(*args))`` at random positions of every
    input against central differences.

    Raises ``AssertionError`` with the offending (argument, index, analytic,
    numeric) on mismatch; returns True otherwise.  Mirrors the reference's
    ``grad_check(f, *tensors)`` contract (random positions per input,
    symmetric difference, assert-close), minitorch/tensor_functions.py:681-709.
    """
    args = tuple(jnp.asarray(a) for a in args)
    float_argnums = tuple(
        i for i, a in enumerate(args)
        if jnp.issubdtype(a.dtype, jnp.floating))
    grads = dict(zip(float_argnums, jax.grad(
        lambda *a: jnp.sum(fn(*a)), argnums=float_argnums)(*args)))
    rng = np.random.default_rng(seed)
    for i in float_argnums:
        a, g = args[i], grads[i]
        flat_positions = rng.choice(
            a.size, size=min(n_samples, a.size), replace=False)
        for flat in flat_positions:
            idx = np.unravel_index(int(flat), a.shape)
            numeric = central_difference(fn, *args, arg=i, idx=idx, eps=eps)
            analytic = float(np.asarray(g)[idx])
            if not np.isclose(analytic, numeric, rtol=rtol, atol=atol):
                raise AssertionError(
                    f"grad_check failed for argument {i} at index {idx}: "
                    f"analytic {analytic:.6g} vs central-difference "
                    f"{numeric:.6g} (eps={eps}, rtol={rtol}, atol={atol})")
    return True
