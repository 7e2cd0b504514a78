"""Scalar autodiff track parity.

The reference carries a whole scalar autodiff engine
(minitorch/scalar.py, minitorch/scalar_functions.py, operators.py:12-145:
Mul/Add/Neg/Sigmoid/ReLU/Log/Exp/Inv/PowerScalar/Tanh with hand-written
``*_back`` derivative rules, checked by tests/test_scalar.py's
``derivative_check`` central differences).  Here jax.grad IS that engine;
these tests pin the same derivative rules analytically and via the
user-facing ``tpu_flash.grad_check`` central-difference checker, so the
capability (scalar reverse-mode AD with correct rules for the full op set)
stays regression-tested.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_flash import grad_check

# (fn, analytic derivative, sample points) — the reference's operators.py
# derivative rules (log_back 1/x, inv_back -1/x^2, sigmoid' = s(1-s),
# relu_back gates on x>0, tanh' = 1-t^2, exp' = exp).
CASES = [
    (jnp.log, lambda x: 1.0 / x, [0.3, 1.0, 4.2]),
    (lambda x: 1.0 / x, lambda x: -1.0 / x**2, [0.5, -2.0, 3.0]),
    (jax.nn.sigmoid,
     lambda x: jax.nn.sigmoid(x) * (1 - jax.nn.sigmoid(x)), [-3.0, 0.0, 2.0]),
    (jax.nn.relu, lambda x: (x > 0).astype(jnp.float32), [-1.5, 0.7, 3.0]),
    (jnp.tanh, lambda x: 1 - jnp.tanh(x) ** 2, [-2.0, 0.1, 1.0]),
    (jnp.exp, jnp.exp, [-1.0, 0.0, 2.0]),
    (lambda x: x ** 3.0, lambda x: 3.0 * x ** 2, [0.5, -1.2, 2.0]),
]


@pytest.mark.parametrize("fn,dfn,points", CASES)
def test_derivative_rules(fn, dfn, points):
    g = jax.grad(fn)
    for x in points:
        x = jnp.float32(x)
        np.testing.assert_allclose(g(x), dfn(x), rtol=1e-5, atol=1e-6)


def test_chain_rule_composition():
    # the scalar-track integration test shape: a small expression tree,
    # checked by central differences (derivative_check analog).
    def expr(x, y):
        return jnp.log(x * y + 1.0) * jax.nn.sigmoid(x - y) + jnp.tanh(y) / x

    x = jnp.asarray([1.3], jnp.float32)
    y = jnp.asarray([0.7], jnp.float32)
    assert grad_check(expr, x, y, eps=1e-3, rtol=1e-3, atol=1e-3)


def test_comparison_ops_zero_grad():
    # lt/eq/is_close are piecewise-constant: zero gradient (the reference
    # returns 0.0 for both cotangents, scalar_functions.py LT/EQ).
    for op in (lambda x: (x < 2.0).astype(jnp.float32),
               lambda x: (x == 2.0).astype(jnp.float32),
               lambda x: jnp.isclose(x, 2.0).astype(jnp.float32)):
        g = jax.grad(op)(jnp.float32(1.0))
        assert float(g) == 0.0


def test_max_subgradient():
    # max picks the argmax branch (reference max_back one-hot behavior).
    g = jax.grad(lambda x: jnp.max(jnp.stack([x * 2.0, x + 10.0])))(
        jnp.float32(1.0))
    assert float(g) == 1.0  # x+10 branch wins at x=1
