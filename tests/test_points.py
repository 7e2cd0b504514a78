"""Point-set datasets (reference minitorch/datasets.py) + classifier demo."""

import numpy as np
import pytest

from tpu_flash.data import points
from tpu_flash.apps.points_classifier import run


@pytest.mark.parametrize("name", sorted(points.datasets))
def test_shapes_and_labels(name):
    g = points.datasets[name](64)
    assert g.N == 64
    assert g.X.shape == (64, 2) and g.X.dtype == np.float32
    assert g.y.shape == (64,) and set(np.unique(g.y)) <= {0, 1}


def test_label_rules():
    # The labeling predicates of the reference datasets.py:23-66, checked
    # point by point against the stored labels.
    g = points.simple(200, seed=3)
    assert np.array_equal(g.y, (g.X[:, 0] < 0.5).astype(np.int32))
    g = points.diag(200, seed=3)
    assert np.array_equal(g.y, (g.X.sum(1) < 0.5).astype(np.int32))
    g = points.split(200, seed=3)
    assert np.array_equal(
        g.y, ((g.X[:, 0] < 0.2) | (g.X[:, 0] > 0.8)).astype(np.int32))
    g = points.xor(200, seed=3)
    assert np.array_equal(
        g.y, ((g.X[:, 0] < 0.5) ^ (g.X[:, 1] < 0.5)).astype(np.int32))
    g = points.circle(200, seed=3)
    c = g.X - 0.5
    assert np.array_equal(g.y, ((c * c).sum(1) > 0.1).astype(np.int32))


def test_spiral_structure():
    g = points.spiral(100)
    # Two arms, half the points each, labels 0 then 1 (datasets.py:69-85).
    assert np.array_equal(g.y, np.repeat([0, 1], 50))
    # The reference builds the second arm from (y(-t), x(-t)); with
    # x(t) = t·cos(t)/20 (odd) and y(t) = t·sin(t)/20 (even in t negation:
    # y(-t) = y(t), x(-t) = -x(t)) that is (y(t), -x(t)) — i.e. first
    # coordinate = arm0's second, second coordinate = 1 - arm0's first
    # after the +0.5 recentering.
    np.testing.assert_allclose(g.X[50:, 0], g.X[:50, 1], atol=1e-6)
    np.testing.assert_allclose(g.X[50:, 1], 1.0 - g.X[:50, 0], atol=1e-6)


@pytest.mark.parametrize("name,steps,min_acc", [
    ("Simple", 200, 0.97),
    ("Diag", 200, 0.97),
    ("Xor", 500, 0.95),
    ("Circle", 500, 0.93),
])
def test_classifier_learns(name, steps, min_acc):
    loss, acc = run(name, hidden=32, steps=steps)
    assert acc >= min_acc, (name, loss, acc)
