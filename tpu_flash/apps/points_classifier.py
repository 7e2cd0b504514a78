"""Tiny MLP classifier on the 2-D point datasets.

The course-legacy demo track of the reference (``minitorch/datasets.py``
consumed by the scalar/tensor "train a tiny network on Simple/Xor/Spiral"
assignments; the shipped ``tests/test_neural_network.py`` imports a
``project.run_sentiment_linear`` module that no longer exists, so this demo
is the living equivalent).  TPU-first shape: the whole dataset is one
``[N, 2]`` batch, the training loop is a single jitted ``lax.scan`` over
steps — zero host↔device traffic after the initial transfer.

Run:  python -m tpu_flash.apps.points_classifier --dataset Xor
"""

from __future__ import annotations

import argparse
import functools

import jax
import jax.numpy as jnp

from tpu_flash.data import points
from tpu_flash.nn.layers import Linear
from tpu_flash.nn.module import Module
from tpu_flash.nn import optim


class MLPClassifier(Module):
    """2 → hidden → hidden → 1 ReLU MLP with a sigmoid output, the same
    architecture the reference course track trains on these sets."""

    def __init__(self, hidden: int = 32):
        self.l1 = Linear(2, hidden)
        self.l2 = Linear(hidden, hidden)
        self.l3 = Linear(hidden, 1)

    def __call__(self, params, x):
        h = jax.nn.relu(self.l1(params["l1"], x))
        h = jax.nn.relu(self.l2(params["l2"], h))
        return self.l3(params["l3"], h)[..., 0]  # logits [N]


def bce_with_logits(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean binary cross-entropy on logits (stable log-sigmoid form)."""
    return jnp.mean(
        jnp.maximum(logits, 0.0) - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


@functools.partial(jax.jit, static_argnums=(0, 1, 2))
def train_points(model: MLPClassifier, tx: optim.Transform, steps: int,
                 params, opt_state, X: jax.Array, y: jax.Array):
    """scan over full-batch gradient steps; returns (params, losses[steps])."""

    def loss_fn(p):
        return bce_with_logits(model(p, X), y)

    def step(carry, _):
        p, s = carry
        loss, grads = jax.value_and_grad(loss_fn)(p)
        p, s = tx.update(grads, s, p)
        return (p, s), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), None, length=steps)
    return params, opt_state, losses


def run(dataset: str = "Xor", hidden: int = 32, steps: int = 500,
        lr: float = 0.05, n_points: int = 256, seed: int = 0):
    """Train on one named dataset; returns (final_loss, accuracy)."""
    graph = points.datasets[dataset](n_points, seed=seed)
    X = jnp.asarray(graph.X)
    y = jnp.asarray(graph.y, jnp.float32)

    model = MLPClassifier(hidden)
    tx = optim.adam(lr)
    params = model.init(jax.random.key(seed))
    params, _, losses = train_points(
        model, tx, steps, params, tx.init(params), X, y)

    preds = (model(params, X) > 0.0).astype(jnp.float32)
    acc = float(jnp.mean(preds == y))
    return float(losses[-1]), acc


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dataset", default="Xor", choices=sorted(points.datasets))
    ap.add_argument("--hidden", type=int, default=32)
    ap.add_argument("--steps", type=int, default=500)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--n-points", type=int, default=256)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)
    loss, acc = run(args.dataset, args.hidden, args.steps, args.lr,
                    args.n_points, args.seed)
    print(f"{args.dataset}: loss={loss:.4f} accuracy={acc:.3f}")


if __name__ == "__main__":
    main()
