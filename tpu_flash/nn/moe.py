"""Mixture-of-Experts feed-forward with expert parallelism.

New capability beyond the reference (whose FeedForward is a dense GELU MLP,
minitorch/modules_transfomer.py:161-203).  TPU-native design choices:

* **Dense dispatch** (GShard/Switch style): routing is expressed as one-hot
  dispatch/combine einsums over a static per-expert capacity, so everything
  is fixed-shape matmul work on the MXU — no gather/scatter, no dynamic
  shapes, nothing XLA can't tile.
* **Expert parallelism via GSPMD**: the stacked expert weights carry a
  leading [n_experts] axis; sharding that axis over a mesh axis makes XLA
  insert the dispatch/return all-to-alls automatically
  (``expert_param_specs``).  No hand-written collectives needed on one host;
  the same sharding rides ICI on a slice.
* **Capacity overflow** drops tokens exactly like Switch Transformer
  (tokens beyond ``capacity`` pass through the residual unchanged), and the
  router adds the standard load-balancing auxiliary loss
  ``aux = n_exp * sum_e f_e * p_e``.

Supports top-1 (Switch) and top-2 (GShard) routing.
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp

from tpu_flash.nn.module import Module, Params


@dataclasses.dataclass
class MoEConfig:
    n_experts: int = 8
    top_k: int = 1
    capacity_factor: float = 1.25
    aux_weight: float = 0.01     # multiplier applied by the training loss
    router_noise: float = 0.0    # jitter std on router logits (train only)


class MoEFeedForward(Module):
    """Routed GELU MLP: router -> top-k experts -> capacity-bounded dispatch.

    ``__call__`` returns ``(y, aux_loss)``; ``aux_loss`` is the Switch
    load-balancing term (scalar, ~1.0 when perfectly balanced).
    """

    def __init__(self, n_embd: int, middle_dim: int, moe: MoEConfig,
                 dtype=jnp.float32, p_dropout: float = 0.0):
        self.n_embd = n_embd
        self.middle_dim = middle_dim
        self.moe = moe
        self.dtype = dtype
        self.p_dropout = float(p_dropout)

    def init(self, key: jax.Array) -> Params:
        E, F, X = self.n_embd, self.middle_dim, self.moe.n_experts
        kr, k1, k2 = jax.random.split(key, 3)
        s_in = 1.0 / math.sqrt(E)
        s_out = 1.0 / math.sqrt(F)
        return {
            "router": jax.random.uniform(
                kr, (E, X), self.dtype, -s_in, s_in),
            "w_in": jax.random.uniform(
                k1, (X, E, F), self.dtype, -s_in, s_in),
            "b_in": jnp.zeros((X, F), self.dtype),
            "w_out": jax.random.uniform(
                k2, (X, F, E), self.dtype, -s_out, s_out),
            "b_out": jnp.zeros((X, E), self.dtype),
        }

    def _route(self, logits, *, capacity):
        """Top-k dispatch/combine tensors from router logits [T, X].

        Returns (dispatch [T, X, C] one-hot, combine [T, X, C] gated,
        aux_loss scalar).
        """
        T, X = logits.shape
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        dispatch = jnp.zeros((T, X, capacity), jnp.float32)
        combine = jnp.zeros((T, X, capacity), jnp.float32)
        remaining = probs
        # Per-expert fill level carried across the k routing rounds so the
        # second choice competes for the space the first left over.
        fill = jnp.zeros((X,), jnp.int32)
        frac_routed = jnp.zeros((X,), jnp.float32)
        for _ in range(self.moe.top_k):
            gate = jnp.max(remaining, axis=-1)                    # [T]
            expert = jnp.argmax(remaining, axis=-1)               # [T]
            onehot = jax.nn.one_hot(expert, X, dtype=jnp.float32)  # [T, X]
            # Position of each token inside its expert's buffer this round.
            pos = (jnp.cumsum(onehot, axis=0) - 1.0) + fill[None, :].astype(
                jnp.float32)
            pos_t = jnp.sum(pos * onehot, axis=-1)                # [T]
            keep = pos_t < capacity
            slot = jax.nn.one_hot(
                pos_t.astype(jnp.int32), capacity, dtype=jnp.float32)
            d = onehot[:, :, None] * slot[:, None, :] \
                * keep[:, None, None].astype(jnp.float32)
            dispatch = dispatch + d
            combine = combine + d * gate[:, None, None]
            fill = fill + jnp.sum(
                onehot * keep[:, None].astype(jnp.float32),
                axis=0).astype(jnp.int32)
            frac_routed = frac_routed + jnp.mean(onehot, axis=0)
            remaining = remaining * (1.0 - onehot)

        # Switch aux loss: n_exp * sum_e (token fraction)_e * (mean prob)_e.
        aux = self.moe.n_experts * jnp.sum(
            (frac_routed / self.moe.top_k) * jnp.mean(probs, axis=0))
        return dispatch, combine, aux

    def __call__(self, params: Params, x: jax.Array, *,
                 key=None, training: bool = False):
        B, L, E = x.shape
        X = self.moe.n_experts
        T = B * L
        capacity = max(
            1,
            int(math.ceil(self.moe.top_k * T / X
                          * self.moe.capacity_factor)))

        tokens = x.reshape(T, E)
        logits = tokens.astype(jnp.float32) @ params["router"].astype(
            jnp.float32)
        k_noise = k_drop = None
        if key is not None:
            k_noise, k_drop = jax.random.split(key)
        if training and self.moe.router_noise > 0.0 and k_noise is not None:
            logits = logits + self.moe.router_noise * jax.random.normal(
                k_noise, logits.shape, jnp.float32)
        dispatch, combine, aux = self._route(logits, capacity=capacity)

        # [X, C, E] expert input buffers — one einsum (MXU), all-to-all
        # under expert sharding.
        expert_in = jnp.einsum(
            "txc,te->xce", dispatch.astype(x.dtype), tokens)
        h = jnp.einsum("xce,xef->xcf", expert_in, params["w_in"])
        h = jax.nn.gelu(h + params["b_in"][:, None, :], approximate=True)
        # same post-GELU dropout as the dense FeedForward it replaces
        from tpu_flash.nn import functional as F
        h = F.dropout(h, self.p_dropout, key=k_drop, training=training,
                      rescale=True)
        expert_out = jnp.einsum("xcf,xfe->xce", h, params["w_out"])
        expert_out = expert_out + params["b_out"][:, None, :]

        y = jnp.einsum(
            "txc,xce->te", combine.astype(x.dtype), expert_out)
        return y.reshape(B, L, E), aux


def expert_param_specs(expert_axis: str = "model"):
    """PartitionSpec tree for MoEFeedForward params: experts sharded over
    ``expert_axis`` (GSPMD inserts the dispatch all-to-alls), router
    replicated."""
    from jax.sharding import PartitionSpec as P

    return {
        "router": P(None, None),
        "w_in": P(expert_axis, None, None),
        "b_in": P(expert_axis, None),
        "w_out": P(expert_axis, None, None),
        "b_out": P(expert_axis, None),
    }
