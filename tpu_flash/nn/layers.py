"""Basic layers — the analog of minitorch/modules_basic.py.

Initialization parity with the reference:
  * ``Linear``: weights and bias ~ U(-1/sqrt(in), 1/sqrt(in))
    (modules_basic.py:88-122's RParam uses rand*2a-a with a=1/sqrt(in_size));
  * ``Embedding``: weights ~ N(0, 1) (modules_basic.py:19-54);
  * ``LayerNorm``: gamma=1, beta=0.

TPU-first differences: Embedding is a gather, not the reference's dense
one-hot @ weight matmul (modules_basic.py:39-54) — ``one_hot_matmul=True``
restores the parity path for loss matching; LayerNorm can route through the
fused Pallas kernel (the LayerNorm1dFused analog, modules_basic.py:124-136).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from tpu_flash.kernels.quant import QuantizedLinearWeights, int8_linear, quantize_weight
from tpu_flash.nn import functional as F
from tpu_flash.nn.module import Module, Params
from tpu_flash.ops import layer_norm as fused_layer_norm


class Linear(Module):
    def __init__(self, in_size: int, out_size: int, bias: bool = True,
                 dtype=jnp.float32):
        self.in_size = in_size
        self.out_size = out_size
        self.use_bias = bias
        self.dtype = dtype

    def init(self, key: jax.Array) -> Params:
        a = 1.0 / math.sqrt(self.in_size)
        wkey, bkey = jax.random.split(key)
        p = {"weight": jax.random.uniform(
            wkey, (self.in_size, self.out_size), self.dtype, -a, a)}
        if self.use_bias:
            p["bias"] = jax.random.uniform(
                bkey, (self.out_size,), self.dtype, -a, a)
        return p

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if "codes4" in params:
            # int4 weight-only serving path (see kernels/quant.py int4_*);
            # created by ``quantize_linear_params(bits=4)``.
            from tpu_flash.kernels.quant import (QuantizedLinearWeights4,
                                                 int4_linear)
            return int4_linear(x, QuantizedLinearWeights4(
                params["codes4"], params["scales"], self.in_size,
                params.get("bias")))
        if "codes" in params:
            # int8 weight-only serving path (see kernels/quant.py); created
            # by ``quantize_linear_params`` — dequant fused into the kernel.
            return int8_linear(x, QuantizedLinearWeights(
                params["codes"], params["scales"], params.get("bias")))
        y = x @ params["weight"]
        if self.use_bias:
            y = y + params["bias"]
        return y


class Embedding(Module):
    def __init__(self, num_embeddings: int, embedding_dim: int,
                 dtype=jnp.float32, one_hot_matmul: bool = False):
        self.num_embeddings = num_embeddings
        self.embedding_dim = embedding_dim
        self.dtype = dtype
        self.one_hot_matmul = one_hot_matmul

    def init(self, key: jax.Array) -> Params:
        return {"weight": jax.random.normal(
            key, (self.num_embeddings, self.embedding_dim), self.dtype)}

    def __call__(self, params: Params, ids: jax.Array) -> jax.Array:
        w = params["weight"]
        if self.one_hot_matmul:
            # reference parity path (modules_basic.py:39-54)
            return F.one_hot(ids, self.num_embeddings, w.dtype) @ w
        return jnp.take(w, ids, axis=0)


class Dropout(Module):
    def __init__(self, p_dropout: float = 0.1):
        self.p = float(p_dropout)

    def init(self, key: jax.Array) -> Params:
        return {}

    def __call__(self, params: Params, x: jax.Array, *,
                 key: jax.Array | None = None,
                 training: bool = False) -> jax.Array:
        return F.dropout(x, self.p, key=key, training=training, rescale=True)


class LayerNorm(Module):
    """Row LayerNorm over the last axis.

    ``fused=False`` composes jnp ops with the given ``eps`` (the LayerNorm1d
    analog, modules_basic.py:139-175); ``fused=True`` routes through the
    Pallas kernel, whose eps is pinned to the CUDA kernel's 1e-8
    (LayerNorm1dFused analog, modules_basic.py:124-136).
    """

    def __init__(self, dim: int, eps: float = 1e-5, fused: bool = False,
                 dtype=jnp.float32):
        self.dim = dim
        self.eps = eps
        self.fused = fused
        self.dtype = dtype

    def init(self, key: jax.Array) -> Params:
        return {
            "gamma": jnp.ones((self.dim,), self.dtype),
            "beta": jnp.zeros((self.dim,), self.dtype),
        }

    def __call__(self, params: Params, x: jax.Array) -> jax.Array:
        if self.fused:
            return fused_layer_norm(x, params["gamma"], params["beta"])
        mean = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(x - mean), axis=-1, keepdims=True)
        xhat = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return xhat * params["gamma"] + params["beta"]


def quantize_linear_params(params: Params, *, bits: int = 8,
                           group_size: int | None = None,
                           allow_small_groups: bool = False) -> Params:
    """Convert one Linear's params to int8 (``bits=8``) or packed int4
    (``bits=4``, optional GPTQ-style ``group_size``) weight-only form."""
    if bits == 4:
        from tpu_flash.kernels.quant import quantize_weight_int4
        w = params["weight"]
        g = group_size
        if g is not None and w.shape[0] % (2 * g):
            g = None               # indivisible layer: per-channel fallback
        codes4, scales, _ = quantize_weight_int4(
            w, group_size=g, allow_small_groups=allow_small_groups)
        out = {"codes4": codes4, "scales": scales}
    elif bits == 8:
        codes, scales = quantize_weight(params["weight"], axis=0)
        out = {"codes": codes, "scales": scales}
    else:
        raise ValueError(f"bits must be 4 or 8, got {bits}")
    if "bias" in params:
        out["bias"] = params["bias"]
    return out


def quantize_model_linears(params: Params, *, skip=("ln",), bits: int = 8,
                           group_size: int | None = None,
                           allow_small_groups: bool = False) -> Params:
    """Walk a params tree and quantize every Linear-shaped subtree
    ({"weight": 2D, ...}) to int8 weight-only form, skipping subtrees whose
    key contains any of ``skip`` (LayerNorms keep fp params; Embeddings are
    not Linear-shaped because their weight is consumed by gather)."""
    def walk(tree, name):
        if not isinstance(tree, dict):
            return tree
        if ("weight" in tree and getattr(tree["weight"], "ndim", 0) == 2
                and not any(s in name for s in skip)
                and "embedding" not in name):
            return quantize_linear_params(
                tree, bits=bits, group_size=group_size,
                allow_small_groups=allow_small_groups)
        return {k: walk(v, f"{name}.{k}") for k, v in tree.items()}
    return walk(params, "")
