"""Parameter and activation sharding rules for the DecoderLM.

Megatron-style tensor parallelism over the ``model`` axis:

  * q/k/v projections: weight [E, E] sharded on the *output* dim (heads);
  * out projection:    weight [E, E] sharded on the *input* dim (GSPMD
    inserts the psum of partial results);
  * FF linear_in:      output dim (hidden) sharded;
  * FF linear_out:     input dim sharded (+psum);
  * embeddings:        embedding dim sharded;
  * lm_head:           vocab (output) dim sharded — the loss's softmax
    reduction over vocab becomes a collective;
  * LayerNorm params:  replicated.

Batch-like activations shard over the ``data`` axis.  Specs are produced as
a pytree congruent with ``model.init``'s params so they can be zipped with
``jax.device_put`` / ``jit`` shardings.
"""

from __future__ import annotations

from typing import Any

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_flash.parallel.context import ParallelContext


def _linear_spec(model_axis: str, shard: str | None):
    if shard == "out":
        return {"weight": P(None, model_axis), "bias": P(model_axis)}
    if shard == "in":
        # input-sharded: bias is added after the psum -> replicated
        return {"weight": P(model_axis, None), "bias": P(None)}
    return {"weight": P(None, None), "bias": P(None)}


def _prune_to(params: Any, spec: Any):
    """Conform the spec tree to the actual params tree: drop spec entries
    with no matching param (e.g. bias=False) and default anything the rules
    don't name (e.g. parameter-less Dropout subtrees) to replicated."""
    if isinstance(params, dict):
        out = {}
        for k in params:
            sub = spec.get(k) if isinstance(spec, dict) else None
            if sub is None:
                sub = {} if isinstance(params[k], dict) else P()
            out[k] = _prune_to(params[k], sub)
        return out
    return spec


def decoder_param_specs(model, params) -> Any:
    """PartitionSpec pytree for DecoderLM params (congruent with params)."""
    m = model.cfg  # noqa: F841  (kept for future per-size decisions)
    ax = "model"

    def layer_spec():
        if model.cfg.moe is not None:
            # Expert parallelism: experts sharded over the model axis
            # (GSPMD turns the dispatch einsums into all-to-alls).
            from tpu_flash.nn.moe import expert_param_specs
            ff = expert_param_specs(ax)
        else:
            ff = {
                "linear_in": _linear_spec(ax, "out"),
                "linear_out": _linear_spec(ax, "in"),
            }
        return {
            "ln_1": {"gamma": P(None), "beta": P(None)},
            "ln_2": {"gamma": P(None), "beta": P(None)},
            "attention": {
                "q_projection": _linear_spec(ax, "out"),
                "k_projection": _linear_spec(ax, "out"),
                "v_projection": _linear_spec(ax, "out"),
                "out_projection": _linear_spec(ax, "in"),
            },
            "ff": ff,
        }

    spec = {
        "token_embeddings": {"weight": P(None, ax)},
        "position_embeddings": {"weight": P(None, ax)},
        "layers": {
            str(i): layer_spec() for i in range(model.cfg.n_layer)
        },
        "ln": {"gamma": P(None), "beta": P(None)},
        "lm_head": _linear_spec(ax, "out"),
    }
    return _prune_to(params, spec)


def map_with_specs(params: Any, specs: Any, fn):
    """Zip a params tree with a congruent spec tree (specs are
    PartitionSpecs, which are themselves tuples/pytrees — so plain tree_map
    over both trees would descend into them; this walker treats them as
    leaves)."""
    if isinstance(params, dict):
        return {k: map_with_specs(params[k], specs[k], fn) for k in params}
    return fn(params, specs)


def shard_params(ctx: ParallelContext, model, params):
    """Place params on the mesh under the TP rules."""
    specs = decoder_param_specs(model, params)
    sharded = map_with_specs(
        params, specs,
        lambda p, s: jax.device_put(p, NamedSharding(ctx.mesh, s)))
    return sharded, specs


_BATCH_2D_FIELDS = ("input_ids", "labels", "label_token_weights",
                    "segment_ids", "positions")


def batch_specs(ctx: ParallelContext, batch=None):
    """Batch dict sharding: [B, L] fields shard over data on dim 0, scalars
    (e.g. the packed ``loss_norm``) replicate.  With ``batch`` given, specs
    cover exactly its keys (packed batches carry segment_ids/positions)."""
    keys = _BATCH_2D_FIELDS if batch is None else batch.keys()
    return {k: (P(ctx.data_axis, None) if k in _BATCH_2D_FIELDS else P())
            for k in keys}
