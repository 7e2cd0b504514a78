"""Batched autoregressive generation with KV-cache.

Replaces the reference's decode loop — one example at a time, full-prefix
re-forward per token, argmax on host numpy
(project/run_machine_translation.py:250-301) — with a TPU-native design:

  * whole batch decoded together (ragged prompts handled by per-sequence
    cache lengths + right-aligned stepping);
  * one jitted prefill + one jitted ``lax.while_loop`` decode program —
    no host round-trip per token;
  * greedy or temperature/top-k sampling.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from tpu_flash.inference.kv_cache import KVCache


@dataclasses.dataclass(frozen=True)
class SamplingConfig:
    max_new_tokens: int = 64
    temperature: float = 0.0        # 0 => greedy argmax
    top_k: int = 0                  # 0 => no top-k filtering
    top_p: float = 1.0              # <1 => nucleus sampling
    eos_id: int = -1                # stop when generated (-1: never)


def adjusted_logits(logits: jax.Array, cfg: SamplingConfig) -> jax.Array:
    """Apply temperature / top-k / top-p filtering; the sampling
    distribution is ``softmax(adjusted_logits(...))`` (also the
    distribution speculative rejection-sampling must preserve).
    Requires cfg.temperature > 0."""
    logits = logits / cfg.temperature
    if cfg.top_k > 0:
        kth = jnp.sort(logits, axis=-1)[..., -cfg.top_k, None]
        logits = jnp.where(logits < kth, -jnp.inf, logits)
    if cfg.top_p < 1.0:
        # nucleus: keep the smallest prefix of the sorted distribution whose
        # mass reaches top_p (the argmax token always survives)
        sort_idx = jnp.argsort(-logits, axis=-1)
        sorted_logits = jnp.take_along_axis(logits, sort_idx, axis=-1)
        probs = jax.nn.softmax(sorted_logits, axis=-1)
        keep_sorted = (jnp.cumsum(probs, axis=-1) - probs) < cfg.top_p
        keep = jnp.zeros_like(keep_sorted)
        keep = jnp.put_along_axis(keep, sort_idx, keep_sorted, axis=-1,
                                  inplace=False)
        logits = jnp.where(keep, logits, -jnp.inf)
    return logits


def _sample_token(logits: jax.Array, cfg: SamplingConfig, key: jax.Array):
    """logits [B, V] -> token ids [B]."""
    if cfg.temperature <= 0.0:
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    return jax.random.categorical(
        key, adjusted_logits(logits, cfg), axis=-1).astype(jnp.int32)


def make_caches(model, batch: int, max_len: int, *, quant: str = "none",
                compute_dtype=jnp.float32):
    c = model.cfg
    return [
        KVCache.create(batch, c.kv_heads, max_len, c.attn_hidden_dim,
                       quant=quant, compute_dtype=compute_dtype)
        for _ in range(c.n_layer)
    ]


def prefill_prompt(model, params, prompt_ids, prompt_lengths, *,
                   max_len: int, kv_quant: str = "none"):
    """Run the padded prompt batch through fresh caches; returns
    ``(last_logits [B, V], caches)``.

    The cache treats all Lp positions as written; attention masking during
    prefill is the standard causal mask over the padded block.  Positions
    beyond a sequence's true length are garbage but are neutralized by
    clamping per-sequence cache lengths to the TRUE prompt lengths
    afterwards, so pad positions are never attended in decode.  Shared by
    ``generate`` and ``beam.beam_generate`` so the padding semantics cannot
    drift apart.
    """
    B, Lp = prompt_ids.shape
    caches = make_caches(model, B, max_len, quant=kv_quant,
                         compute_dtype=model.cfg.dtype)
    positions = jnp.arange(Lp, dtype=jnp.int32)[None, :].repeat(B, 0)
    logits, caches = model(params, prompt_ids, kv_caches=caches,
                           positions=positions)
    caches = [
        dataclasses.replace(c, lengths=prompt_lengths.astype(jnp.int32))
        for c in caches
    ]
    # Logits of the last *real* prompt token of each sequence:
    last = jnp.take_along_axis(
        logits, (prompt_lengths - 1)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0, :]
    return last, caches


def generate(
    model,
    params,
    prompt_ids: jax.Array,        # [B, Lp] int32, right-padded with pad_id
    prompt_lengths: jax.Array,    # [B] int32 true prompt lengths
    sampling: SamplingConfig,
    *,
    max_len: int,
    kv_quant: str = "none",
    pad_id: int = 0,
    key: jax.Array | None = None,
):
    """Returns (tokens [B, max_new_tokens], lengths-of-generation [B]).

    Prefill processes the padded prompt in one pass (``prefill_prompt``),
    then a jitted while_loop emits up to ``max_new_tokens`` per sequence,
    stopping early once every sequence has hit ``eos_id``.
    """
    B, Lp = prompt_ids.shape
    if key is None:
        key = jax.random.key(0)

    last, caches = prefill_prompt(model, params, prompt_ids, prompt_lengths,
                                  max_len=max_len, kv_quant=kv_quant)

    # ---- decode loop ------------------------------------------------------
    caches_flat, caches_tree = jax.tree_util.tree_flatten(caches)

    def cond(state):
        step, _, _, _, done, _ = state
        return jnp.logical_and(step < sampling.max_new_tokens,
                               jnp.logical_not(jnp.all(done)))

    def body(state):
        step, last_logits, caches_flat, out_tokens, done, key = state
        key, sub = jax.random.split(key)
        tok = _sample_token(last_logits, sampling, sub)
        tok = jnp.where(done, pad_id, tok)
        out_tokens = out_tokens.at[:, step].set(tok)
        new_done = jnp.logical_or(done, tok == sampling.eos_id)

        caches = jax.tree_util.tree_unflatten(caches_tree, caches_flat)
        positions = caches[0].lengths[:, None]
        logits, caches = model(params, tok[:, None], kv_caches=caches,
                               positions=positions)
        caches_flat, _ = jax.tree_util.tree_flatten(caches)
        return (step + 1, logits[:, 0, :], caches_flat, out_tokens,
                new_done, key)

    out_tokens = jnp.full((B, sampling.max_new_tokens), pad_id, jnp.int32)
    done = jnp.zeros((B,), bool)
    state = (jnp.array(0, jnp.int32), last, caches_flat, out_tokens, done, key)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, out_tokens, done, _ = state
    n_gen = jnp.sum((out_tokens != pad_id).astype(jnp.int32), axis=-1)
    return out_tokens, n_gen
