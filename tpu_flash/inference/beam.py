"""Batched beam-search decoding over the KV-cache.

Capability superset of the reference's generation (greedy argmax one token
at a time, one example at a time — run_machine_translation.py:250-301):
beam search decodes ``B`` sequences x ``W`` beams in ONE device program,
with the per-step beam reorder expressed as a batch gather of the KV-cache
(the TPU-native form: no host bookkeeping, no pointer chasing — XLA turns
the gather into contiguous DMA copies).

Scoring follows GNMT: sum of token log-probs, finished beams frozen (their
only continuation is <pad> at zero cost), final selection by
``score / ((5 + len) / 6) ** length_penalty``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_flash.inference.kv_cache import KVCache
from tpu_flash.inference.sampler import prefill_prompt

NEG_INF = -1e30


def _gather_cache(c: KVCache, idx: jax.Array) -> KVCache:
    """Reorder the cache's batch dimension by ``idx`` [B*W]."""
    take = lambda a: None if a is None else a[idx]
    return KVCache(take(c.k), take(c.v), take(c.k_scale), take(c.v_scale),
                   c.lengths[idx], c.quant, c.compute_dtype,
                   n_head=c.n_head)


def beam_generate(
    model,
    params,
    prompt_ids: jax.Array,        # [B, Lp] int32, right-padded
    prompt_lengths: jax.Array,    # [B] int32
    *,
    beam_size: int = 4,
    max_new_tokens: int = 64,
    max_len: int,
    eos_id: int,
    pad_id: int = 0,
    kv_quant: str = "none",
    length_penalty: float = 0.6,
):
    """Returns (tokens [B, max_new_tokens], lengths [B]) of the best beam."""
    B = prompt_ids.shape[0]
    W = beam_size
    V = model.cfg.n_vocab

    # ---- prefill once per sequence, then tile to B*W beams ----------------
    last, caches = prefill_prompt(model, params, prompt_ids, prompt_lengths,
                                  max_len=max_len, kv_quant=kv_quant)
    tile = jnp.repeat(jnp.arange(B, dtype=jnp.int32), W)        # [B*W]
    caches = [_gather_cache(c, tile) for c in caches]
    last = jnp.repeat(last, W, axis=0)                          # [B*W, V]

    # beam 0 active, others start at -inf so the first step fans out from a
    # single root instead of W copies of the same prefix
    scores = jnp.full((B, W), NEG_INF, jnp.float32).at[:, 0].set(0.0)
    done = jnp.zeros((B, W), bool)
    gen_len = jnp.zeros((B, W), jnp.int32)
    out = jnp.full((B, W, max_new_tokens), pad_id, jnp.int32)

    # A finished beam may only emit <pad>, for free.
    finished_row = jnp.full((V,), NEG_INF, jnp.float32).at[pad_id].set(0.0)

    caches_flat, caches_tree = jax.tree_util.tree_flatten(caches)

    def cond(state):
        step, _, _, _, done, _, _ = state
        return jnp.logical_and(step < max_new_tokens,
                               jnp.logical_not(jnp.all(done)))

    def body(state):
        step, last_logits, caches_flat, scores, done, gen_len, out = state
        logp = jax.nn.log_softmax(last_logits.astype(jnp.float32), axis=-1)
        logp = logp.reshape(B, W, V)
        logp = jnp.where(done[:, :, None], finished_row[None, None, :], logp)
        cand = scores[:, :, None] + logp                        # [B, W, V]
        top_scores, flat_idx = jax.lax.top_k(cand.reshape(B, W * V), W)
        parent = (flat_idx // V).astype(jnp.int32)              # [B, W]
        token = (flat_idx % V).astype(jnp.int32)                # [B, W]

        # Reorder beam state (and the KV-cache batch dim) by parent.
        gidx = (jnp.arange(B, dtype=jnp.int32)[:, None] * W
                + parent).reshape(-1)                           # [B*W]
        take_bw = lambda a: jnp.take_along_axis(a, parent, axis=1)
        done_p = take_bw(done)
        gen_len_p = take_bw(gen_len)
        out_p = jnp.take_along_axis(
            out, parent[:, :, None], axis=1)

        was_done = done_p
        out_p = out_p.at[:, :, step].set(
            jnp.where(was_done, pad_id, token))
        gen_len_p = gen_len_p + jnp.where(was_done, 0, 1)
        done_p = was_done | (token == eos_id)

        caches = jax.tree_util.tree_unflatten(caches_tree, caches_flat)
        caches = [_gather_cache(c, gidx) for c in caches]
        step_tok = jnp.where(was_done.reshape(-1), pad_id,
                             token.reshape(-1))
        positions = caches[0].lengths[:, None]
        logits, caches = model(params, step_tok[:, None], kv_caches=caches,
                               positions=positions)
        caches_flat, _ = jax.tree_util.tree_flatten(caches)
        return (step + 1, logits[:, 0, :], caches_flat, top_scores, done_p,
                gen_len_p, out_p)

    state = (jnp.array(0, jnp.int32), last, caches_flat, scores, done,
             gen_len, out)
    state = jax.lax.while_loop(cond, body, state)
    _, _, _, scores, done, gen_len, out = state

    # GNMT length normalization; unfinished beams are only eligible when no
    # beam of that sequence finished.
    norm = ((5.0 + gen_len.astype(jnp.float32)) / 6.0) ** length_penalty
    adj = scores / jnp.maximum(norm, 1e-6)
    any_done = jnp.any(done, axis=1, keepdims=True)
    adj = jnp.where(jnp.logical_and(any_done, jnp.logical_not(done)),
                    NEG_INF, adj)
    best = jnp.argmax(adj, axis=1)                              # [B]
    btokens = jnp.take_along_axis(
        out, best[:, None, None].repeat(max_new_tokens, 2), axis=1)[:, 0]
    blen = jnp.take_along_axis(gen_len, best[:, None], axis=1)[:, 0]
    return btokens, blen
