"""Speculative decoding: draft-model proposals verified by the target model.

A serving-path capability beyond the reference (whose generate() re-runs the
full prefix per token, project/run_machine_translation.py:250-301): decode on
TPU is HBM-bandwidth-bound — one verification forward over ``k`` draft
tokens streams the same KV-cache bytes as a single-token step (the flash-
decode kernel folds the k tokens into its block-diagonal row group,
kernels/decode.py), so accepting ``m`` drafts yields ``m+1`` tokens for ~one
step's worth of cache traffic plus the (cheap) draft model's steps.

Design:

  * both models follow the sampler's cache convention — the cache holds
    every *fed* token, ``pending`` is the newest emitted-but-not-yet-fed
    token;
  * per round the draft model runs ``n_draft`` single-token steps (each via
    the Pallas flash-decode kernel) proposing ``d_1..d_{n_draft-1}`` after
    ``pending`` (the last step only writes its KV so full-acceptance rounds
    leave the draft cache position-complete);
  * the target model runs ONE multi-token forward over
    ``[pending, d_1..d_{n_draft-1}]``, giving its distribution after every
    prefix;
  * greedy (temperature 0): a draft is accepted iff it equals the target's
    argmax; the output is the target's own greedy decode, token for token —
    the draft model changes the speed, never the result;
  * stochastic (temperature > 0): standard speculative rejection sampling
    (Leviathan et al. / Chen et al.) — draft token ``d`` sampled from
    ``q`` is accepted with probability ``min(1, p(d)/q(d))`` against the
    target's (temperature/top-k/top-p-adjusted) distribution ``p``; on
    rejection the replacement is drawn from ``norm(max(p - q, 0))``, and
    after a fully-accepted round the bonus token comes from ``p`` alone.
    Each emitted token is *distributed* exactly as target-only sampling
    (the draft cancels out), though the realized random stream differs
    from :func:`sampler.generate`'s;
  * rollback is O(1): stale cache positions past a sequence's ``lengths``
    are never attended, so rejecting drafts is just not advancing
    ``lengths`` past the accepted prefix.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from tpu_flash.inference.sampler import (
    SamplingConfig,
    adjusted_logits,
    prefill_prompt,
)


def speculative_round(
    model, params, draft_model, draft_params,
    sampling: SamplingConfig,
    t_caches, d_caches,
    pending: jax.Array,           # [B] newest emitted-but-not-fed token
    active: jax.Array,            # [B] bool: rows that advance this round
    key: jax.Array,
    n_draft: int,
    pad_id: int,
):
    """One draft-verify round (jit-traceable; the shared core of
    :func:`speculative_generate` and the engine's speculative stepping).

    Drafts ``n_draft - 1`` tokens, verifies ``[pending, drafts]`` in one
    target forward, and rolls both caches back to the accepted prefix
    (rows where ``active`` is False do not advance).  Returns
    ``(emitted [B, n_draft], m [B], g_m [B], t_caches, d_caches)`` where
    ``emitted[:, :m+1]`` are this round's tokens (accepted drafts then the
    correction/bonus ``g_m``, which is the next round's ``pending``) and
    trailing positions hold ``pad_id``.
    """
    W = n_draft
    stochastic = sampling.temperature > 0.0
    B = pending.shape[0]
    ar = jnp.arange(W, dtype=jnp.int32)[None, :]
    _, d_tree = jax.tree_util.tree_flatten(d_caches)
    t_len = t_caches[0].lengths                          # [B] == C
    d_len0 = [c.lengths for c in d_caches]
    d_flat, _ = jax.tree_util.tree_flatten(d_caches)

    # ---- draft W single-token steps (last one only for its KV write) ------
    def dstep(carry, _):
        x, d_flat, key = carry
        dc = jax.tree_util.tree_unflatten(d_tree, d_flat)
        pos = dc[0].lengths[:, None]
        logits, dc = draft_model(draft_params, x[:, None],
                                 kv_caches=dc, positions=pos)
        if stochastic:
            al = adjusted_logits(logits[:, 0], sampling)
            key, sub = jax.random.split(key)
            nxt = jax.random.categorical(sub, al, -1).astype(jnp.int32)
            qprobs = jax.nn.softmax(al, axis=-1)
        else:
            nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            qprobs = jnp.zeros((B, logits.shape[-1]), jnp.float32)
        d_flat, _ = jax.tree_util.tree_flatten(dc)
        return (nxt, d_flat, key), (x, qprobs)

    key, dkey = jax.random.split(key)
    (_, d_flat, _), (fed, q) = jax.lax.scan(
        dstep, (pending, d_flat, dkey), length=W)
    seq = jnp.swapaxes(fed, 0, 1)                        # [B, W]: pending,
    # d_1..d_{W-1} — exactly the tokens fed to the draft, in order.
    q = jnp.swapaxes(q, 0, 1)                            # [B, W, V]:
    # q[:, t] is the draft's sampling distribution for slot t+1.

    # ---- one verification forward over all W tokens -----------------------
    positions = t_len[:, None] + ar                      # [B, W]
    logits, t_caches = model(params, seq, kv_caches=t_caches,
                             positions=positions)

    # ---- longest accepted draft prefix + correction/bonus -----------------
    if stochastic:
        p = jax.nn.softmax(adjusted_logits(logits, sampling), axis=-1)
        if W > 1:
            # accept d_{t+1} iff u*q(d) < p(d)  (== u < min(1, p/q))
            d_next = seq[:, 1:, None]
            p_d = jnp.take_along_axis(p[:, :-1], d_next, -1)[..., 0]
            q_d = jnp.take_along_axis(q[:, :-1], d_next, -1)[..., 0]
            key, sub = jax.random.split(key)
            u = jax.random.uniform(sub, (B, W - 1))
            match = (u * q_d < p_d).astype(jnp.int32)
            m = jnp.sum(jnp.cumprod(match, axis=1), axis=1)
        else:
            m = jnp.zeros((B,), jnp.int32)
        # replacement (rejection residual) or bonus (all accepted):
        # q at the bonus slot is zero, making the residual p itself.
        p_m = jnp.take_along_axis(
            p, m[:, None, None], axis=1)[:, 0]           # [B, V]
        q_m = jnp.take_along_axis(
            q, m[:, None, None], axis=1)[:, 0]
        q_m = jnp.where((m == W - 1)[:, None], 0.0, q_m)
        resid = jnp.maximum(p_m - q_m, 0.0)
        z = jnp.sum(resid, axis=-1, keepdims=True)
        resid = jnp.where(z > 0, resid / z, p_m)
        key, sub = jax.random.split(key)
        g_m = jax.random.categorical(
            sub, jnp.log(resid), axis=-1).astype(jnp.int32)[:, None]
    else:
        g = jnp.argmax(logits, axis=-1).astype(jnp.int32)    # [B, W]
        if W > 1:
            match = (g[:, :-1] == seq[:, 1:]).astype(jnp.int32)
            m = jnp.sum(jnp.cumprod(match, axis=1), axis=1)  # 0..W-1
        else:
            m = jnp.zeros((B,), jnp.int32)
        g_m = jnp.take_along_axis(g, m[:, None], axis=1)     # [B, 1]
    drafts = jnp.concatenate(
        [seq[:, 1:], jnp.zeros((B, 1), jnp.int32)], axis=1)
    emitted = jnp.where(ar < m[:, None], drafts,
                        jnp.where(ar == m[:, None], g_m, pad_id))

    # ---- O(1) rollback: keep keys only for the accepted prefix ------------
    # The draft caches carry the scan's KV writes — unflatten the POST-scan
    # d_flat (an earlier version re-flattened the stale pre-scan list,
    # silently zeroing every drafted token's KV).
    adv = jnp.where(active, m + 1, 0)
    t_caches = [dataclasses.replace(c, lengths=t_len + adv)
                for c in t_caches]
    d_caches = jax.tree_util.tree_unflatten(d_tree, d_flat)
    d_caches = [dataclasses.replace(c, lengths=l0 + adv)
                for c, l0 in zip(d_caches, d_len0)]
    return emitted, m, g_m[:, 0], t_caches, d_caches


def speculative_generate(
    model,
    params,
    draft_model,
    draft_params,
    prompt_ids: jax.Array,        # [B, Lp] int32, right-padded with pad_id
    prompt_lengths: jax.Array,    # [B] int32 true prompt lengths
    sampling: SamplingConfig,
    *,
    max_len: int,
    n_draft: int = 4,
    kv_quant: str = "none",
    draft_kv_quant: str = "none",
    pad_id: int = 0,
    key: jax.Array | None = None,
    return_stats: bool = False,
):
    """Speculative decode; returns (tokens [B, max_new_tokens],
    lengths-of-generation [B]) with the same contract as
    :func:`sampler.generate`.  With ``return_stats`` a third element
    ``{"rounds", "drafted", "accepted"}`` reports verification rounds and
    per-sequence draft acceptance — accepted/drafted is the acceptance
    rate that determines the speedup.

    ``n_draft`` is the number of tokens fed to the target per verification
    round (1 draft-model step fewer); ``n_draft=1`` degenerates to plain
    (non-speculative) decode through the verification path.  Both models
    must share the vocabulary.  ``max_len`` must leave ``n_draft`` slack
    beyond prompt + max_new_tokens (a round may briefly overshoot before
    rollback).
    """
    if n_draft < 1:
        raise ValueError("n_draft must be >= 1")
    stochastic = sampling.temperature > 0.0
    B, _ = prompt_ids.shape
    W = n_draft
    max_new = sampling.max_new_tokens
    eos = sampling.eos_id
    if key is None:
        key = jax.random.key(0)

    t_last, t_caches = prefill_prompt(
        model, params, prompt_ids, prompt_lengths,
        max_len=max_len, kv_quant=kv_quant)
    d_last, d_caches = prefill_prompt(
        draft_model, draft_params, prompt_ids, prompt_lengths,
        max_len=max_len, kv_quant=draft_kv_quant)
    del d_last  # the draft always continues from the target's tokens

    if stochastic:
        key, sub = jax.random.split(key)
        pending = jax.random.categorical(
            sub, adjusted_logits(t_last, sampling), axis=-1).astype(jnp.int32)
    else:
        pending = jnp.argmax(t_last, axis=-1).astype(jnp.int32)
    t_flat, t_tree = jax.tree_util.tree_flatten(t_caches)
    d_flat, d_tree = jax.tree_util.tree_flatten(d_caches)

    ar = jnp.arange(W, dtype=jnp.int32)[None, :]             # [1, W]
    b_idx = jnp.arange(B, dtype=jnp.int32)[:, None]

    def cond(state):
        out_n, done = state[4], state[5]
        return jnp.logical_not(
            jnp.all(jnp.logical_or(done, out_n >= max_new)))

    def body(state):
        (pending, t_flat, d_flat, out_tokens, out_n, done, key,
         rounds, drafted, accepted) = state
        t_caches = jax.tree_util.tree_unflatten(t_tree, t_flat)
        d_caches = jax.tree_util.tree_unflatten(d_tree, d_flat)
        # rows already done or out of budget neither emit nor advance
        active = jnp.logical_and(~done, out_n < max_new)

        key, sub = jax.random.split(key)
        emitted, m, g_m, t_caches, d_caches = speculative_round(
            model, params, draft_model, draft_params, sampling,
            t_caches, d_caches, pending, active, sub, W, pad_id)

        # ---- eos truncation, per-sequence output scatter ------------------
        is_eos = (emitted == eos)
        eos_before = jnp.cumsum(is_eos.astype(jnp.int32), axis=1) - is_eos
        keep = ((ar <= m[:, None]) & (eos_before == 0)
                & active[:, None] & (out_n[:, None] + ar < max_new))
        cols = jnp.where(keep, out_n[:, None] + ar, max_new)  # OOB -> drop
        out_tokens = out_tokens.at[b_idx, cols].set(
            jnp.where(keep, emitted, pad_id), mode="drop")
        n_emit = jnp.sum(keep.astype(jnp.int32), axis=1)
        out_n = out_n + n_emit
        new_done = jnp.logical_or(done, jnp.any(keep & is_eos, axis=1))

        t_flat, _ = jax.tree_util.tree_flatten(t_caches)
        d_flat, _ = jax.tree_util.tree_flatten(d_caches)
        pending = jnp.where(new_done, pad_id, g_m)
        rounds = rounds + 1
        drafted = drafted + jnp.where(active, W - 1, 0)
        accepted = accepted + jnp.where(active, m, 0)
        return (pending, t_flat, d_flat, out_tokens, out_n, new_done, key,
                rounds, drafted, accepted)

    # The round that produces a token emits it (g_m is both emitted and the
    # next round's ``pending``) — so the prefill's token is emitted here.
    out_tokens = jnp.full((B, max_new), pad_id, jnp.int32)
    if max_new > 0:
        out_tokens = out_tokens.at[:, 0].set(pending)
    out_n = jnp.full((B,), min(1, max_new), jnp.int32)
    done = jnp.logical_or(pending == eos, max_new <= 0)
    state = (pending, t_flat, d_flat, out_tokens, out_n, done, key,
             jnp.zeros((), jnp.int32), jnp.zeros((B,), jnp.int32),
             jnp.zeros((B,), jnp.int32))
    state = jax.lax.while_loop(cond, body, state)
    out_tokens, rounds, drafted, accepted = state[3], state[7], state[8], \
        state[9]
    # same return contract as sampler.generate
    n_gen = jnp.sum((out_tokens != pad_id).astype(jnp.int32), axis=-1)
    if return_stats:
        stats = {"rounds": rounds, "drafted": drafted, "accepted": accepted}
        return out_tokens, n_gen, stats
    return out_tokens, n_gen
