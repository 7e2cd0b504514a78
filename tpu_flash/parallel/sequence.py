"""Sequence/context parallelism: attention over a sequence-sharded mesh axis.

The reference has no distributed features at all (SURVEY.md §2.4); its only
long-context mechanism is the flash tiling itself (§5.7).  This module is the
TPU-native scale-out of that tiling across chips: the sequence axis is
sharded over a mesh axis and the *chunk* level of the flash decomposition
runs across devices, while the *tile* level inside each chunk stays in the
Pallas kernels (kernels/flash_attention.py).

Two strategies, both numerically identical to single-device flash attention:

* ``allgather_attention`` — Megatron-style context parallelism: K/V are
  all-gathered over the sequence axis (one fused ICI collective), each device
  computes flash attention of its local Q chunk against every KV chunk, and
  the per-chunk partials are merged with the online-softmax rule.  Simple,
  one collective, memory O(L_global) for K/V during attention.

* ``ring_attention`` — K/V chunks travel around the ring via
  ``jax.lax.ppermute`` (one hop per step, bandwidth-optimal, memory
  O(L_local)); compute overlaps the permute because each step's flash call
  only depends on the chunk received in the previous step.

Causality is resolved at chunk granularity with ``lax.switch`` on the
(dynamic) chunk-pair relation: a KV chunk strictly below the diagonal needs
the plain non-causal kernel, the diagonal chunk needs the local causal
kernel, and chunks above the diagonal are skipped (their partial has
``lse = -inf``).  This keeps the per-chunk kernels on their fast static
schedules — no dynamic-offset masking inside the kernel.

Both are differentiable: the merge is plain jnp, the per-chunk kernels carry
their custom VJPs, and jax transposes ``all_gather``/``ppermute`` to
``psum_scatter``/reverse-``ppermute``.  Wrap the caller in ``jax.checkpoint``
to recompute chunks instead of saving every (out, lse) partial.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpu_flash.kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_forward,
)


def _merge_partials(o1, lse1, o2, lse2):
    """Online-softmax merge of two attention partials.

    Each partial is (out [B,H,L,d], lse [B,H,L]) over disjoint key sets;
    the merged pair equals attention over the union.  ``lse = -inf`` marks
    an empty partial (skipped chunk) and is absorbed exactly.
    """
    m = jnp.maximum(lse1, lse2)
    # Both -inf (no keys at all): keep weights 0, output 0, lse -inf.
    m_safe = jnp.where(jnp.isneginf(m), 0.0, m)
    w1 = jnp.where(jnp.isneginf(lse1), 0.0, jnp.exp(lse1 - m_safe))
    w2 = jnp.where(jnp.isneginf(lse2), 0.0, jnp.exp(lse2 - m_safe))
    denom = w1 + w2
    denom_safe = jnp.where(denom == 0.0, 1.0, denom)
    o = (o1.astype(jnp.float32) * w1[..., None]
         + o2.astype(jnp.float32) * w2[..., None]) / denom_safe[..., None]
    lse = m + jnp.log(denom_safe)  # -inf + 0 stays -inf when both empty
    return o.astype(o1.dtype), lse


def _chunk_partial(q, kv_chunk, rel, *, impl):
    """Attention partial of local q against one KV chunk.

    ``rel``: +1 = chunk strictly in the past (full attention), 0 = diagonal
    chunk (local causal), -1 = future chunk (skip).  Runtime value; all three
    branches have static shapes so this lowers to a ``lax.switch``.
    """
    k, v = kv_chunk

    def full(q, k, v):
        return _attention_with_lse(q, k, v, causal=False, impl=impl)

    def diag(q, k, v):
        return _attention_with_lse(q, k, v, causal=True, impl=impl)

    def skip(q, k, v):
        B, H, L, d = q.shape
        return (jnp.zeros((B, H, L, d), q.dtype),
                jnp.full((B, H, L), -jnp.inf, jnp.float32))

    return jax.lax.switch(rel + 1, (skip, diag, full), q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attn_lse_pallas(q, k, v, causal):
    out, lse, _ = flash_attention_forward(q, k, v, causal=causal)
    return out, lse


def _attn_lse_fwd(q, k, v, causal):
    out, lse, _ = flash_attention_forward(q, k, v, causal=causal)
    return (out, lse), (q, k, v, out, lse)


def _attn_lse_bwd(causal, residuals, cots):
    do, dlse = cots
    q, k, v, out, lse = residuals
    # The lse cotangent from the online-softmax merge folds into the same
    # backward kernels via a shifted D (see flash_attention_backward).
    dq, dk, dv = flash_attention_backward(
        q, k, v, out, lse, do, dlse, causal=causal)
    return dq, dk, dv


_attn_lse_pallas.defvjp(_attn_lse_fwd, _attn_lse_bwd)


def _attention_with_lse(q, k, v, *, causal, impl):
    """(out, lse) of one chunk — differentiable (including through lse).

    The pallas path needs a custom VJP that accepts the lse cotangent; the
    "reference"/"xla" paths are pure jnp and differentiate natively.
    """
    if impl == "pallas":
        return _attn_lse_pallas(q, k, v, causal)
    from tpu_flash.ops.attention import _forward_impl
    out, lse, _ = _forward_impl(q, k, v, causal, impl)
    return out, lse


def allgather_attention(q, k, v, *, axis_name: str, impl: str = "pallas"):
    """Causal flash attention with the sequence sharded over ``axis_name``.

    Call inside ``jax.shard_map``; q, k, v are the local [B, H, L_loc, d]
    shards of a global causal attention over L_glob = L_loc * axis_size.
    K/V are all-gathered (tiled, one collective), then each past chunk is
    processed with the non-causal kernel, the diagonal chunk with the local
    causal kernel, and future chunks are skipped.
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    # [n, B, H, L_loc, d] — chunk c is the KV shard of device c.
    kg = jax.lax.all_gather(k, axis_name, axis=0, tiled=False)
    vg = jax.lax.all_gather(v, axis_name, axis=0, tiled=False)

    out = jnp.zeros_like(q)
    lse = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)
    for c in range(n):
        rel = jnp.sign(my - c)  # +1 past, 0 diagonal, -1 future
        o_c, lse_c = _chunk_partial(q, (kg[c], vg[c]), rel, impl=impl)
        out, lse = _merge_partials(out, lse, o_c, lse_c)
    return out


def ring_attention(q, k, v, *, axis_name: str, impl: str = "pallas"):
    """Ring flash attention: memory O(L_local), one ICI hop per step.

    Call inside ``jax.shard_map`` with q, k, v sequence-sharded over
    ``axis_name`` (global causal attention).  At step s each device holds the
    KV chunk of device (my - s) mod n and merges its partial; the next
    chunk travels one hop concurrently with the compute.
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % n) for i in range(n)]  # send to the right

    out = jnp.zeros_like(q)
    lse = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)
    k_cur, v_cur = k, v
    for s in range(n):
        # Chunk currently held came from device (my - s) mod n.
        src = (my - s) % n
        if s + 1 < n:
            # Launch the next hop before computing so XLA can overlap the
            # ppermute with the flash kernel below.
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        if s == 0:
            # The local chunk is always the diagonal: static fast path.
            o_c, lse_c = _attention_with_lse(
                q, k_cur, v_cur, causal=True, impl=impl)
        else:
            rel = jnp.sign(my - src)  # +1 past chunk, -1 future chunk
            o_c, lse_c = _chunk_partial(q, (k_cur, v_cur), rel, impl=impl)
        out, lse = _merge_partials(out, lse, o_c, lse_c)
        if s + 1 < n:
            k_cur, v_cur = k_nxt, v_nxt
    return out


def sequence_parallel_attention(
    q, k, v, *, axis_name: str, strategy: str = "allgather",
    impl: str = "pallas",
):
    """Dispatch helper: ``strategy`` in {"allgather", "ring"}."""
    if strategy == "allgather":
        return allgather_attention(q, k, v, axis_name=axis_name, impl=impl)
    if strategy == "ring":
        return ring_attention(q, k, v, axis_name=axis_name, impl=impl)
    raise ValueError(f"unknown sequence-parallel strategy: {strategy}")
