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


def _empty_partial(q):
    B, H, L, d = q.shape
    return (jnp.zeros((B, H, L, d), q.dtype),
            jnp.full((B, H, L), -jnp.inf, jnp.float32))


def _dist_partial(q, k, v, dist, is_past, *, impl, window, chunk_len):
    """Attention partial of local q against the KV chunk ``dist`` chunks in
    the past (``dist`` is STATIC — the ring/all-gather loops are python
    loops over distance, so every branch gets the kernel's static schedule).

    dist == 0 is the diagonal chunk (local causal + window); dist > 0 is a
    past chunk, expressed as causal with ``q_offset = dist * chunk_len`` —
    the offset makes the causal test vacuously true (no masks in the
    schedule, same cost as the non-causal kernel) while the window band, if
    any, lands exactly on the right global columns.  ``is_past`` (runtime
    bool) guards devices for which this distance wraps into the future.
    """
    if dist == 0:
        return _attention_with_lse(q, k, v, causal=True, impl=impl,
                                   window=window)

    def past(q, k, v):
        return _attention_with_lse(q, k, v, causal=True, impl=impl,
                                   window=window,
                                   q_offset=dist * chunk_len)

    def skip(q, k, v):
        return _empty_partial(q)

    return jax.lax.cond(is_past, past, skip, q, k, v)


def _window_steps(n, chunk_len, window):
    """Number of ring hops / distances with any in-window key: with a
    sliding window the ring TRUNCATES — chunks older than
    ceil(window / chunk_len) hops are behind every row's window, so neither
    their compute nor their communication happens at all."""
    if window is None:
        return n
    return min(n, -(-window // chunk_len) + 1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _attn_lse_pallas(q, k, v, causal, window, q_offset):
    out, lse, _ = flash_attention_forward(
        q, k, v, causal=causal, window=window, q_offset=q_offset)
    return out, lse


def _attn_lse_fwd(q, k, v, causal, window, q_offset):
    out, lse, _ = flash_attention_forward(
        q, k, v, causal=causal, window=window, q_offset=q_offset)
    return (out, lse), (q, k, v, out, lse)


def _attn_lse_bwd(causal, window, q_offset, residuals, cots):
    do, dlse = cots
    q, k, v, out, lse = residuals
    # The lse cotangent from the online-softmax merge folds into the same
    # backward kernels via a shifted D (see flash_attention_backward).
    dq, dk, dv = flash_attention_backward(
        q, k, v, out, lse, do, dlse, causal=causal, window=window,
        q_offset=q_offset)
    return dq, dk, dv


_attn_lse_pallas.defvjp(_attn_lse_fwd, _attn_lse_bwd)


def _attention_with_lse(q, k, v, *, causal, impl, window=None, q_offset=None):
    """(out, lse) of one chunk — differentiable (including through lse).

    ``q_offset``/``window``: the banded-mask form for windowed ring chunks
    (see flash_attention_forward).  The pallas path needs a custom VJP that
    accepts the lse cotangent; the "reference"/"xla" paths are pure jnp and
    differentiate natively.
    """
    if impl == "pallas":
        return _attn_lse_pallas(q, k, v, causal, window, q_offset)
    from tpu_flash.ops import reference as _ref
    from tpu_flash.ops.attention import _forward_impl
    if window is None and q_offset is None:
        out, lse, _ = _forward_impl(q, k, v, causal, impl)
        return out, lse
    # dense oracle form with explicit offset/window band
    off = (k.shape[-2] - q.shape[-2]) if q_offset is None else q_offset
    scale = _ref.default_scale(q.shape[-1])
    sc = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                    k.astype(jnp.float32)) * scale
    rows = jnp.arange(q.shape[-2])[:, None] + off
    cols = jnp.arange(k.shape[-2])[None, :]
    keep = (cols <= rows) if causal else jnp.ones_like(cols <= rows)
    if window is not None:
        keep &= cols > rows - window
    sc = jnp.where(keep, sc, -jnp.inf)
    lse = jax.scipy.special.logsumexp(sc, axis=-1)
    emptyrow = jnp.isneginf(lse)
    probs = jnp.where(emptyrow[..., None], 0.0,
                      jnp.exp(sc - jnp.where(emptyrow, 0.0, lse)[..., None]))
    out = jnp.einsum("bhqk,bhkd->bhqd", probs,
                     v.astype(jnp.float32)).astype(q.dtype)
    return out, lse


def allgather_attention(q, k, v, *, axis_name: str, impl: str = "pallas",
                        window: int | None = None):
    """Causal flash attention with the sequence sharded over ``axis_name``.

    Call inside ``jax.shard_map``; q, k, v are the local [B, H, L_loc, d]
    shards of a global causal attention over L_glob = L_loc * axis_size.
    K/V are all-gathered (tiled, one collective), then each device merges
    the partials of its in-range chunk DISTANCES (static python loop: the
    diagonal runs the local causal kernel, past chunks the offset-causal
    form — see _dist_partial).  ``window``: global sliding-window
    attention; distances beyond the window are never computed.
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    Lc = q.shape[-2]
    # [n, B, H, L_loc, d] — chunk c is the KV shard of device c.
    kg = jax.lax.all_gather(k, axis_name, axis=0, tiled=False)
    vg = jax.lax.all_gather(v, axis_name, axis=0, tiled=False)

    out = jnp.zeros_like(q)
    lse = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)
    for dist in range(_window_steps(n, Lc, window)):
        src = jnp.maximum(my - dist, 0)
        kc = jax.lax.dynamic_index_in_dim(kg, src, axis=0, keepdims=False)
        vc = jax.lax.dynamic_index_in_dim(vg, src, axis=0, keepdims=False)
        o_c, lse_c = _dist_partial(q, kc, vc, dist, my >= dist, impl=impl,
                                   window=window, chunk_len=Lc)
        out, lse = _merge_partials(out, lse, o_c, lse_c)
    return out


def ring_attention(q, k, v, *, axis_name: str, impl: str = "pallas",
                   window: int | None = None):
    """Ring flash attention: memory O(L_local), one ICI hop per step.

    Call inside ``jax.shard_map`` with q, k, v sequence-sharded over
    ``axis_name`` (global causal attention).  At step s each device holds
    the KV chunk of device (my - s) mod n — a STATIC distance s in the past
    for every non-wrapped device — and merges its partial; the next chunk
    travels one hop concurrently with the compute.

    ``window``: global sliding-window attention.  The ring TRUNCATES at
    ceil(window / L_local) + 1 hops (older chunks are behind every row's
    window), so long-context windowed training communicates and computes
    O(window), not O(L_global), per device.
    """
    n = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    Lc = q.shape[-2]
    perm = [(i, (i + 1) % n) for i in range(n)]  # send to the right
    steps = _window_steps(n, Lc, window)

    out = jnp.zeros_like(q)
    lse = jnp.full(q.shape[:-1], -jnp.inf, jnp.float32)
    k_cur, v_cur = k, v
    for s in range(steps):
        if s + 1 < steps:
            # Launch the next hop before computing so XLA can overlap the
            # ppermute with the flash kernel below.
            k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
            v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        # Devices with my < s hold a wrapped (future) chunk: skip.
        o_c, lse_c = _dist_partial(q, k_cur, v_cur, s, my >= s, impl=impl,
                                   window=window, chunk_len=Lc)
        out, lse = _merge_partials(out, lse, o_c, lse_c)
        if s + 1 < steps:
            k_cur, v_cur = k_nxt, v_nxt
    return out


def sequence_parallel_attention(
    q, k, v, *, axis_name: str, strategy: str = "allgather",
    impl: str = "pallas", window: int | None = None,
):
    """Dispatch helper: ``strategy`` in {"allgather", "ring"}."""
    if strategy == "allgather":
        return allgather_attention(q, k, v, axis_name=axis_name, impl=impl,
                                   window=window)
    if strategy == "ring":
        return ring_attention(q, k, v, axis_name=axis_name, impl=impl,
                              window=window)
    raise ValueError(f"unknown sequence-parallel strategy: {strategy}")
