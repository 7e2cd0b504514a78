"""KV-cache for incremental decode — a capability the reference lacks
entirely: its ``generate`` re-runs the full forward over the whole prefix for
every token (project/run_machine_translation.py:250-301, SURVEY.md §3.5), so
decode is O(L^2) per token.  This cache makes decode O(L) per token and is
the substrate for the quantized-KV decode path.

Design:
  * fixed ``max_len`` buffers (static shapes — one compile);
  * HEADS-MINOR storage ``[B, max_len, H*d]``: appending a step's KV is one
    contiguous row write, and the flash-decode kernel streams fully
    contiguous ``[block_s, H*d]`` tiles at the chip's spec HBM rate
    (~820 GB/s vs ~380 for the old ``[B, H, max_len, d]`` stripes —
    measured 1.96x decode, bench/exp_decode_hm.py);
  * per-sequence ``lengths`` [B] so batches can be ragged (the unit of
    continuous batching);
  * pluggable storage dtype: fp32/bf16 (plain), int8 or fp8(e4m3) with
    per-(batch, head, position) scales ``[B, H, max_len]`` (positions in
    the minor/lane axis, matching the kernel's [rows, positions] score
    layout) — dequantized on read.

Registered as a pytree so caches flow through jit/scan/pjit.
"""

from __future__ import annotations

import dataclasses
from typing import Literal

import jax
import jax.numpy as jnp

# once-per-process guard for the fp8-is-slower advisory (ADVICE r4)
_FP8_WARNED = False

QuantMode = Literal["none", "int8", "fp8"]

_INT8_MAX = 127.0
_FP8_MAX = 448.0  # max normal of float8_e4m3fn


def _quantize(x: jax.Array, mode: QuantMode):
    """Per-(…, position) symmetric quantization over the head_dim (minor)
    axis.  Returns (codes like x, scales x.shape[:-1])."""
    if mode == "none":
        return x, None
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    if mode == "int8":
        scale = amax / _INT8_MAX
        safe = jnp.where(scale == 0.0, 1.0, scale)
        codes = jnp.clip(jnp.round(x / safe), -127, 127).astype(jnp.int8)
    elif mode == "fp8":
        scale = amax / _FP8_MAX
        safe = jnp.where(scale == 0.0, 1.0, scale)
        codes = (x / safe).astype(jnp.float8_e4m3fn)
    else:
        raise ValueError(mode)
    return codes, scale.astype(jnp.float32)[..., 0]


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class KVCache:
    """Single-layer cache: k/v of shape [B, max_len, H*d] (heads-minor
    codes) plus optional scales [B, H, max_len] (positions minor) and
    per-sequence lengths [B]."""

    k: jax.Array                       # [B, max_len, H*d] codes/values
    v: jax.Array
    k_scale: jax.Array | None          # [B, H, max_len] (positions minor)
    v_scale: jax.Array | None
    lengths: jax.Array                 # [B] int32: tokens already cached
    quant: str = "none"
    compute_dtype: object = jnp.float32
    # KV heads (static).  Required: the fused [B, max_len, H*d] layout is
    # uninterpretable without it, so omitting it must fail loudly rather
    # than silently de-interleave with H=1.
    n_head: int = dataclasses.field(kw_only=True)

    # -- pytree protocol ----------------------------------------------------
    def tree_flatten(self):
        children = (self.k, self.v, self.k_scale, self.v_scale, self.lengths)
        aux = (self.quant, self.compute_dtype, self.n_head)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        k, v, ks, vs, lengths = children
        quant, compute_dtype, n_head = aux
        return cls(k, v, ks, vs, lengths, quant, compute_dtype,
                   n_head=n_head)

    # -- construction -------------------------------------------------------
    @classmethod
    def create(cls, batch: int, n_head: int, max_len: int, head_dim: int,
               *, quant: QuantMode = "none", compute_dtype=jnp.float32):
        if quant == "none":
            store_dtype = compute_dtype
            scales = None
        elif quant == "int8":
            store_dtype = jnp.int8
            scales = jnp.zeros((batch, n_head, max_len), jnp.float32)
        elif quant == "fp8":
            # Measured recommendation (bench/bench_decode_model.py,
            # 2026-08-20, post tile-halving fix): fp8 decodes at 5.60
            # ms/step vs int8's 4.19 and bf16's 4.59 at the production
            # config — the e4m3 bit-reconstruction cast stays costlier
            # than the int8 cast and there is no BLEU gap between the two
            # (RESULTS.md).  fp8 remains supported for cache-size parity
            # experiments; int8 is the speed choice at the same footprint.
            # Emitted ONCE per process (ADVICE r4: a per-construction
            # warning was noisy and broke warnings-as-errors configs that
            # legitimately compare formats).
            global _FP8_WARNED
            if not _FP8_WARNED:
                _FP8_WARNED = True
                import warnings
                warnings.warn(
                    "fp8 KV-cache decode is measured SLOWER than int8 at "
                    "the same memory footprint (5.60 vs 4.19 ms/step at "
                    "the production config) with no quality gap — prefer "
                    "quant='int8' unless comparing formats",
                    stacklevel=2)
            store_dtype = jnp.float8_e4m3fn
            scales = jnp.zeros((batch, n_head, max_len), jnp.float32)
        else:
            raise ValueError(quant)
        shape = (batch, max_len, n_head * head_dim)
        return cls(
            k=jnp.zeros(shape, store_dtype),
            v=jnp.zeros(shape, store_dtype),
            k_scale=scales,
            v_scale=scales,
            lengths=jnp.zeros((batch,), jnp.int32),
            quant=quant,
            compute_dtype=compute_dtype,
            n_head=n_head,
        )

    @property
    def max_len(self) -> int:
        return self.k.shape[1]

    @property
    def head_dim(self) -> int:
        return self.k.shape[2] // self.n_head

    # -- update / read ------------------------------------------------------
    def update(self, k_new: jax.Array, v_new: jax.Array):
        """Append k_new/v_new [B, H, Lnew, d] at each sequence's current
        length.  Returns (k_full, v_full, new_cache) where k_full/v_full are
        dequantized [B, H, max_len, d] buffers (positions beyond a sequence's
        new length are stale/zero — mask at attention time)."""
        B, H, Lnew, d = k_new.shape

        kq, ks = _quantize(k_new, self.quant)   # codes [B,H,Lnew,d] / [B,H,Lnew]
        vq, vs = _quantize(v_new, self.quant)
        kq = kq.transpose(0, 2, 1, 3).reshape(B, Lnew, H * d)
        vq = vq.transpose(0, 2, 1, 3).reshape(B, Lnew, H * d)

        def upd(buf, val, start):
            # buf [max_len, H*d], val [Lnew, H*d] — one contiguous row write
            return jax.lax.dynamic_update_slice(buf, val, (start, 0))

        def upd_scale(buf, val, start):
            # buf [H, max_len], val [H, Lnew] — positions minor
            return jax.lax.dynamic_update_slice(buf, val, (0, start))

        k = jax.vmap(upd)(self.k, kq, self.lengths)
        v = jax.vmap(upd)(self.v, vq, self.lengths)
        if self.quant == "none":
            k_scale, v_scale = None, None
        else:
            k_scale = jax.vmap(upd_scale)(self.k_scale, ks, self.lengths)
            v_scale = jax.vmap(upd_scale)(self.v_scale, vs, self.lengths)

        new = KVCache(k, v, k_scale, v_scale, self.lengths + Lnew,
                      self.quant, self.compute_dtype, n_head=self.n_head)
        return new.read_k(), new.read_v(), new

    def append(self, k_new: jax.Array, v_new: jax.Array) -> "KVCache":
        """Like :meth:`update` but returns only the new cache — the decode
        kernel consumes the quantized heads-minor codes directly, so no
        dequantized full buffers are materialized."""
        _, _, new = self.update(k_new, v_new)
        return new

    def _read(self, codes, scales) -> jax.Array:
        """Dequantize + de-interleave to the [B, H, max_len, d] view used by
        the multi-token prefill path."""
        B, S, HD = codes.shape
        H = self.n_head
        x = codes.reshape(B, S, H, HD // H).transpose(0, 2, 1, 3)
        if scales is None:
            return x.astype(self.compute_dtype)
        return (x.astype(jnp.float32)
                * scales[..., None]).astype(self.compute_dtype)

    def read_k(self) -> jax.Array:
        return self._read(self.k, self.k_scale)

    def read_v(self) -> jax.Array:
        return self._read(self.v, self.v_scale)

    def attention_mask(self, n_queries: int) -> jax.Array:
        """Additive mask [B, n_queries, max_len]: query i (the i-th of the
        ``n_queries`` newest tokens) attends cache positions
        ``<= lengths - n_queries + i`` (lengths counted *after* update)."""
        pos = jnp.arange(self.max_len, dtype=jnp.int32)[None, None, :]
        qidx = jnp.arange(n_queries, dtype=jnp.int32)[None, :, None]
        limit = (self.lengths[:, None, None] - n_queries) + qidx
        return jnp.where(pos <= limit, 0.0, -1e7).astype(jnp.float32)
