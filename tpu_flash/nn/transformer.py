"""Pre-LN decoder-only transformer — the analog of
minitorch/modules_transfomer.py (MultiHeadAttention, FeedForward,
TransformerLayer, DecoderLM).

Architecture parity with the reference:
  * MHA: separate q/k/v/out projections of size n_embd -> n_embd with bias
    (modules_transfomer.py:52-56); scores scaled by 1/sqrt(attn_hidden_dim);
    three attention paths selected by flags — flash kernel, fused-softmax
    kernel, or naive composed graph (modules_transfomer.py:119-137);
    attention-matrix dropout is declared but never applied in the reference's
    forward — preserved (no attention dropout);
  * FeedForward: Linear -> tanh-GELU -> dropout -> Linear, middle_dim=256
    (modules_transfomer.py:161-203);
  * TransformerLayer: pre-LN, ``x + attn(ln1(x))`` then ``out + ff(ln2(out))``
    (modules_transfomer.py:240-252), LayerNorm fused-switchable;
  * DecoderLM: token + position embeddings, dropout, n_layer transformer
    layers (4 in the reference), final LayerNorm, lm_head
    (modules_transfomer.py:255-358).

Deliberate fixes/extensions over the reference: position_embeddings is sized
``n_positions`` (the reference sizes it ``n_vocab``,
modules_transfomer.py:297 — a latent bug); ``n_layer`` is configurable; the
layer stack can run under ``jax.lax.scan`` with ``jax.checkpoint``
(rematerialization) for long-sequence training; attention accepts an optional
KV-cache for incremental decode (the reference has none, SURVEY.md §3.5).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Literal

import jax
import jax.numpy as jnp

from tpu_flash.nn import functional as F
from tpu_flash.nn.layers import Dropout, Embedding, LayerNorm, Linear
from tpu_flash.nn.module import Module, ModuleList, Params
from tpu_flash.nn.moe import MoEConfig, MoEFeedForward
from tpu_flash.ops import attn_softmax, flash_attention
from tpu_flash.ops.reference import causal_mask

AttentionKind = Literal["flash", "fused", "naive", "auto"]

# "auto" dispatch: the Pallas flash kernel pays off once the sequence is
# long enough to amortize its fixed pipeline overheads; below that the XLA
# naive graph (fully fused by the compiler, scores materialized) is faster
# on TPU.  Round-2 sweep over the full (L, d, dtype) grid
# (bench/sweep_auto.py, RESULTS.md): the crossover sits between L=512 and
# L=1024 for EVERY head dim (32/64/128) and both dtypes — flash's
# small-L cost is a fixed ~50 us floor (kernel dispatch + pipeline
# prologue), so the threshold keys on L alone, not L*d (round 1's L*d rule
# was calibrated from two points and misclassified both L=512/d=128 —
# naive wins 2x — and L=1024/d=32 — flash wins).
_FLASH_AUTO_MIN_L = 1024


@dataclasses.dataclass
class DecoderConfig:
    """Single dataclass config (replaces the reference's fire/argparse flag
    threading, SURVEY.md §5.6)."""

    n_vocab: int = 10_000
    n_embd: int = 256
    n_head: int = 8
    n_kv_head: int | None = None                  # GQA/MQA (None = MHA)
    positional: Literal["learned", "rope", "none"] = "learned"
    n_positions: int = 1024
    n_layer: int = 4
    ff_middle_dim: int = 256
    p_dropout: float = 0.1
    ln_eps: float = 1e-5
    bias: bool = True
    causal: bool = True
    attention_kind: AttentionKind = "flash"       # use_flash_attention
    attn_dropout: float = 0.0                     # in-kernel attention dropout
    window: int | None = None                     # sliding-window attention
    # Quantized-KV TRAINING attention (BASELINE measured config 4): K/V are
    # quantized per-(batch, head, position) and both the forward and the
    # backward recompute consume the codes; residual memory halves (bf16)
    # or quarters (fp32).  Requires the flash path (ops/attention.py).
    kv_quant: Literal["none", "int8", "fp8",
                      "int8_channel", "fp8_channel"] = "none"
    use_fused_kernel: bool = False                # fused softmax + LN switch
    dtype: Any = jnp.float32
    # TPU-first extras
    remat: bool = False                           # jax.checkpoint per layer
    embedding_one_hot: bool = False               # reference parity path
    moe: MoEConfig | None = None                  # routed FFN (expert par.)
    sequence_parallel: bool = False               # Megatron-SP activations

    def __post_init__(self):
        if self.n_embd % self.n_head:
            raise ValueError(
                f"n_embd ({self.n_embd}) must divide by n_head "
                f"({self.n_head})")
        if self.n_kv_head is not None and self.n_head % self.n_kv_head:
            raise ValueError(
                f"n_head ({self.n_head}) must be a multiple of n_kv_head "
                f"({self.n_kv_head})")
        if self.window is not None:
            # Validate here so every attention path (flash raises, but the
            # naive/fused dense paths would otherwise silently ignore the
            # window for non-causal models) behaves identically.
            if not self.causal:
                raise ValueError("window requires causal=True")
            if self.window < 1:
                raise ValueError(
                    f"window must be >= 1 (got {self.window}); use "
                    f"window=None to disable sliding-window attention")
        if self.kv_quant not in ("none", "int8", "fp8",
                                 "int8_channel", "fp8_channel"):
            raise ValueError(
                f"kv_quant must be 'none', 'int8', 'fp8', 'int8_channel' "
                f"or 'fp8_channel', got {self.kv_quant!r}")
        if self.kv_quant != "none" and self.attention_kind in (
                "fused", "naive"):
            raise ValueError(
                "kv_quant requires the flash attention path (got "
                f"attention_kind={self.attention_kind!r}); the dense graphs "
                "have no quantized-KV form")

    @property
    def attn_hidden_dim(self) -> int:
        return self.n_embd // self.n_head

    @property
    def kv_heads(self) -> int:
        """Number of KV heads: grouped-query attention shares each KV head
        across ``n_head // n_kv_head`` query heads (new capability — the
        reference is MHA-only); defaults to MHA."""
        return self.n_kv_head or self.n_head


class MultiHeadAttention(Module):
    def __init__(self, cfg: DecoderConfig):
        self.cfg = cfg
        c = cfg
        kv_dim = c.kv_heads * c.attn_hidden_dim
        self.q_projection = Linear(c.n_embd, c.n_embd, c.bias, c.dtype)
        self.k_projection = Linear(c.n_embd, kv_dim, c.bias, c.dtype)
        self.v_projection = Linear(c.n_embd, kv_dim, c.bias, c.dtype)
        self.out_projection = Linear(c.n_embd, c.n_embd, c.bias, c.dtype)

    def project_to_query_key_value(self, params, x):
        """x [B, L, E] -> q, k, v [B, H, L, dh] (modules_transfomer.py:68-89;
        unlike the reference, K is never pre-transposed — the kernels take
        [B, H, L, d] uniformly)."""
        B, L, E = x.shape
        c = self.cfg
        def split(y, heads):
            return y.reshape(B, L, heads, c.attn_hidden_dim
                             ).transpose(0, 2, 1, 3)
        q = split(self.q_projection(params["q_projection"], x), c.n_head)
        k = split(self.k_projection(params["k_projection"], x), c.kv_heads)
        v = split(self.v_projection(params["v_projection"], x), c.kv_heads)
        return q, k, v

    def self_attention(self, q, k, v, *, kv_mask=None, segment_ids=None,
                       key=None, training=False):
        """The three-path attention dispatch (modules_transfomer.py:119-137),
        plus "auto" (size-based kernel-vs-XLA choice).

        ``attn_dropout`` (training only) runs attention dropout on every
        path — the reference declares it but never applies it
        (modules_transfomer.py:56); here the flash path uses the in-kernel
        hash mask and the naive/fused dense paths apply the SAME hash mask
        to the materialized probabilities, all seeded from the step key.
        """
        c = self.cfg
        kind = c.attention_kind
        if kind == "auto":
            if c.kv_quant != "none" and q.shape[-2] < _FLASH_AUTO_MIN_L:
                # Below the measured flash crossover, quantized-KV training
                # runs the dense XLA path on straight-through dequantized
                # K/V — the same codes/scales math as the kernel path
                # (ops/attention._quantize_kv), so loss and gradients match
                # the kernel form within quantization noise while keeping
                # the naive path's small-L speed win (flash is 0.66x at
                # reference scale, bench/sweep_auto.py).
                from tpu_flash.ops.attention import (
                    _quantize_kv, dequantize_kv)

                def st(x):
                    codes, scales = _quantize_kv(x, c.kv_quant)
                    dq = dequantize_kv(codes, scales,
                                       c.kv_quant).astype(x.dtype)
                    return x + jax.lax.stop_gradient(dq - x)

                k, v = st(k), st(v)
                kind = "naive"
            else:
                kind = ("flash" if c.kv_quant != "none"
                        or q.shape[-2] >= _FLASH_AUTO_MIN_L else "naive")
        if kind != "flash" and k.shape[1] != q.shape[1]:
            # GQA: the dense [B, H, L, d] paths repeat each KV head across
            # its query group; the flash kernel (like the decode kernel)
            # handles groups natively via its K/V index maps — no repeat,
            # 1/g the KV traffic.
            g = q.shape[1] // k.shape[1]
            k = jnp.repeat(k, g, axis=1)
            v = jnp.repeat(v, g, axis=1)
        dropping = training and c.attn_dropout > 0.0 and key is not None
        if dropping:
            seed = jax.random.randint(
                key, (), 0, jnp.iinfo(jnp.int32).max, jnp.int32)
        if kind == "flash":
            if dropping:
                return flash_attention(
                    q, k, v, causal=c.causal, window=c.window,
                    segment_ids=segment_ids, kv_quant=c.kv_quant,
                    dropout_rate=c.attn_dropout, dropout_seed=seed)
            return flash_attention(q, k, v, causal=c.causal,
                                   window=c.window, segment_ids=segment_ids,
                                   kv_quant=c.kv_quant)
        scale = 1.0 / math.sqrt(c.attn_hidden_dim)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
        if kind == "fused":
            if c.window is not None:
                raise NotImplementedError(
                    "window is not expressible in the fused attn_softmax "
                    "kernel's [B, Lk] mask; use flash or naive")
            if segment_ids is not None:
                raise NotImplementedError(
                    "segment_ids is not expressible in the fused "
                    "attn_softmax kernel's [B, Lk] mask; use flash or naive")
            p = attn_softmax(s, kv_mask, mask_future=c.causal)
        else:
            if c.causal:
                s = s + causal_mask(q.shape[-2], k.shape[-2], s.dtype)
                if c.window is not None:
                    from tpu_flash.ops.reference import window_mask

                    s = s + window_mask(q.shape[-2], k.shape[-2], c.window,
                                        s.dtype)
            if segment_ids is not None:
                from tpu_flash.ops.reference import apply_segment_mask

                s = apply_segment_mask(s, segment_ids)
            if kv_mask is not None:
                s = s + kv_mask[:, None, None, :].astype(s.dtype)
            p = F.softmax(s, axis=-1)
        if dropping:
            from tpu_flash.ops.reference import dropout_keep_oracle

            p = p * dropout_keep_oracle(
                q.shape[0], q.shape[1], q.shape[2], k.shape[2], seed,
                c.attn_dropout).astype(p.dtype)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v)

    def _cached_attention(self, q, cache):
        """Decode-path attention over the cache.

        Single-token steps — and small multi-token steps (speculative-
        verification windows, Lq <= 8) — route through the Pallas
        flash-decode kernel, which streams the (possibly int8/fp8-
        quantized) cache codes from HBM ONCE with dequant fused in VMEM
        and takes per-sequence lengths via scalar prefetch
        (kernels/decode.py).  Longer multi-token prefill uses the XLA
        composed graph with the cache's dynamic-length mask.
        """
        from tpu_flash.kernels.decode import flash_decode_attention
        from tpu_flash.parallel.context import current_context

        c = self.cfg
        ctx = current_context()
        if q.shape[2] <= 8:
            if ctx is None:
                return flash_decode_attention(
                    q, cache.k, cache.v, cache.lengths,
                    cache.k_scale, cache.v_scale, window=c.window)
            Hkv = cache.n_head
            if (q.shape[0] % ctx.data_size == 0
                    and q.shape[1] % ctx.model_size == 0
                    and Hkv % ctx.model_size == 0):
                # Tensor-parallel decode: heads sharded over the model axis,
                # sequences over data; the kernel runs per-shard inside
                # shard_map (GSPMD cannot partition a pallas_call), so the
                # tensor-sharded KV-cache never leaves its chip.  The
                # heads-minor cache shards its fused H*d axis — head stripes
                # are contiguous, so Hkv % model == 0 keeps shards aligned.
                from jax.sharding import PartitionSpec as P

                qspec = P(ctx.data_axis, ctx.model_axis, None, None)
                kvspec = P(ctx.data_axis, None, ctx.model_axis)
                sspec = P(ctx.data_axis, ctx.model_axis, None)
                lspec = P(ctx.data_axis)
                if cache.k_scale is None:
                    fn = jax.shard_map(
                        lambda q, k, v, ln: flash_decode_attention(
                            q, k, v, ln, window=c.window),
                        mesh=ctx.mesh,
                        in_specs=(qspec, kvspec, kvspec, lspec),
                        out_specs=qspec, check_vma=False)
                    return fn(q, cache.k, cache.v, cache.lengths)
                fn = jax.shard_map(
                    lambda q, k, v, ln, ks, vs: flash_decode_attention(
                        q, k, v, ln, ks, vs, window=c.window),
                    mesh=ctx.mesh,
                    in_specs=(qspec, kvspec, kvspec, lspec, sspec, sspec),
                    out_specs=qspec, check_vma=False)
                return fn(q, cache.k, cache.v, cache.lengths,
                          cache.k_scale, cache.v_scale)
        scale = 1.0 / math.sqrt(c.attn_hidden_dim)
        k_full, v_full = cache.read_k(), cache.read_v()
        if k_full.shape[1] != q.shape[1]:   # GQA prefill: expand KV groups
            g = q.shape[1] // k_full.shape[1]
            k_full = jnp.repeat(k_full, g, axis=1)
            v_full = jnp.repeat(v_full, g, axis=1)
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k_full) * scale
        s = s + cache.attention_mask(q.shape[2])[:, None, :, :].astype(s.dtype)
        if c.window is not None:
            # absolute query positions: this step's tokens end at lengths-1
            Lq_, S_ = q.shape[2], k_full.shape[2]
            qpos = (cache.lengths[:, None] - Lq_
                    + jnp.arange(Lq_, dtype=jnp.int32)[None, :])  # [B, Lq]
            kpos = jnp.arange(S_, dtype=jnp.int32)
            band = kpos[None, None, :] > (qpos[:, :, None] - c.window)
            s = s + jnp.where(band, 0.0, -1e9)[:, None, :, :].astype(s.dtype)
        p = F.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v_full)

    def __call__(self, params: Params, x: jax.Array, *,
                 kv_cache=None, kv_mask=None, positions=None,
                 segment_ids=None, key=None, training: bool = False):
        B, L, E = x.shape
        c = self.cfg
        if segment_ids is not None and kv_cache is not None:
            raise NotImplementedError(
                "segment_ids (packed training) is not supported on the "
                "cached decode path")
        q, k, v = self.project_to_query_key_value(params, x)
        if c.positional == "rope":
            if positions is None:
                positions = jnp.broadcast_to(
                    jnp.arange(L, dtype=jnp.int32)[None, :], (B, L))
            q = F.apply_rope(q, positions)
            k = F.apply_rope(k, positions)   # cache stores rotated keys
        if kv_cache is not None:
            # Incremental decode: append this step's k/v into the cache and
            # attend over the full prefix (new capability vs the reference).
            kv_cache = kv_cache.append(k, v)
            out = self._cached_attention(q, kv_cache)
            out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
            out = self.out_projection(params["out_projection"], out)
            return out, kv_cache
        out = self.self_attention(q, k, v, kv_mask=kv_mask,
                                  segment_ids=segment_ids, key=key,
                                  training=training)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, E)
        return self.out_projection(params["out_projection"], out)


class FeedForward(Module):
    def __init__(self, cfg: DecoderConfig):
        self.cfg = cfg
        self.linear_in = Linear(cfg.n_embd, cfg.ff_middle_dim, cfg.bias, cfg.dtype)
        self.linear_out = Linear(cfg.ff_middle_dim, cfg.n_embd, cfg.bias, cfg.dtype)
        self.dropout = Dropout(cfg.p_dropout)

    def __call__(self, params: Params, x: jax.Array, *,
                 key=None, training: bool = False):
        x = self.linear_in(params["linear_in"], x)
        x = F.gelu(x)
        x = self.dropout({}, x, key=key, training=training)
        return self.linear_out(params["linear_out"], x)


def _sequence_shard(x: jax.Array) -> jax.Array:
    """Megatron-style sequence-parallel activation constraint.

    Under tensor parallelism the residual stream and its LN/dropout
    segments are replicated on every model shard; Megatron-LM's sequence
    parallelism (Korthikanti et al. 2022) instead shards them over the TP
    axis along the SEQUENCE dim.  TPU-natively that is one GSPMD
    annotation: constraining [B, L, E] activations to
    P(data, model, None) makes XLA replace each TP all-reduce (the
    out-projection / FF partial sums) with a reduce-scatter here and an
    all-gather at the next TP block's input — the same bytes as the
    all-reduce they replace, while LN/dropout/residual compute and
    activation memory drop to 1/tp per shard.  No-op without an active
    context, with model_size 1, or when shapes don't divide the mesh."""
    from tpu_flash.parallel.context import current_context

    ctx = current_context()
    if (ctx is None or ctx.model_size == 1 or x.ndim != 3
            or x.shape[0] % ctx.data_size
            or x.shape[1] % ctx.model_size):
        return x
    return jax.lax.with_sharding_constraint(
        x, ctx.sharding(ctx.data_axis, ctx.model_axis, None))


class TransformerLayer(Module):
    def __init__(self, cfg: DecoderConfig):
        self.cfg = cfg
        self.ln_1 = LayerNorm(cfg.n_embd, cfg.ln_eps, fused=cfg.use_fused_kernel, dtype=cfg.dtype)
        self.ln_2 = LayerNorm(cfg.n_embd, cfg.ln_eps, fused=cfg.use_fused_kernel, dtype=cfg.dtype)
        self.attention = MultiHeadAttention(cfg)
        if cfg.moe is not None:
            self.ff = MoEFeedForward(
                cfg.n_embd, cfg.ff_middle_dim, cfg.moe, cfg.dtype,
                p_dropout=cfg.p_dropout)
        else:
            self.ff = FeedForward(cfg)

    def __call__(self, params: Params, x: jax.Array, *,
                 kv_cache=None, kv_mask=None, positions=None,
                 segment_ids=None, key=None, training: bool = False):
        k1, k2 = (jax.random.split(key) if key is not None else (None, None))
        # decode (kv_cache) steps have L=1..few: sequence sharding is
        # meaningless there, so SP applies to the train/prefill path only
        sp = self.cfg.sequence_parallel and kv_cache is None
        if sp:
            x = _sequence_shard(x)
        h = self.ln_1(params["ln_1"], x)
        if kv_cache is not None:
            attn_out, kv_cache = self.attention(
                params["attention"], h, kv_cache=kv_cache, kv_mask=kv_mask,
                positions=positions, key=k1, training=training)
        else:
            attn_out = self.attention(
                params["attention"], h, kv_mask=kv_mask,
                positions=positions, segment_ids=segment_ids, key=k1,
                training=training)
        out = x + (_sequence_shard(attn_out) if sp else attn_out)
        ff_out = self.ff(params["ff"], self.ln_2(params["ln_2"], out),
                         key=k2, training=training)
        aux = None
        if self.cfg.moe is not None:
            ff_out, aux = ff_out
        result = out + (_sequence_shard(ff_out) if sp else ff_out)
        extras = () if aux is None else (aux,)
        if kv_cache is not None:
            return (result, kv_cache, *extras)
        if extras:
            return (result, *extras)
        return result


class DecoderLM(Module):
    def __init__(self, cfg: DecoderConfig):
        self.cfg = cfg
        self.token_embeddings = Embedding(
            cfg.n_vocab, cfg.n_embd, cfg.dtype, cfg.embedding_one_hot)
        if cfg.positional == "learned":
            self.position_embeddings = Embedding(
                cfg.n_positions, cfg.n_embd, cfg.dtype, cfg.embedding_one_hot)
        self.layers = ModuleList(
            [TransformerLayer(cfg) for _ in range(cfg.n_layer)])
        self.dropout = Dropout(cfg.p_dropout)
        self.ln = LayerNorm(cfg.n_embd, cfg.ln_eps, fused=cfg.use_fused_kernel, dtype=cfg.dtype)
        self.lm_head = Linear(cfg.n_embd, cfg.n_vocab, cfg.bias, cfg.dtype)

    def __call__(self, params: Params, idx: jax.Array, *,
                 kv_caches=None, kv_mask=None, positions=None,
                 segment_ids=None, key=None, training: bool = False,
                 return_aux: bool = False, return_hidden: bool = False):
        """idx [B, L] int32 -> logits [B, L, n_vocab].

        ``return_hidden=True`` returns the post-LN hidden states [B, L,
        n_embd] INSTEAD of logits (the lm_head matmul is skipped) — pair
        with ``functional.chunked_softmax_loss(hidden,
        params['lm_head']['weight'], ...)`` to train without ever
        materializing the [B, L, n_vocab] logits tensor.

        ``positions`` overrides the default arange positions (needed for
        incremental decode, and for packed batches where each example's
        positions restart); ``segment_ids`` ([B, L] int32) enables
        packed-sequence training — attention stays within each segment
        (see ops.flash_attention); ``kv_caches`` is a list of per-layer
        caches.
        With an MoE config and ``return_aux=True`` the result also carries
        the summed router load-balancing loss (add ``moe.aux_weight *
        aux`` to the training objective).
        """
        B, L = idx.shape
        c = self.cfg
        if positions is None:
            positions = jnp.arange(L, dtype=jnp.int32)[None, :]
        rope_positions = (jnp.broadcast_to(positions, (B, L))
                          if c.positional == "rope" else None)
        tok = self.token_embeddings(params["token_embeddings"], idx)
        x = tok
        if c.positional == "learned":
            x = x + self.position_embeddings(
                params["position_embeddings"], positions)
        nkeys = c.n_layer + 1
        keys = (jax.random.split(key, nkeys) if key is not None
                else [None] * nkeys)
        x = self.dropout({}, x, key=keys[0], training=training)

        new_caches = [] if kv_caches is not None else None
        moe = c.moe is not None
        aux_total = jnp.zeros((), jnp.float32) if moe else None
        for li, layer in enumerate(self.layers):
            lparams = params["layers"][str(li)]
            fn = layer
            if c.remat and kv_caches is None:
                fn = jax.checkpoint(
                    lambda p, x, _layer=layer, _k=keys[li + 1]: _layer(
                        p, x, kv_mask=kv_mask, positions=rope_positions,
                        segment_ids=segment_ids, key=_k, training=training))
                out = fn(lparams, x)
                x, *extras = out if moe else (out,)
                if moe:
                    aux_total = aux_total + extras[0]
                continue
            if kv_caches is not None:
                # Cache mode always returns (x, cache, *extras); extras is
                # (aux,) for MoE layers and empty for dense ones.
                x, cache, *extras = layer(
                    lparams, x, kv_cache=kv_caches[li], kv_mask=kv_mask,
                    positions=rope_positions, key=keys[li + 1],
                    training=training)
                new_caches.append(cache)
                if moe:
                    aux_total = aux_total + extras[0]
            else:
                out = layer(lparams, x, kv_mask=kv_mask,
                            positions=rope_positions,
                            segment_ids=segment_ids, key=keys[li + 1],
                            training=training)
                if moe:
                    x, aux = out
                    aux_total = aux_total + aux
                else:
                    x = out

        x = self.ln(params["ln"], x)
        logits = x if return_hidden else self.lm_head(params["lm_head"], x)
        result = (logits,)
        if kv_caches is not None:
            result = result + (new_caches,)
        if return_aux:
            result = result + (aux_total,)
        return result if len(result) > 1 else result[0]
