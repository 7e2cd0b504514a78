"""Public differentiable flash-attention op.

The analog of the reference's ``Flash_Attn`` / ``Flash_Attn2`` /
``Flash_Attn_Causal`` autodiff Functions
(minitorch/tensor_functions.py:462-497) and the ``Tensor.flash_attn*`` entry
points (minitorch/tensor.py:422-429) — here a single ``jax.custom_vjp`` op
with a version switch:

  * ``version=2`` (default): FA2 semantics — the forward saves the logsumexp
    residual, exactly like launch_flash_attn_fw storing ``L = m + log l``
    (src/flash_attn2_fw.cpp:279-294).
  * ``version=1``: FA1 semantics — residuals are the running ``(l, m)`` pair
    (src/flash_attn_fw.cpp:225-276).  On TPU both versions run the same
    Pallas forward (which emits both ``lse`` and ``m``); the distinction is
    preserved in the residuals and in which tiled oracle verifies them.

The backward always recomputes ``P`` from the logsumexp (``(1/l)·exp(S-m) ==
exp(S - (m + log l))``), giving one race-free backward for both versions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.kernels.flash_attention import (
    flash_attention_backward,
    flash_attention_forward,
)
from tpu_flash.ops import reference as ref
from tpu_flash.ops.registry import resolve_impl


def _kv_quant_parts(mode: str) -> tuple[str, str]:
    """Split a kv_quant mode string into (base, granularity):
    "int8" -> ("int8", "token"); "int8_channel" -> ("int8", "channel")."""
    base, _, gran = mode.partition("_")
    return base, (gran or "token")


def _quantize_kv(x, mode="int8"):
    """Symmetric KV quantization at two granularities (kernel lineage:
    the never-implemented LightSeq i8 declarations,
    /root/reference/src/includes/kernels.h:29-47):

      * token ("int8"/"fp8"): one scale per (batch, head, position), amax
        over head_dim — scales [B, H, L].  Tightest error; the scales fold
        per-tile inside the kernel.
      * channel ("int8_channel"/"fp8_channel"): one scale per (batch,
        head, d-channel), amax over the SEQUENCE — scales [B, H, d].  The
        scales fold into Q / the output outside the kernel ("free
        dequant", VERDICT r4 #1); error depends on per-channel dynamic
        range across positions (K caches are channel-outlier-dominated,
        so channel-K quant is the KIVI-style regime).

    int8 codes are [-127, 127]; fp8 is float8_e4m3 (max normal 448)."""
    base, gran = _kv_quant_parts(mode)
    axis = -2 if gran == "channel" else -1
    amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=axis)
    div = (lambda s: s[..., None, :]) if gran == "channel" \
        else (lambda s: s[..., None])
    if base == "int8":
        scales = jnp.where(amax == 0.0, 1.0, amax / 127.0)
        codes = jnp.clip(
            jnp.round(x.astype(jnp.float32) / div(scales)), -127, 127
        ).astype(jnp.int8)
    else:  # fp8
        scales = jnp.where(amax == 0.0, 1.0, amax / 448.0)
        codes = (x.astype(jnp.float32) / div(scales)).astype(
            jnp.float8_e4m3fn)
    return codes, scales.astype(jnp.float32)


def dequantize_kv(codes, scales, mode="int8"):
    """Inverse of :func:`_quantize_kv` (fp32): the straight-through dense
    path and the test oracles share this exact dequant."""
    from tpu_flash.kernels.common import cast_codes

    _, gran = _kv_quant_parts(mode)
    f = cast_codes(codes, jnp.float32)
    return f * (scales[..., None, :] if gran == "channel"
                else scales[..., None])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention_quantkv(q, k, v, seed, seg, causal, dropout_rate, mode,
                             window):
    out, _ = _flash_attention_quantkv_fwd(
        q, k, v, seed, seg, causal, dropout_rate, mode, window)
    return out


def _flash_attention_quantkv_fwd(q, k, v, seed, seg, causal, dropout_rate,
                                 mode, window):
    """Quantized-KV flash attention (BASELINE's INT8-KV FA2 fw+bw): K/V are
    quantized to int8 codes + per-position scales, BOTH the forward and the
    backward recompute consume the codes (cast once in VMEM with the scales
    folded into scores/probabilities — see the kernel's d-major layout
    comment), and the saved residuals hold the int8 codes — halving (bf16)
    or quartering (fp32) the attention residual memory for long-context
    training.  Codes are transposed to the kernel's d-major layout ONCE
    here and reused by the backward.  Gradients for k/v are
    straight-through (w.r.t. the dequantized values).  Channel-granularity
    modes ("int8_channel"/"fp8_channel") run the scale-free kernel form:
    the entries fold/un-fold the [B, H, d] scales outside the kernel."""
    gran = _kv_quant_parts(mode)[1]
    kc, ks = _quantize_kv(k, mode)
    vc, vs = _quantize_kv(v, mode)
    kc, vc = kc.transpose(0, 1, 3, 2), vc.transpose(0, 1, 3, 2)
    out, lse, _ = flash_attention_forward(
        q, kc, vc, ks, vs, causal=causal, dropout_rate=dropout_rate,
        dropout_seed=seed, window=window, segment_ids=seg, kv_layout="dl",
        kv_scale_mode=gran)
    return out, (q, kc, ks, vc, vs, out, lse, seed, seg)


def _flash_attention_quantkv_bwd(causal, dropout_rate, mode, window, res, do):
    q, kc, ks, vc, vs, out, lse, seed, seg = res
    dq, dk, dv = flash_attention_backward(
        q, kc, vc, out, lse, do, None, ks, vs, causal=causal,
        dropout_rate=dropout_rate, dropout_seed=seed, window=window,
        segment_ids=seg, kv_layout="dl",
        kv_scale_mode=_kv_quant_parts(mode)[1])
    return dq, dk, dv, _seed_cotangent(seed), _seg_cotangent(seg)


_flash_attention_quantkv.defvjp(
    _flash_attention_quantkv_fwd, _flash_attention_quantkv_bwd)


def _forward_impl(q, k, v, causal, impl, dropout_rate=0.0, seed=0,
                  window=None, seg=None, with_m=False):
    """Returns (out, lse, m) under the chosen implementation (``m`` is
    None unless ``with_m`` — only FA1-style residual reporting needs it,
    and emitting it costs the kernel an extra output spec per grid step).
    """
    if impl == "pallas":
        return flash_attention_forward(
            q, k, v, causal=causal, dropout_rate=dropout_rate,
            dropout_seed=seed, window=window, segment_ids=seg,
            with_m=with_m)
    if impl == "reference" and dropout_rate == 0.0 and window is None \
            and seg is None:
        out, lse = ref.flash_attention2_fw_reference(q, k, v, causal=causal)
        # m is only needed for FA1-style residual reporting.
        _, l1, m1 = ref.flash_attention1_fw_reference(q, k, v, causal=causal)
        del l1
        return out, lse, m1
    # "xla" (and the dropout form of "reference"): plain composition with
    # lse computed directly; dropout applies the SAME hash mask as the
    # kernel (ref.dropout_keep_oracle) to the softmax probabilities.
    if k.shape[1] != q.shape[1]:        # GQA: dense form repeats KV heads
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    scale = ref.default_scale(q.shape[-1])
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k) * scale
    if causal:
        s = s + ref.causal_mask(q.shape[-2], k.shape[-2], s.dtype)
        if window is not None:
            s = s + ref.window_mask(q.shape[-2], k.shape[-2], window, s.dtype)
    if seg is not None:
        s = ref.apply_segment_mask(s, seg)
    lse = jax.nn.logsumexp(s, axis=-1)
    m = jnp.max(s, axis=-1)
    probs = jax.nn.softmax(s, axis=-1)
    if dropout_rate > 0.0:
        probs = probs * ref.dropout_keep_oracle(
            q.shape[0], q.shape[1], q.shape[2], k.shape[2],
            seed, dropout_rate)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
    return out, lse, m


def _backward_impl(q, k, v, o, lse, do, causal, impl, dropout_rate=0.0,
                   seed=0, window=None, seg=None):
    if impl == "pallas":
        return flash_attention_backward(
            q, k, v, o, lse, do, causal=causal, dropout_rate=dropout_rate,
            dropout_seed=seed, window=window, segment_ids=seg)
    if dropout_rate > 0.0 or window is not None or seg is not None:
        # The dense composition is natively differentiable: recompute the
        # forward under jax.vjp with the same masks.  (The tiled reference
        # oracle stays dropout/window/segment-free; those always land here.)
        def dense(q, k, v):
            out, _, _ = _forward_impl(q, k, v, causal, "xla", dropout_rate,
                                      seed, window, seg)
            return out
        _, vjp = jax.vjp(dense, q, k, v)
        return vjp(do)
    if k.shape[1] != q.shape[1]:
        # GQA: the tiled oracle needs H-head k/v (the forward repeated them);
        # repeat for the recompute, then sum the per-query-head dk/dv over
        # each group back to the Hkv-head input shape.
        B, Hkv, Lk, d = k.shape
        g = q.shape[1] // Hkv
        dq, dk, dv = ref.flash_attention2_bw_reference(
            q, jnp.repeat(k, g, axis=1), jnp.repeat(v, g, axis=1),
            o, lse, do, causal=causal)
        dk = dk.reshape(B, Hkv, g, Lk, d).sum(2)
        dv = dv.reshape(B, Hkv, g, Lk, d).sum(2)
        return dq, dk, dv
    return ref.flash_attention2_bw_reference(q, k, v, o, lse, do, causal=causal)


def _seed_cotangent(seed):
    # int32 seeds are non-differentiable: their cotangent is symbolic zero.
    return np.zeros(np.shape(seed), jax.dtypes.float0)


def _seg_cotangent(seg):
    # int32 segment ids: symbolic-zero cotangent (None when not segmented).
    return None if seg is None else np.zeros(np.shape(seg), jax.dtypes.float0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def _flash_attention(q, k, v, seed, seg, causal, impl, dropout_rate, window):
    out, _, _ = _forward_impl(q, k, v, causal, impl, dropout_rate, seed,
                              window, seg)
    return out


def _flash_attention_fwd(q, k, v, seed, seg, causal, impl, dropout_rate,
                         window):
    out, lse, _ = _forward_impl(q, k, v, causal, impl, dropout_rate, seed,
                                window, seg)
    return out, (q, k, v, out, lse, seed, seg)


def _flash_attention_bwd(causal, impl, dropout_rate, window, residuals, do):
    q, k, v, out, lse, seed, seg = residuals
    dq, dk, dv = _backward_impl(q, k, v, out, lse, do, causal, impl,
                                dropout_rate, seed, window, seg)
    return dq, dk, dv, _seed_cotangent(seed), _seg_cotangent(seg)


_flash_attention.defvjp(_flash_attention_fwd, _flash_attention_bwd)


def flash_attention(
    q: jax.Array, k: jax.Array, v: jax.Array,
    *,
    causal: bool = False,
    version: int = 2,
    impl: str | None = None,
    kv_quant: str = "none",
    dropout_rate: float = 0.0,
    dropout_seed: jax.Array | int = 0,
    window: int | None = None,
    segment_ids: jax.Array | None = None,
) -> jax.Array:
    """Flash attention over [B, H, L, d] inputs; differentiable.

    ``segment_ids`` ([B, L] int32, requires Lq == Lk): packed-sequence
    attention — position i attends position j only when their segment ids
    match (composed with causal/window).  Train several concatenated
    examples per row with zero cross-contamination and no padding waste;
    new capability vs the reference (its collate pads every row,
    run_machine_translation.py:87-154).

    ``window`` (requires causal): sliding-window/local attention — row r
    attends keys in (r - window, r]; compute and HBM traffic are
    O(L*window).  New capability vs the reference (Mistral-style local
    attention).

    ``version`` selects the FA1/FA2 residual convention (both backed by the
    same TPU kernels), ``impl`` overrides the registry default
    ("pallas" | "reference" | "xla").  ``kv_quant="int8"`` runs the
    quantized-KV form: int8 K/V codes with per-position scales feed both the
    forward and the backward recompute, and the saved residuals are int8.

    ``dropout_rate``/``dropout_seed``: attention dropout on the softmax
    probabilities via an in-kernel counter-based hash mask regenerated
    exactly in the backward (kernels/flash_attention.dropout_keep_mask) —
    nothing [L, L]-sized is ever stored.  ``dropout_seed`` is an int32
    (array or python int); derive a fresh one per training step, e.g.
    ``jax.random.randint(key, (), 0, 2**31 - 1)``.  New capability: the
    reference's flash path has no dropout, and its model-level attention
    dropout is never applied (modules_transfomer.py:56).

    When a parallel context is active (parallel.context), the kernel runs
    inside a `jax.shard_map` region with batch sharded over the data axis and
    heads over the model axis — GSPMD cannot partition a pallas_call, and
    attention is embarrassingly parallel over (batch, heads), so this is the
    TPU-native tensor-parallel form (no collectives inside attention).
    """
    if version not in (1, 2):
        raise ValueError(f"version must be 1 or 2, got {version}")
    impl = resolve_impl(impl)
    dropout_rate = float(dropout_rate)
    seed = jnp.asarray(dropout_seed, jnp.int32)
    if window is not None:
        if not causal:
            raise ValueError("window requires causal=True")
        window = int(window)
        if window < 1:
            # window=0 would make the keep-band (r-0, r] empty and silently
            # zero every attention output; reject rather than degenerate.
            raise ValueError(
                f"window must be >= 1 (got {window}); use window=None to "
                f"disable sliding-window attention")
    seg = None
    if segment_ids is not None:
        if q.shape[-2] != k.shape[-2]:
            raise ValueError("segment_ids requires Lq == Lk")
        if segment_ids.shape != (q.shape[0], q.shape[2]):
            raise ValueError(
                f"segment_ids must be [B, L] = {(q.shape[0], q.shape[2])}, "
                f"got {segment_ids.shape}")
        seg = jnp.asarray(segment_ids, jnp.int32)
    if (dropout_rate > 0.0 or window is not None or seg is not None) \
            and impl == "reference":
        impl = "xla"  # the dropout/window/segment-capable dense oracle form
    from tpu_flash.parallel.context import current_context

    ctx = current_context()
    if kv_quant != "none":
        if kv_quant not in ("int8", "fp8", "int8_channel", "fp8_channel"):
            raise ValueError(
                f"kv_quant must be 'none', 'int8', 'fp8', 'int8_channel' "
                f"or 'fp8_channel', got {kv_quant!r}")
        if impl != "pallas":
            raise ValueError("kv_quant requires the pallas impl")
        if ctx is not None:
            # Same TP form as the unquantized kernel: batch over data, heads
            # over model; quantization happens per-(batch, head, position)
            # inside each shard, so shard-local quantize == global quantize.
            B, H, Hkv = q.shape[0], q.shape[1], k.shape[1]
            if (B % ctx.data_size or H % ctx.model_size
                    or Hkv % ctx.model_size):
                raise ValueError(
                    f"kv_quant under a parallel context needs batch {B} "
                    f"divisible by data={ctx.data_size} and heads {H}/{Hkv} "
                    f"by model={ctx.model_size} (GSPMD cannot partition the "
                    f"quantized pallas kernel)")
            from jax.sharding import PartitionSpec as P

            spec = P(ctx.data_axis, ctx.model_axis, None, None)

            def _qseed(s, q_loc):
                b0 = jax.lax.axis_index(ctx.data_axis) * q_loc.shape[0]
                h0 = jax.lax.axis_index(ctx.model_axis) * q_loc.shape[1]
                return jnp.stack([s, b0.astype(jnp.int32),
                                  h0.astype(jnp.int32)])

            if seg is None:
                fn = jax.shard_map(
                    lambda q, k, v, s: _flash_attention_quantkv(
                        q, k, v, _qseed(s, q), None, causal, dropout_rate,
                        kv_quant, window),
                    mesh=ctx.mesh, in_specs=(spec, spec, spec, P()),
                    out_specs=spec, check_vma=False)
                return fn(q, k, v, seed)
            fn = jax.shard_map(
                lambda q, k, v, s, sg: _flash_attention_quantkv(
                    q, k, v, _qseed(s, q), sg, causal, dropout_rate,
                    kv_quant, window),
                mesh=ctx.mesh,
                in_specs=(spec, spec, spec, P(), P(ctx.data_axis, None)),
                out_specs=spec, check_vma=False)
            return fn(q, k, v, seed, seg)
        return _flash_attention_quantkv(
            q, k, v, seed, seg, causal, dropout_rate, kv_quant, window)
    if ctx is not None and impl == "pallas":
        B, H, Hkv = q.shape[0], q.shape[1], k.shape[1]
        # Hkv must divide too: GQA/MQA k/v carry fewer heads than q but are
        # sharded with the same head-axis spec (e.g. MQA's Hkv=1 can never
        # split over model_size>1 — fall back to the GSPMD-partitioned graph).
        if (B % ctx.data_size == 0 and H % ctx.model_size == 0
                and Hkv % ctx.model_size == 0):
            from jax.sharding import PartitionSpec as P

            spec = P(ctx.data_axis, ctx.model_axis, None, None)

            # The dropout hash mixes GLOBAL (batch, head) indices: each
            # shard packs its (batch, head) offset into the seed vector the
            # kernels prefetch, so sharded runs are bit-identical to the
            # unsharded layout (layout-independent masks).
            def _packed_seed(s, q_loc):
                b0 = jax.lax.axis_index(ctx.data_axis) * q_loc.shape[0]
                h0 = jax.lax.axis_index(ctx.model_axis) * q_loc.shape[1]
                return jnp.stack([s, b0.astype(jnp.int32),
                                  h0.astype(jnp.int32)])

            if seg is None:
                fn = jax.shard_map(
                    lambda q, k, v, s: _flash_attention(
                        q, k, v, _packed_seed(s, q), None, causal, impl,
                        dropout_rate, window),
                    mesh=ctx.mesh, in_specs=(spec, spec, spec, P()),
                    out_specs=spec, check_vma=False)
                return fn(q, k, v, seed)
            fn = jax.shard_map(
                lambda q, k, v, s, sg: _flash_attention(
                    q, k, v, _packed_seed(s, q), sg, causal, impl,
                    dropout_rate, window),
                mesh=ctx.mesh,
                in_specs=(spec, spec, spec, P(), P(ctx.data_axis, None)),
                out_specs=spec, check_vma=False)
            return fn(q, k, v, seed, seg)
        impl = "xla"  # indivisible shapes: let GSPMD partition the graph
    return _flash_attention(q, k, v, seed, seg, causal, impl, dropout_rate,
                            window)


def flash_attention_with_residuals(
    q, k, v, *, causal: bool = False, version: int = 2, impl: str | None = None,
):
    """Non-differentiable forward that also returns the saved residuals:
    ``(out, lse)`` for version=2, ``(out, l, m)`` for version=1 — the same
    tuples the reference's launchers emit (cuda_kernel_ops.py:577-581)."""
    impl = resolve_impl(impl)
    out, lse, m = _forward_impl(q, k, v, causal, impl, with_m=(version == 1))
    if version == 2:
        return out, lse
    return out, jnp.exp(lse - m), m


# --- reference-parity aliases (Tensor.flash_attn* , tensor.py:422-429) ------

def flash_attn(q, k, v, *, impl: str | None = None):
    """FA1, non-causal."""
    return flash_attention(q, k, v, causal=False, version=1, impl=impl)


def flash_attn_causal(q, k, v, *, impl: str | None = None):
    """FA1 with causal masking + block skip."""
    return flash_attention(q, k, v, causal=True, version=1, impl=impl)


def flash_attn2(q, k, v, *, causal: bool = False, impl: str | None = None):
    """FA2 (logsumexp residual)."""
    return flash_attention(q, k, v, causal=causal, version=2, impl=impl)
