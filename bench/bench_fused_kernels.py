"""Kernel-level fused softmax / LayerNorm benchmark vs plain XLA.

The reference publishes per-kernel speedups for its LightSeq-derived fused
masked softmax and LayerNorm (kernel_tests/test_softmax_fw.py:39-73,
test_layernorm_fw.py); round 1 proved correctness parity but never showed
the Pallas kernels BEAT the XLA composition at kernel level on TPU.  This
measures fw and fw+bw for both, at reference-like and production shapes —
the number that decides whether ``use_fused_kernel=True`` should route to
Pallas or let XLA fuse (VERDICT round-1 item 4).

Run:  python -m bench.bench_fused_kernels
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_flash.ops import attn_softmax, layer_norm
from tpu_flash.utils.timing import benchmark


def _xla_attn_softmax(x, pad_mask, mask_future):
    """The plain composition the reference's fused kernel replaces
    (minitorch.nn.softmax(inp + mask), kernel_tests/test_softmax_fw.py)
    with the same 1e-8-denominator semantics."""
    xf = x.astype(jnp.float32)
    if pad_mask is not None:
        xf = xf + pad_mask[:, None, None, :].astype(jnp.float32)
    if mask_future:
        Lq, Lk = x.shape[-2], x.shape[-1]
        rows = jnp.arange(Lq)[:, None] + (Lk - Lq)
        cols = jnp.arange(Lk)[None, :]
        xf = jnp.where(cols <= rows, xf, -1e7)
    m = jnp.max(xf, axis=-1, keepdims=True)
    e = jnp.exp(xf - m)
    return (e / (jnp.sum(e, axis=-1, keepdims=True) + 1e-8)).astype(x.dtype)


def _xla_layer_norm(x, gamma, beta, eps=1e-8):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mean) ** 2, axis=-1, keepdims=True)
    return ((xf - mean) * jax.lax.rsqrt(var + eps) * gamma + beta).astype(
        x.dtype)


def _fwbw(f, *grad_args):
    def g(*args):
        def loss(*a):
            return jnp.sum(f(*a).astype(jnp.float32))
        return jax.grad(loss, grad_args)(*args)
    return g


def main():
    rng = np.random.default_rng(0)

    print("== fused masked softmax (pallas kernel vs XLA composition) ==",
          flush=True)
    for B, H, Lq, Lk, dtype in [
        (8, 8, 256, 256, jnp.float32),     # reference test scale
        (8, 8, 1024, 1024, jnp.float32),   # reference fw cap
        (4, 8, 2048, 2048, jnp.bfloat16),  # beyond the reference's cap
    ]:
        x = jnp.asarray(rng.standard_normal((B, H, Lq, Lk)), dtype)
        mask = jnp.asarray(
            np.where(rng.random((B, Lk)) < 0.2, -1e7, 0.0), dtype)
        name = f"[{B}x{H}x{Lq}x{Lk} {jnp.dtype(dtype).name}]"
        pal = benchmark(
            functools.partial(attn_softmax, mask_future=True, impl="pallas"),
            x, mask, name="pallas fw")
        xla = benchmark(
            jax.jit(functools.partial(_xla_attn_softmax, mask_future=True)),
            x, mask, name="xla fw")
        pal_bw = benchmark(
            _fwbw(functools.partial(attn_softmax, mask_future=True,
                                    impl="pallas"), 0), x, mask,
            name="pallas fwbw")
        xla_bw = benchmark(
            _fwbw(jax.jit(functools.partial(_xla_attn_softmax,
                                            mask_future=True)), 0), x, mask,
            name="xla fwbw")
        print(f"softmax {name}: fw pallas {pal.mean_ms:.3f} / xla "
              f"{xla.mean_ms:.3f} ms ({xla.mean_ms / pal.mean_ms:.2f}x)  "
              f"fwbw pallas {pal_bw.mean_ms:.3f} / xla {xla_bw.mean_ms:.3f} "
              f"ms ({xla_bw.mean_ms / pal_bw.mean_ms:.2f}x)", flush=True)

    print("== fused LayerNorm (pallas kernel vs XLA composition) ==",
          flush=True)
    for rows, hidden, dtype in [
        (8 * 256, 256, jnp.float32),       # reference scale
        (8 * 1024, 1024, jnp.float32),
        (4 * 2048, 2048, jnp.bfloat16),    # production block scale
    ]:
        x = jnp.asarray(rng.standard_normal((rows, hidden)), dtype)
        gamma = jnp.asarray(rng.standard_normal(hidden), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(hidden), jnp.float32)
        name = f"[{rows}x{hidden} {jnp.dtype(dtype).name}]"
        pal = benchmark(functools.partial(layer_norm, impl="pallas"),
                        x, gamma, beta, name="pallas fw")
        xla = benchmark(jax.jit(_xla_layer_norm), x, gamma, beta,
                        name="xla fw")
        pal_bw = benchmark(
            _fwbw(functools.partial(layer_norm, impl="pallas"), 0, 1, 2),
            x, gamma, beta, name="pallas fwbw")
        xla_bw = benchmark(
            _fwbw(jax.jit(_xla_layer_norm), 0, 1, 2),
            x, gamma, beta, name="xla fwbw")
        print(f"layernorm {name}: fw pallas {pal.mean_ms:.3f} / xla "
              f"{xla.mean_ms:.3f} ms ({xla.mean_ms / pal.mean_ms:.2f}x)  "
              f"fwbw pallas {pal_bw.mean_ms:.3f} / xla {xla_bw.mean_ms:.3f} "
              f"ms ({xla_bw.mean_ms / pal_bw.mean_ms:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
