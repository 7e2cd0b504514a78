"""tpu_flash — a TPU-native flash-attention training & inference framework.

Built from scratch in JAX/XLA/Pallas/pjit with the capabilities of the
reference project ``pdrebello/flash-attention-minitorch`` (a CUDA/ctypes
minitorch extension): FlashAttention-1/2 forward+backward with causal masking
and block skipping, fused masked attention-softmax, fused LayerNorm, a pre-LN
decoder-only transformer, and an IWSLT'14 de-en machine-translation pipeline —
plus TPU-first extensions the reference does not have: device-resident tensors,
INT8 weight-only matmuls, quantized (INT8/FP8) KV-cache decode, and multi-chip
sharding over a `jax.sharding.Mesh`.

Layering (maps to SURVEY.md §7):
  kernels/   — Pallas TPU kernels (flash attention, fused softmax, layernorm,
               quantized matmul, decode attention)
  ops/       — public differentiable ops: custom_vjp wrappers + pure-jnp
               reference oracles + the implementation registry
  nn/        — functional module system, layers, transformer, optimizers
  parallel/  — mesh construction, sharding rules, pjit'ed train step
  inference/ — KV-cache (incl. quantized), sampling, continuous batching
  data/      — MT dataset + tokenizer pipeline (offline-safe)
  apps/      — end-to-end training / eval CLIs
  utils/     — timing & benchmark harness
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("TPU_FLASH_PLATFORM"):
    # Escape hatch for CLI entry points: the ambient sitecustomize may pin
    # JAX_PLATFORMS at a remote TPU in a way the plain env var cannot
    # override, so honor TPU_FLASH_PLATFORM=cpu through the config API
    # (must run before the first backend initialization; pairs with
    # XLA_FLAGS=--xla_force_host_platform_device_count=N for virtual
    # multi-device CPU meshes, exactly like tests/conftest.py).
    import jax as _jax

    _jax.config.update("jax_platforms", _os.environ["TPU_FLASH_PLATFORM"])

from tpu_flash.ops import (  # noqa: F401
    flash_attention,
    attn_softmax,
    layer_norm,
    naive_attention,
)
from tpu_flash.utils.grad_check import grad_check  # noqa: F401
