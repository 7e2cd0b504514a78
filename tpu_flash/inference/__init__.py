"""Inference layer: KV-cache (fp/int8/fp8 storage), batched sampling,
speculative decoding, and the continuous-batching decode engine."""

from tpu_flash.inference.beam import beam_generate  # noqa: F401
from tpu_flash.inference.kv_cache import KVCache  # noqa: F401
from tpu_flash.inference.sampler import (  # noqa: F401
    SamplingConfig,
    generate,
    make_caches,
)
from tpu_flash.inference.speculative import speculative_generate  # noqa: F401
