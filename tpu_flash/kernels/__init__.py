"""Pallas TPU kernels."""

from tpu_flash.kernels.flash_attention import (  # noqa: F401
    flash_attention_forward,
    flash_attention_backward,
)
from tpu_flash.kernels.softmax import (  # noqa: F401
    attn_softmax_forward,
    attn_softmax_backward,
)
from tpu_flash.kernels.layernorm import (  # noqa: F401
    layernorm_forward,
    layernorm_backward,
)
