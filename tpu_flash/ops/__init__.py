"""Public fused-op surface of tpu_flash.

The analog of the reference's fused-kernel slots on ``TensorBackend``
(minitorch/tensor_ops.py:96-108) plus the ``Tensor`` entry points
(minitorch/tensor.py:422-435).
"""

from tpu_flash.ops.attention import (  # noqa: F401
    flash_attention,
    flash_attention_with_residuals,
    flash_attn,
    flash_attn_causal,
    flash_attn2,
)
from tpu_flash.ops.fused import (  # noqa: F401
    attn_softmax,
    layer_norm,
    layer_norm_with_stats,
)
from tpu_flash.ops.reference import naive_attention  # noqa: F401
from tpu_flash.ops.registry import (  # noqa: F401
    get_default_impl,
    resolve_impl,
    set_default_impl,
)
