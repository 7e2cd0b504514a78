"""Neural-network layer of tpu_flash: functional module system, basic layers,
the pre-LN decoder transformer, and pure pytree optimizers — the analog of
the reference's minitorch/{module,nn,modules_basic,modules_transfomer,optim}.py.
"""

from tpu_flash.nn import functional  # noqa: F401
from tpu_flash.nn.layers import (  # noqa: F401
    Dropout,
    Embedding,
    LayerNorm,
    Linear,
    quantize_linear_params,
    quantize_model_linears,
)
from tpu_flash.nn.module import (  # noqa: F401
    Module,
    ModuleList,
    named_parameters,
    num_parameters,
    tree_cast,
)
from tpu_flash.nn.optim import (  # noqa: F401
    accumulate_gradients,
    adam,
    adamw,
    clip_by_global_norm,
    cosine_schedule,
    mixed_precision,
    sgd,
    skip_nonfinite,
)
from tpu_flash.nn.moe import (  # noqa: F401
    MoEConfig,
    MoEFeedForward,
    expert_param_specs,
)
from tpu_flash.nn.transformer import (  # noqa: F401
    DecoderConfig,
    DecoderLM,
    FeedForward,
    MultiHeadAttention,
    TransformerLayer,
)
