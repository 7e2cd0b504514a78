"""Parallelism layer: mesh construction, Megatron-style TP shardings, and
the SPMD train step (all new design -- the reference is single-GPU)."""

from tpu_flash.parallel.context import (  # noqa: F401
    ParallelContext,
    current_context,
    initialize_distributed,
    make_mesh,
    parallel_context,
    set_parallel_context,
)
from tpu_flash.parallel.sharding import (  # noqa: F401
    batch_specs,
    decoder_param_specs,
    map_with_specs,
    shard_params,
)
from tpu_flash.parallel.sequence import (  # noqa: F401
    allgather_attention,
    ring_attention,
    sequence_parallel_attention,
)
from tpu_flash.parallel.train import (  # noqa: F401
    init_sharded,
    make_sharded_train_step,
    put_batch,
    put_local_batch,
)
from tpu_flash.parallel.vocab_loss import (  # noqa: F401
    vocab_parallel_softmax_loss,
)
from tpu_flash.parallel.zero import (  # noqa: F401
    init_zero1,
    make_zero1_train_step,
    zero1_specs,
)
