"""Utilities: benchmark timing, checkpointing, profiling/tracing."""

from tpu_flash.utils.timing import BenchResult, attention_flops, benchmark, compare  # noqa: F401
from tpu_flash.utils.checkpoint import (  # noqa: F401
    AsyncCheckpointer,
    list_checkpoints,
    restore_checkpoint,
    save_checkpoint,
)
from tpu_flash.utils.profiling import PhaseTimer, annotate, checked, trace  # noqa: F401
