"""Global parallel context: the mesh and axis names the framework shards
over.

The reference is strictly single-process/single-GPU (SURVEY.md §2.4); all of
``parallel/`` is new TPU-native design: a `jax.sharding.Mesh` over ICI
(intra-slice) and optionally DCN (multi-host) with named axes

  * ``data``  — data parallelism (batch sharded, gradients psummed);
  * ``model`` — tensor parallelism (attention heads + FF hidden sharded,
                Megatron-style, collectives inserted by GSPMD);

Pallas kernels cannot be auto-partitioned by GSPMD, so the op wrappers
consult this context and run the kernel inside a `jax.shard_map` region with
batch/head shards (ops/attention.py) whenever a context is active.
"""

from __future__ import annotations

import contextlib
import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class ParallelContext:
    mesh: Mesh
    data_axis: str = DATA_AXIS
    model_axis: str = MODEL_AXIS

    @property
    def data_size(self) -> int:
        return self.mesh.shape[self.data_axis]

    @property
    def model_size(self) -> int:
        return self.mesh.shape[self.model_axis]

    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))


_current: ParallelContext | None = None


def set_parallel_context(ctx: ParallelContext | None) -> None:
    global _current
    _current = ctx


def current_context() -> ParallelContext | None:
    return _current


@contextlib.contextmanager
def parallel_context(ctx: ParallelContext):
    prev = _current
    set_parallel_context(ctx)
    try:
        yield ctx
    finally:
        set_parallel_context(prev)


def make_mesh(data: int = 1, model: int = 1, devices=None) -> ParallelContext:
    """Create a (data, model) mesh over the given (or all) devices.

    On a multi-host slice, callers should order devices so the model axis
    rides ICI (fast) and the data axis spans DCN (slow) — collectives for TP
    are latency-critical, gradient psums amortize.
    """
    if devices is None:
        devices = jax.devices()
    if data * model != len(devices):
        raise ValueError(
            f"mesh {data}x{model} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(data, model)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    return ParallelContext(mesh)
