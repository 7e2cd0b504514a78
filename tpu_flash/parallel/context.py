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

Multi-host (DCN) layout
-----------------------
``make_mesh(data=d, model=m, dcn_data=h)`` builds an ``(h*d, m)`` mesh whose
``model`` axis always rides ICI (within a host/slice granule) and whose
``data`` axis is ordered [DCN slower, ICI faster] — TP collectives are
latency-critical and must never cross DCN; gradient psums amortize over the
step and tolerate it.  On a real multi-process slice the device placement
comes from ``jax.experimental.mesh_utils.create_hybrid_device_mesh``; in a
single process (tests, the 8-device virtual CPU mesh) contiguous
``len(devices)/h`` blocks emulate the hosts, which reproduces the identical
logical mesh shape and device order so the dryrun exercises the same SPMD
program a real 2-host slice would compile.

2-host v5e launch recipe (one command per host)::

    # on EVERY host (TPU pods auto-detect the coordinator):
    python train.py --dp 4 --tp 4 --dcn-data 2

  where train.py does, before any other jax call:

    from tpu_flash import parallel
    parallel.initialize_distributed()            # jax.distributed.initialize
    ctx = parallel.make_mesh(data=4, model=4, dcn_data=2)

  ``jax.devices()`` then spans both hosts (16 chips); `make_mesh` places
  model=4 within each host's ICI domain and data=8 as [host-block, chip]
  so the per-step all-reduce is the only DCN traffic.  Feed each process its
  local batch shard via ``jax.make_array_from_process_local_data`` (see
  ``put_batch``).
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


def initialize_distributed(coordinator_address: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None,
                           **kwargs) -> None:
    """Join the multi-host job: wraps ``jax.distributed.initialize``.

    Call once per process, before any other jax API touches a backend.  On
    TPU pods every argument is auto-detected from the runtime environment
    (so a bare ``initialize_distributed()`` is the whole recipe); pass the
    coordinator explicitly only for CPU/GPU clusters or tests.  Idempotent:
    a second call in an already-initialized process is a no-op instead of
    an error, so library code may call it defensively.
    """
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes, process_id=process_id, **kwargs)
    except RuntimeError as e:
        msg = str(e).lower()
        if "already initialized" in msg or "only be called once" in msg:
            return  # repeated call: no-op by contract
        if "must be called before" in msg and jax.process_count() == 1:
            # The XLA backend is already up in a single-process context
            # (tests, CPU emulation) where distributed init is semantically
            # a no-op; in a real multi-process job this path cannot trigger
            # (process_count > 1 requires a successful initialize).
            return
        raise


def _hybrid_device_array(data: int, model: int, dcn_data: int,
                         devices) -> np.ndarray:
    """Device array for an ``(dcn_data*data, model)`` mesh with model on ICI.

    Real multi-process runs use ``mesh_utils.create_hybrid_device_mesh``
    (devices grouped by slice/process granule, DCN axis outermost).  A
    single-process device list (tests, the virtual CPU mesh) has no
    slice_index attributes, so contiguous blocks of ``len(devices) //
    dcn_data`` emulate the host granules — same logical shape and order.
    """
    n = len(devices)
    if n != dcn_data * data * model:
        raise ValueError(
            f"mesh dcn={dcn_data} x {data}x{model} != {n} devices")
    n_proc = len({d.process_index for d in devices})
    if n_proc > 1:
        from jax.experimental import mesh_utils
        arr = mesh_utils.create_hybrid_device_mesh(
            (data, model), (dcn_data, 1), devices=devices,
            process_is_granule=(n_proc == dcn_data))
        return arr.reshape(dcn_data * data, model)
    return np.asarray(devices).reshape(dcn_data * data, model)


def make_mesh(data: int = 1, model: int = 1, devices=None, *,
              dcn_data: int = 1) -> ParallelContext:
    """Create a (data, model) mesh over the given (or all) devices.

    ``dcn_data`` > 1 declares that many DCN (multi-host) granules: the
    returned mesh is ``(dcn_data*data, model)`` with the model axis inside
    each granule's ICI domain and the data axis ordered [DCN slower, ICI
    faster] — see the module docstring for the launch recipe.  TP
    collectives then never cross DCN; the gradient psum is the only
    cross-host traffic.
    """
    if devices is None:
        devices = jax.devices()
    if dcn_data > 1:
        arr = _hybrid_device_array(data, model, dcn_data, devices)
    else:
        if data * model != len(devices):
            raise ValueError(
                f"mesh {data}x{model} != {len(devices)} devices")
        arr = np.asarray(devices).reshape(data, model)
    mesh = Mesh(arr, (DATA_AXIS, MODEL_AXIS))
    return ParallelContext(mesh)
