"""Implementation registry for the fused ops.

The reference framework swaps kernel backends by constructing
``TensorBackend(SimpleOps | FastOps | CudaKernelOps)`` — every fused kernel is
a named slot on the backend (minitorch/tensor_ops.py:96-108).  The TPU-native
analog is this registry: each fused op resolves an *implementation* string at
call time:

  * ``"pallas"``    — the Pallas TPU kernel (compiled on TPU, interpreted on
                      CPU), the production path;
  * ``"reference"`` — the pure-jnp tiled oracle from ``ops.reference`` (the
                      SimpleOps analog, also the test oracle);
  * ``"xla"``       — plain jnp composition left to XLA fusion (the
                      "unfused baseline" path used for benchmarking).

``set_default_impl`` switches the process-wide default; individual calls can
override with ``impl=...``.
"""

from __future__ import annotations

VALID_IMPLS = ("pallas", "reference", "xla")

_default_impl = "pallas"


def set_default_impl(impl: str) -> None:
    if impl not in VALID_IMPLS:
        raise ValueError(f"impl must be one of {VALID_IMPLS}, got {impl!r}")
    global _default_impl
    _default_impl = impl


def get_default_impl() -> str:
    return _default_impl


def resolve_impl(impl: str | None) -> str:
    if impl is None:
        return _default_impl
    if impl not in VALID_IMPLS:
        raise ValueError(f"impl must be one of {VALID_IMPLS}, got {impl!r}")
    return impl
