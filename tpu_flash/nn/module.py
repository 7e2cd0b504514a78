"""Functional module system.

TPU-first redesign of the reference's stateful ``Module``/``Parameter`` tree
(minitorch/module.py:6-166): modules here are *configuration* objects whose
parameters live in an external pytree, so the whole model is compatible with
``jit``/``grad``/``pjit`` without tracing Python object state.

Capabilities preserved from the reference:
  * nested module tree with attribute-based registration (``__setattr__``
    interception, module.py:55-66) — here submodules are plain attributes
    discovered by introspection;
  * ``named_parameters`` with dot-joined names (module.py:81-103) — here
    ``named_parameters(params)`` flattens the external pytree;
  * ``train()`` / ``eval()`` mode (module.py:30-53) — here an explicit
    ``training`` kwarg threaded through ``__call__`` (functional, the only
    form that works under jit).

Usage:
    layer = Linear(4, 8)
    params = layer.init(jax.random.key(0))
    y = layer(params, x)
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import jax
import jax.numpy as jnp

Params = Any  # nested dict pytree of jax.Array leaves


class Module:
    """Base class: a module is a pure function of (params, inputs).

    Subclasses define ``init(key) -> Params`` and ``__call__(params, ...)``.
    Submodules assigned as attributes are discovered automatically, so
    ``init`` for containers can be assembled via :meth:`init_submodules`.
    """

    def submodules(self) -> dict[str, "Module"]:
        return {
            name: value
            for name, value in vars(self).items()
            if isinstance(value, Module)
        }

    def init_submodules(self, key: jax.Array) -> Params:
        """Initialize every attribute submodule under its attribute name."""
        subs = self.submodules()
        keys = jax.random.split(key, max(1, len(subs)))
        return {
            name: mod.init(k) for (name, mod), k in zip(subs.items(), keys)
        }

    def init(self, key: jax.Array) -> Params:
        return self.init_submodules(key)

    def __call__(self, params: Params, *args, **kwargs):
        raise NotImplementedError


class ModuleList(Module):
    """Sequence of submodules stored under string indices."""

    def __init__(self, mods):
        self.mods = list(mods)

    def submodules(self):
        return {str(i): m for i, m in enumerate(self.mods)}

    def init(self, key):
        keys = jax.random.split(key, max(1, len(self.mods)))
        return {str(i): m.init(k) for i, (m, k) in enumerate(zip(self.mods, keys))}

    def __getitem__(self, i):
        return self.mods[i]

    def __len__(self):
        return len(self.mods)

    def __iter__(self):
        return iter(self.mods)


def named_parameters(params: Params, prefix: str = "") -> Iterator[tuple[str, jax.Array]]:
    """Dot-joined (name, array) pairs, the analog of Module.named_parameters
    (minitorch/module.py:81-103)."""
    if isinstance(params, dict):
        for k in sorted(params):
            yield from named_parameters(params[k], f"{prefix}{k}.")
    elif params is not None:
        yield prefix[:-1], params


def num_parameters(params: Params) -> int:
    return sum(int(p.size) for _, p in named_parameters(params))


def tree_cast(params: Params, dtype) -> Params:
    """Cast every floating leaf (e.g. to bf16 for inference)."""
    return jax.tree_util.tree_map(
        lambda p: p.astype(dtype) if jnp.issubdtype(p.dtype, jnp.floating) else p,
        params,
    )
