"""A minimal functional module system.

Modules are frozen dataclasses describing architecture; parameters live in
plain pytrees (nested dicts of ``jax.Array``), created by ``module.init(key)``
and consumed by ``module.apply(params, ...)``. There is no mutable state, no
parameter registry, no tracing magic — ``apply`` is a pure function, so the
whole model composes freely with ``jit`` / ``grad`` / ``vmap`` / ``shard_map``.

This replaces the reference's ``torch.nn.Module`` hierarchy (reference
``pygcn/models.py``) with the JAX-native params-as-data style.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

Params = Dict[str, Any]


class Module:
    """Base class: subclasses implement ``init`` and ``apply``."""

    def init(self, key: jax.Array) -> Params:
        raise NotImplementedError

    def apply(self, params: Params, *args, **kwargs):
        raise NotImplementedError

    def __call__(self, params: Params, *args, **kwargs):
        return self.apply(params, *args, **kwargs)


def split_keys(key: jax.Array, names):
    """Deterministically derive one subkey per child module name."""
    keys = jax.random.split(key, len(names))
    return dict(zip(names, keys))
