"""Pytree dataclass utilities.

The engine's ``Model`` / ``Data`` containers are frozen dataclasses registered
as JAX pytrees.  Fields marked ``static()`` carry compile-time metadata
(counts, paddings, integrator choice, ...) and live in the pytree aux data so
they participate in jit cache keys; everything else is a traced array leaf.

Design note: the reference framework keeps its model in a mutable C struct
behind a global mutex (reference: src/mujoco_sim/mj_model.cpp:26-47).  Here
state is immutable; "mutation" is functional replacement, which is what lets
every step stay inside one compiled XLA program.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")

_STATIC_KEY = "__mst_static__"


def static(**kwargs) -> dataclasses.Field:
    """Declare a dataclass field as static (pytree aux data)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_STATIC_KEY] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def field(**kwargs) -> dataclasses.Field:
    """Declare a regular (traced leaf) dataclass field."""
    return dataclasses.field(**kwargs)


def _split_fields(cls):
    data_fields, static_fields = [], []
    for f in dataclasses.fields(cls):
        if f.metadata.get(_STATIC_KEY, False):
            static_fields.append(f.name)
        else:
            data_fields.append(f.name)
    return data_fields, static_fields


def pytree(cls: type[T]) -> type[T]:
    """Class decorator: frozen dataclass registered as a JAX pytree."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields, static_fields = _split_fields(cls)

    def flatten_with_keys(obj):
        children = [(jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_fields]
        aux = tuple(getattr(obj, n) for n in static_fields)
        return children, aux

    def flatten(obj):
        return [getattr(obj, n) for n in data_fields], tuple(
            getattr(obj, n) for n in static_fields
        )

    def unflatten(aux, children):
        obj = object.__new__(cls)
        for n, v in zip(data_fields, children):
            object.__setattr__(obj, n, v)
        for n, v in zip(static_fields, aux):
            object.__setattr__(obj, n, v)
        return obj

    jax.tree_util.register_pytree_with_keys(cls, flatten_with_keys, unflatten, flatten)

    def replace(self: T, **updates: Any) -> T:
        return dataclasses.replace(self, **updates)

    cls.replace = replace  # type: ignore[attr-defined]
    return cls
