"""Pytree dataclass helper.

Registers frozen dataclasses as JAX pytrees, with fields marked
``static=True`` treated as aux data (hashable, not traced).
"""

from __future__ import annotations

import dataclasses
from typing import TypeVar

import jax

T = TypeVar("T")


def static_field(**kw):
    """Mark a dataclass field as static (pytree aux data)."""
    meta = kw.pop("metadata", {})
    meta = {**meta, "static": True}
    return dataclasses.field(metadata=meta, **kw)


def pytree_dataclass(cls: type) -> type:
    """Decorator: frozen dataclass registered as a JAX pytree."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields)

    def _replace(self, **kw):
        return dataclasses.replace(self, **kw)

    cls.replace = _replace
    return cls
