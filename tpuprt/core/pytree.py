"""Tiny helper for frozen pytree dataclasses.

Array fields become pytree leaves; fields marked ``static()`` become aux data
(hashable, trigger recompilation when changed) — the standard JAX pattern for
"model config" vs "model arrays".
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static(**kwargs) -> Any:
    """Mark a dataclass field as static (non-leaf) metadata."""
    return dataclasses.field(metadata={"static": True}, **kwargs)


def pytree_dataclass(cls):
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )
    return cls
