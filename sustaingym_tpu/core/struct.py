"""Pytree dataclass utilities for the SustainGym-TPU core runtime.

Every environment's ``Params``/``State`` is a frozen pytree dataclass so it can
flow through ``jax.jit`` / ``jax.vmap`` / ``jax.lax.scan`` and be sharded with
``jax.sharding``. We use ``flax.struct`` (baked into the image) and add small
helpers used across the engine.
"""
from __future__ import annotations

from typing import Any, TypeVar

import jax
import jax.numpy as jnp
from flax import struct

__all__ = [
    "PyTreeNode",
    "dataclass",
    "field",
    "static_field",
    "tree_select",
    "tree_stack",
]

PyTreeNode = struct.PyTreeNode
dataclass = struct.dataclass
field = struct.field

T = TypeVar("T")


def static_field(**kwargs: Any):
    """A field treated as static (part of the treedef, not traced)."""
    return struct.field(pytree_node=False, **kwargs)


def tree_select(pred: jax.Array, on_true: T, on_false: T) -> T:
    """Elementwise ``jnp.where`` over matching pytrees.

    ``pred`` is broadcast against every leaf; used by the functional
    autoreset combinator to swap in freshly-reset state where ``done``.
    """

    def _sel(a, b):
        p = pred
        # broadcast pred over trailing dims of the leaf
        while p.ndim < jnp.ndim(a):
            p = p[..., None]
        return jnp.where(p, a, b)

    return jax.tree.map(_sel, on_true, on_false)


def tree_stack(trees: list[T], axis: int = 0) -> T:
    """Stacks a list of identical pytrees along ``axis``."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=axis), *trees)
