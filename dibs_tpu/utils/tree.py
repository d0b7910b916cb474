"""Pytree manipulation helpers.

Behavioral parity with /root/reference/dibs/utils/tree.py (only the symbols the
framework actually uses, plus a couple of conveniences for the sharded engine).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import random
from jax.tree_util import tree_flatten, tree_map, tree_unflatten


def tree_index(pytree, idx):
    """Indexes every leaf's leading dimension with ``idx``."""
    return tree_map(lambda leaf: leaf[idx], pytree)


def tree_select(pytree, bool_mask):
    """Selects along the leading dimension of every leaf with a boolean mask."""
    return tree_map(lambda leaf: leaf[bool_mask, ...], pytree)


def tree_mul(pytree, c):
    """Multiplies every leaf by scalar ``c``."""
    return tree_map(lambda leaf: leaf * c, pytree)


def tree_shapes(pytree):
    """Replaces each leaf by an array of its shape."""
    return tree_map(lambda leaf: jnp.array(leaf.shape), pytree)


def tree_expand_leading_by(pytree, n):
    """Prepends ``n`` singleton dimensions to every leaf."""
    return tree_map(lambda leaf: jnp.expand_dims(leaf, axis=tuple(range(n))), pytree)


def tree_key_split(key, pytree):
    """One fresh subkey per leaf, arranged in the same tree structure."""
    flat, treedef = tree_flatten(pytree)
    subkeys = random.split(key, len(flat))
    return tree_unflatten(treedef, list(subkeys))


def tree_zeros_like(pytree):
    return tree_map(jnp.zeros_like, pytree)
