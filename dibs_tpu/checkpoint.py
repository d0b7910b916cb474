"""Checkpoint / resume of SVGD runs.

The reference has no persistence — a crash loses the run (SURVEY.md §5).
Here the entire carry is one pytree (:class:`dibs_tpu.inference.SVGDState`),
so checkpointing is a serialization round-trip. The annealing schedules
depend only on the step counter ``t`` stored in the state, so resume is
exact (validated in tests/test_checkpoint.py).

Serialization uses the pytree structure itself: leaves are stored as host
numpy arrays together with the pickled treedef, which restores the exact
nested NamedTuple types (SVGDState, optax optimizer states) — something
generic dict-based checkpointers lose.

.. warning::
    :func:`load_state` unpickles the treedef, and unpickling can execute
    arbitrary code — only load checkpoint files you (or your job) wrote.
    For untrusted or long-term storage use an orbax ``PyTreeCheckpointer``
    on the same state pytree instead.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as onp

from dibs_tpu.inference.svgd import SVGDState

__all__ = ["save_state", "load_state"]

_SUFFIX = ".dibs-ckpt.pkl"


def _path(path: str) -> str:
    return path if path.endswith(_SUFFIX) else path + _SUFFIX


def save_state(state: SVGDState, path: str) -> None:
    """Serializes an :class:`SVGDState` (or any pytree) to ``path``."""
    directory = os.path.dirname(os.path.abspath(path))
    if directory:
        os.makedirs(directory, exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(state)
    host_leaves = [onp.asarray(leaf) for leaf in leaves]
    tmp = _path(path) + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump({"treedef": treedef, "leaves": host_leaves}, f)
    os.replace(tmp, _path(path))  # atomic: no torn checkpoints on crash


def load_state(path: str) -> Any:
    """Restores a pytree saved by :func:`save_state` with device arrays."""
    with open(_path(path), "rb") as f:
        payload = pickle.load(f)
    leaves = [jnp.asarray(leaf) for leaf in payload["leaves"]]
    return jax.tree_util.tree_unflatten(payload["treedef"], leaves)
