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
    For untrusted or long-term storage use the orbax backend
    (:func:`save_state_orbax` / :func:`load_state_orbax`): it stores only
    raw arrays, and restore rebuilds the structure from a caller-supplied
    template (e.g. a fresh ``init_state``) — no unpickling anywhere.
"""
from __future__ import annotations

import os
import pickle
from typing import Any

import jax
import jax.numpy as jnp
import numpy as onp

from dibs_tpu.inference.svgd import SVGDState

__all__ = ["save_state", "load_state", "save_state_orbax",
           "load_state_orbax"]

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


def save_state_orbax(state: SVGDState, path: str) -> None:
    """Serializes a state pytree with orbax (array-only storage, no pickle).

    Safe for untrusted/long-term storage: the on-disk format holds raw
    arrays + a JSON structure, never executable payloads. Restore with
    :func:`load_state_orbax`, passing a structurally-identical template
    (e.g. ``dibs.init_state(...)`` with the same shapes).
    """
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            os.path.abspath(path), args=ocp.args.PyTreeSave(state),
            force=True,
        )


def load_state_orbax(path: str, like: SVGDState) -> Any:
    """Restores an orbax checkpoint into the structure of ``like``.

    ``like`` supplies the pytree structure and leaf dtypes (a fresh
    ``init_state`` from the same engine configuration); its array values
    are ignored. No unpickling happens — the treedef comes from ``like``,
    the data from disk.
    """
    import orbax.checkpoint as ocp

    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(
            os.path.abspath(path), args=ocp.args.PyTreeRestore(item=like)
        )
    return jax.tree_util.tree_map(jnp.asarray, restored)
