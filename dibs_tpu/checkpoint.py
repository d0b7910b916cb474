"""Checkpoint / resume of SVGD runs.

The reference has no persistence — a crash loses the run (SURVEY.md §5).
Here the entire carry is one pytree (:class:`dibs_tpu.inference.SVGDState`),
so checkpointing is a straight orbax (or numpy-fallback) round-trip. The
annealing schedules depend only on the step counter ``t`` stored in the
state, so resume is exact: ``resume(load_state(path), steps=...)`` continues
bit-for-bit where the run stopped (validated in tests/test_checkpoint.py).
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


def _to_host(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda leaf: onp.asarray(leaf), tree)


def save_state(state: SVGDState, path: str) -> None:
    """Serializes an :class:`SVGDState` to ``path``.

    Uses orbax when available (preferred: async-safe, versioned), otherwise a
    plain pickle of host numpy arrays.
    """
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), _to_host(state), force=True)
    except Exception:
        with open(path + ".pkl", "wb") as f:
            pickle.dump(_to_host(state), f)


def load_state(path: str) -> SVGDState:
    """Restores an :class:`SVGDState` saved by :func:`save_state`."""
    abspath = os.path.abspath(path)
    if os.path.isdir(abspath):
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        restored = ckptr.restore(abspath)
        # orbax restores a dict-like / list structure; rebuild the NamedTuple
        if not isinstance(restored, SVGDState):
            restored = SVGDState(*restored)
    else:
        with open(path + ".pkl", "rb") as f:
            restored = pickle.load(f)
    return jax.tree_util.tree_map(jnp.asarray, restored)
