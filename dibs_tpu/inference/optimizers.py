"""Optimizers for the SVGD transport updates.

The engine speaks optax (``GradientTransformation``); this module provides
string-keyed constructors whose numerics match the reference's
``jax.example_libraries.optimizers`` exactly:

  * ``rmsprop``: ``nu <- gamma nu + (1-gamma) g^2; x <- x - lr * g / sqrt(nu + eps)``
    — note the ``eps`` *inside* the square root, which differs from
    ``optax.rmsprop``'s default placement; parity with
    jax.example_libraries.optimizers.rmsprop (used at
    /root/reference/dibs/inference/svgd.py:117-122).
  * ``gd``: plain SGD.

Any optax ``GradientTransformation`` may be passed to the engine directly.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax
from jax.tree_util import tree_map

__all__ = ["rmsprop", "sgd", "get_optimizer"]


class ScaleByRmsState(NamedTuple):
    nu: optax.Updates


def _scale_by_rms_ref(gamma: float = 0.9, eps: float = 1e-8):
    """RMS scaling with eps inside the sqrt (reference-parity variant)."""

    def init_fn(params):
        return ScaleByRmsState(nu=tree_map(jnp.zeros_like, params))

    def update_fn(updates, state, params=None):
        del params
        nu = tree_map(
            lambda g, n: gamma * n + (1.0 - gamma) * jnp.square(g), updates, state.nu
        )
        scaled = tree_map(lambda g, n: g / jnp.sqrt(n + eps), updates, nu)
        return scaled, ScaleByRmsState(nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)


def rmsprop(stepsize: float, gamma: float = 0.9, eps: float = 1e-8):
    """Reference-parity RMSProp as an optax transformation."""
    return optax.chain(_scale_by_rms_ref(gamma, eps), optax.scale(-stepsize))


def sgd(stepsize: float):
    return optax.sgd(stepsize)


def get_optimizer(name: str, param: dict):
    """Resolves the reference's string/param optimizer spec
    (svgd.py:117-122: choices ``gd`` and ``rmsprop``)."""
    if name == "rmsprop":
        return rmsprop(param.get("stepsize", 0.005))
    if name == "gd":
        return sgd(param.get("stepsize", 0.005))
    raise ValueError(f"Unknown optimizer `{name}`")
