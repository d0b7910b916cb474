"""Multi-chip scale-out over a ``jax.sharding.Mesh``.

The reference is single-process, single-device; its only parallelism is vmap
(/root/reference — SURVEY.md §2.4). Here the particle axis — the
embarrassingly-parallel axis of SVGD — is sharded across a device mesh. The
per-particle gradient estimation (the dominant cost:
``n_particles * n_grad_mc_samples`` likelihood evaluations and gradients per
step) then runs fully parallel across chips; only the ``[P, P]`` kernel
matrix / transport couples particles, and XLA materializes exactly the
all-gathers it needs for the small flattened particle tensors over ICI.

Design: GSPMD-style — we annotate shardings (`NamedSharding` over a
``('p',)`` mesh axis on the particle dimension) and let the XLA partitioner
insert collectives, rather than hand-writing shard_map + psum. The SVGD state
is a pytree, so sharding it is a single ``device_put``.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_particle_mesh",
    "particle_sharding",
    "shard_state",
    "make_constraint",
    "shard_ops",
]

PARTICLE_AXIS = "p"
MC_AXIS = "mc"


def make_particle_mesh(devices=None, n_mc: int = 1) -> Mesh:
    """Mesh over all (or the given) devices with a leading particle axis.

    ``n_mc > 1`` adds a second ``'mc'`` axis (SURVEY.md §2.4 axis 2): the
    Monte-Carlo sample dimension of the gradient estimators is then sharded
    across it — useful when ``n_grad_mc_samples`` is large relative to the
    particle count (the estimator intermediates ``[P, M, d, d]`` dominate
    memory). The SVGD *state* is only ever particle-sharded; MC sharding is
    internal to a step (softmax/vjp reductions over samples become psums the
    XLA partitioner inserts).
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    if n_mc == 1:
        return Mesh(devices, (PARTICLE_AXIS,))
    if devices.size % n_mc:
        raise ValueError(f"{devices.size} devices not divisible by n_mc={n_mc}")
    return Mesh(devices.reshape(devices.size // n_mc, n_mc),
                (PARTICLE_AXIS, MC_AXIS))


def particle_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding that splits the leading (particle) axis across the mesh."""
    return NamedSharding(mesh, P(PARTICLE_AXIS))


def mc_shard_size(sharding: NamedSharding) -> int:
    """Extent of the MC mesh axis (1 when the mesh has no ``'mc'`` axis)."""
    return sharding.mesh.shape.get(MC_AXIS, 1)


def constrain_mc(tree: Any, sharding: NamedSharding) -> Any:
    """Pins ``[P, M, ...]`` estimator intermediates to (particle, mc)
    sharding — a no-op on a 1-D mesh. Leaves whose M dim does not divide the
    mc axis are left to the partitioner."""
    n_mc = mc_shard_size(sharding)
    if n_mc == 1:
        return tree
    mesh = sharding.mesh
    spec = NamedSharding(mesh, P(PARTICLE_AXIS, MC_AXIS))

    def pin(leaf):
        if (hasattr(leaf, "ndim") and leaf.ndim >= 2
                and leaf.shape[1] % n_mc == 0):
            return jax.lax.with_sharding_constraint(leaf, spec)
        return leaf

    return jax.tree_util.tree_map(pin, tree)


def _leaf_spec(sharding: NamedSharding, leaf) -> NamedSharding:
    """Shard the leading (particle) axis if it divides the mesh; replicate
    everything else.

    Only rank >= 2 leaves are considered particle-major: rank-1 leaves are
    either tiny per-particle vectors (sf_baseline — replication is free) or
    things that must never be split (the PRNG key, whose leading dim could
    coincidentally divide a small mesh).
    """
    mesh = sharding.mesh
    # divisibility by the particle-axis extent (NOT the total device count:
    # on a ('p','mc') mesh only the 'p' extent splits the leading dim)
    p_ext = mesh.shape[PARTICLE_AXIS]
    if hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.shape[0] % p_ext == 0 \
            and leaf.shape[0] > 0:
        return NamedSharding(mesh, P(PARTICLE_AXIS))
    return NamedSharding(mesh, P())


def shard_state(state: Any, sharding: NamedSharding) -> Any:
    """Device-puts an SVGD state pytree with particle-axis sharding.

    Leaves whose leading dim is not divisible by the mesh size (e.g. the
    scalar step counter or PRNG key) are replicated.
    """
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, _leaf_spec(sharding, leaf)), state
    )


def make_constraint(sharding: NamedSharding):
    """Returns a pytree-wide ``with_sharding_constraint`` for particle-major
    tensors, used inside the jitted SVGD step to pin intermediate layouts."""

    def constrain(tree):
        return jax.tree_util.tree_map(
            lambda leaf: jax.lax.with_sharding_constraint(
                leaf, _leaf_spec(sharding, leaf)
            ),
            tree,
        )

    return constrain
