"""Fleet inference: many independent structure-learning problems at once.

BEYOND-REFERENCE capability. Production structure-learning workloads are
often fleets of small problems (per-gene-module networks, per-segment
causal models) rather than one large graph. ``fleet_sample`` runs ONE
engine's SVGD on ``B`` independent same-shaped datasets in a single XLA
program by vmapping the whole step over the dataset axis, and optionally
shards that axis over a ``jax.sharding.Mesh``. Datasets are *fully*
independent — no cross-dataset coupling exists anywhere (unlike the
particle axis, whose [P, P] SVGD kernel couples shards), so mesh scaling
is embarrassingly parallel: each chip runs its local datasets with zero
collectives.

Single-chip expectations (measured, benchmarks/FLEET_SCALING.json): the
d=20 engines are VPU/MXU-THROUGHPUT-bound, so fleet batching does not
beat running problems serially on one chip (aggregate at B=8 measured
~0.8x serial; per-dataset cost is linear in B with r^2 > 0.998). Use
fleet for one-program convenience, and for throughput use the
``datasets`` mesh axis across chips.

The engine's fused Pallas kernels compose with the dataset vmap (the
batch dimension joins the Pallas grid; validated on hardware) and with
``shard_map`` over the mesh (each shard runs its local vmapped batch).

Typical use::

    dibs = JointDiBS(x=xs[0], graph_model=gm, likelihood_model=lm)
    gs, thetas = fleet_sample(dibs, xs=xs, key=key, n_particles=20,
                              steps=2000)          # gs: [B, P, d, d]

    # across a pod slice: one dataset group per chip
    mesh = jax.make_mesh((jax.device_count(),), ("datasets",))
    gs, thetas = fleet_sample(dibs, xs=xs, key=key, n_particles=20,
                              steps=2000, mesh=mesh)
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax, random, vmap

from dibs_tpu.inference.svgd import _MAX_CHUNK_STEPS

__all__ = ["fleet_sample"]


def fleet_sample(dibs, *, xs, key, n_particles, steps, interv_masks=None,
                 mesh=None, axis_name: str = "datasets",
                 return_states: bool = False):
    """Runs ``dibs``'s SVGD on ``B`` independent datasets in one program.

    Args:
        dibs: a constructed :class:`MarginalDiBS` or :class:`JointDiBS`.
            Its models and hyperparameters are reused for every dataset;
            its own ``x`` only defines the common ``[N, d]`` shape. Must
            not carry a particle ``sharding`` (the fleet shards the
            dataset axis instead).
        xs: ``[B, N, d]`` observation batches (same shape as ``dibs.x``).
        key: PRNG key; split into one independent init/run key per dataset.
        interv_masks: optional ``[B, N, d]`` hard-intervention masks
            (defaults to all-observational, matching the engine).
        mesh: optional :class:`jax.sharding.Mesh` with axis ``axis_name``;
            datasets are sharded over it (``B`` must divide the axis
            size). Sharded and unsharded runs are bitwise identical.
        return_states: also return the stacked final :class:`SVGDState`.

    Returns:
        ``gs [B, P, d, d]`` for marginal engines;
        ``(gs, thetas)`` (theta leaves with leading ``[B, P]``) for joint.
    """
    if dibs.sharding is not None:
        raise ValueError(
            "fleet_sample shards the dataset axis; construct the engine "
            "without a particle sharding (sharding=None)"
        )
    xs = jnp.asarray(xs)
    if xs.ndim != 3 or xs.shape[1:] != dibs.x.shape:
        raise ValueError(
            f"xs must be [B, N, d] with (N, d) == {tuple(dibs.x.shape)}; "
            f"got {tuple(xs.shape)}"
        )
    n_b = xs.shape[0]
    if interv_masks is None:
        interv_masks = jnp.zeros_like(xs, dtype=jnp.int32)
    interv_masks = jnp.asarray(interv_masks)
    if interv_masks.shape != xs.shape:
        raise ValueError("interv_masks must match xs's shape")

    keys = random.split(key, n_b)
    states = vmap(
        lambda k: dibs.init_state(key=k, n_particles=n_particles)
    )(keys)

    n_dim = states.z.shape[3]

    # cache the traced/compiled chunk runner on the engine — repeated
    # fleet_sample calls with the same shapes would otherwise re-trace the
    # whole vmapped loop each call (~2s, dominating short runs)
    cache = dibs.__dict__.setdefault("_fleet_chunk_cache", {})
    cache_key = (n_b, n_particles, n_dim, tuple(xs.shape),
                 id(mesh), axis_name)
    run_chunk = cache.get(cache_key)
    if run_chunk is None:
        step_fn = dibs._make_step(dibs._resolve_latent_std(n_dim))
        bstep = vmap(step_fn, in_axes=(0, 0, 0))

        def run_chunk_local(st, x_b, interv_b, n_steps):
            return lax.fori_loop(
                0, n_steps, lambda _, s: bstep(s, x_b, interv_b), st
            )

        if mesh is None:
            run_chunk = jax.jit(run_chunk_local, static_argnames="n_steps")
        else:
            from functools import partial

            from jax.sharding import PartitionSpec as P

            from dibs_tpu.parallel.shard_ops import shard_map

            axis = mesh.shape[axis_name]
            if n_b % axis != 0:
                raise ValueError(
                    f"B={n_b} must divide the '{axis_name}' mesh axis "
                    f"({axis})"
                )

            def run_chunk(st, x_b, interv_b, n_steps):
                fn = shard_map(
                    partial(run_chunk_local, n_steps=n_steps),
                    mesh=mesh,
                    in_specs=(P(axis_name), P(axis_name), P(axis_name)),
                    out_specs=P(axis_name),
                    check_vma=False,  # pallas carries no varying-axes info
                )
                return jax.jit(fn)(st, x_b, interv_b)

        cache[cache_key] = run_chunk

    done = 0
    while done < steps:
        m = min(_MAX_CHUNK_STEPS, steps - done)
        states = run_chunk(states, xs, interv_masks, n_steps=m)
        done += m

    z_final = jax.device_get(states.z)
    gs = vmap(dibs.particle_to_g_lim)(z_final)
    if states.theta is not None:
        thetas = jax.device_get(states.theta)
        if return_states:
            return gs, thetas, states
        return gs, thetas
    if return_states:
        return gs, states
    return gs
