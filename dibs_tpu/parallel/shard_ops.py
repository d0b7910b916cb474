"""shard_map wrappers that make the Pallas kernels compose with a mesh.

Under plain GSPMD a ``pallas_call`` has no partitioning rule, so the XLA
partitioner replicates its operands — with a mesh-sharded particle axis that
silently all-gathers every ``[P, ...]`` tensor onto every chip and defeats
the sharding (round-1 pinned Pallas off under sharding for this reason).

The fix is `shard_map`: each chip runs the kernel on its local particle
block. Two invariants keep the sharded run *bitwise identical* to the
unsharded one:

* **Global-index seeding.** The graph-sampling kernels seed the TPU hardware
  PRNG per grid cell as ``seed + b * 1000003`` with ``b`` the particle index
  within the call. Passing each shard ``seed + (axis_index * p_local) *
  1000003`` makes the local cell ``b`` compute exactly the global cell's
  seed (int32 wraparound is associative), so every particle draws the same
  bits regardless of the mesh shape.
* **Row-block kernel tiles.** The SE kernel matrix is computed as
  ``[P_local, P]`` row blocks against the all-gathered opposite side — each
  entry is the same fused-tile computation as the unsharded kernel.

All wrappers are mesh-shape-generic (the particle axis name comes from the
sharding's spec) and are no-ops worth of overhead on a 1-device mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # moved out of experimental in recent JAX
    from jax import shard_map as _shard_map_mod  # type: ignore

    shard_map = _shard_map_mod  # jax.shard_map is the function itself
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

MC_AXIS = "mc"

__all__ = [
    "particle_axis_name",
    "sharded_gumbel_graphs",
    "sharded_se_matrix",
    "sharded_fused_linear",
    "sharded_fused_nonlinear",
]

_SEED_STRIDE = 1000003  # must match ops/pallas_kernels.py grid-cell seeding


def particle_axis_name(sharding: Optional[NamedSharding]) -> Optional[str]:
    """First mesh axis of the sharding's spec (the particle axis), if any."""
    if sharding is None:
        return None
    for entry in sharding.spec:
        if entry is not None:
            return entry if isinstance(entry, str) else entry[0]
    mesh_axes = list(sharding.mesh.shape.keys())
    return mesh_axes[0] if mesh_axes else None


def _mesh_size(sharding: NamedSharding, axis: str) -> int:
    return sharding.mesh.shape[axis]


def divides_mesh(sharding: Optional[NamedSharding], n: int) -> bool:
    """True if a leading axis of size ``n`` splits evenly over the mesh."""
    if sharding is None:
        return False
    axis = particle_axis_name(sharding)
    return axis is not None and n % _mesh_size(sharding, axis) == 0


def sharded_gumbel_graphs(scores, seed, alpha, tau, n_samples, *,
                          sharding: NamedSharding, hard: bool = False,
                          interpret: bool = False):
    """Per-shard Pallas Gumbel graph sampling, bitwise equal to unsharded.

    ``scores``: ``[P, d, d]`` (particle axis sharded); returns
    ``[P, n_samples, d, d]`` sharded the same way. On a 2-D ``('p', 'mc')``
    mesh the sample axis is additionally split over ``'mc'`` (each shard
    generates its global sample-group block — the in-kernel per-group seed
    stride makes this bitwise equal too), provided the per-shard sample
    count keeps the kernel's group size; otherwise ``'mc'`` shards compute
    replicated samples (still correct).
    """
    from dibs_tpu.ops.pallas_kernels import _GROUP_SEED_STRIDE, _SAMPLE_BLOCK
    from dibs_tpu.ops.soft_graphs import _pallas_graphs_padded

    axis = particle_axis_name(sharding)
    p_local = scores.shape[0] // _mesh_size(sharding, axis)
    mc_axis = MC_AXIS if sharding.mesh.shape.get(MC_AXIS, 1) > 1 else None
    n_mc = sharding.mesh.shape.get(MC_AXIS, 1) if mc_axis else 1
    split_mc = (
        mc_axis is not None
        and n_samples % (n_mc * _SAMPLE_BLOCK) == 0
    )
    n_local = n_samples // n_mc if split_mc else n_samples

    def body(scores_blk, seed_, alpha_, tau_):
        offset = jax.lax.axis_index(axis).astype(jnp.int32) * p_local
        seed_blk = seed_ + offset * jnp.int32(_SEED_STRIDE)
        if split_mc:
            groups_local = n_local // _SAMPLE_BLOCK
            g_off = jax.lax.axis_index(mc_axis).astype(jnp.int32) * groups_local
            seed_blk = seed_blk + g_off * jnp.int32(_GROUP_SEED_STRIDE)
        return _pallas_graphs_padded(
            scores_blk, seed_blk, alpha_, tau_, n_local, hard=hard,
        )

    out_spec = P(axis, mc_axis) if split_mc else P(axis)
    fn = shard_map(
        body,
        mesh=sharding.mesh,
        in_specs=(P(axis), P(), P(), P()),
        out_specs=out_spec,
        check_vma=False,  # pallas_call carries no varying-axes info
    )
    return fn(
        scores,
        jnp.asarray(seed, jnp.int32),
        jnp.asarray(alpha, jnp.float32),
        jnp.asarray(tau, jnp.float32),
    )


def sharded_se_matrix(x, y, h: float, scale: float, *,
                      sharding: NamedSharding, interpret: bool = False):
    """``[A, n] x [B, n] -> [A, B]`` fused SE kernel matrix, computed as
    ``[A_local, B]`` row blocks per shard (``y`` is all-gathered — it is a
    small flattened particle batch; the ``[A, B]`` output stays row-sharded).
    """
    from dibs_tpu.ops.pallas_kernels import fused_se_matrix

    axis = particle_axis_name(sharding)

    def body(x_blk, y_all):
        return fused_se_matrix(x_blk, y_all, h, scale, interpret=interpret)

    fn = shard_map(
        body,
        mesh=sharding.mesh,
        in_specs=(P(axis), P()),
        out_specs=P(axis),
        check_vma=False,  # pallas_call carries no varying-axes info
    )
    return fn(x, y)


def sharded_fused_linear(*, zs, thetas, x, interv_mask, key, alpha, tau,
                         n_samples, model, sharding: NamedSharding,
                         bf16: bool = False):
    """Runs the fused linear-Gaussian sample-and-score estimator per shard.

    The whole kernel (single-pass online-softmax by default; the legacy
    two-pass seed-replay scheme behind ``fused_linear._SINGLE_PASS``) has
    no cross-particle coupling, so it runs entirely within each shard;
    per-sample state never leaves the chip. Seeding uses the global
    particle index, so the result is bitwise equal to the unsharded call.
    """
    from dibs_tpu.inference.fused_linear import fused_linear_estimators

    axis = particle_axis_name(sharding)
    p_local = zs.shape[0] // _mesh_size(sharding, axis)

    def body(zs_blk, thetas_blk, x_, interv_, key_, alpha_):
        offset = jax.lax.axis_index(axis) * p_local
        return fused_linear_estimators(
            zs=zs_blk, thetas=thetas_blk, x=x_, interv_mask=interv_,
            key=key_, alpha=alpha_, tau=tau, n_samples=n_samples, model=model,
            bf16=bf16, seed_offset=offset,
        )

    fn = shard_map(
        body,
        mesh=sharding.mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,  # pallas_call carries no varying-axes info
    )
    return fn(zs, thetas, x, interv_mask, key, jnp.asarray(alpha, jnp.float32))


def sharded_fused_nonlinear(*, zs, thetas, x, interv_mask, key, alpha, tau,
                            n_samples, model, sharding: NamedSharding):
    """Runs the single-pass nonlinear sample-and-score kernel per shard.

    Same structure as :func:`sharded_fused_linear`: the online-softmax
    estimator has no cross-particle coupling, so each chip processes its
    local particle block; global-index seeding keeps the sharded run
    bitwise equal to the unsharded one.
    """
    from dibs_tpu.inference.fused_nonlinear import fused_nonlinear_estimators

    axis = particle_axis_name(sharding)
    p_local = zs.shape[0] // _mesh_size(sharding, axis)

    def body(zs_blk, thetas_blk, x_, interv_, key_, alpha_):
        offset = jax.lax.axis_index(axis) * p_local
        return fused_nonlinear_estimators(
            zs=zs_blk, thetas=thetas_blk, x=x_, interv_mask=interv_,
            key=key_, alpha=alpha_, tau=tau, n_samples=n_samples,
            model=model, seed_offset=offset,
        )

    fn = shard_map(
        body,
        mesh=sharding.mesh,
        in_specs=(P(axis), P(axis), P(), P(), P(), P()),
        out_specs=(P(axis), P(axis)),
        check_vma=False,  # pallas_call carries no varying-axes info
    )
    return fn(zs, thetas, x, interv_mask, key, jnp.asarray(alpha, jnp.float32))
