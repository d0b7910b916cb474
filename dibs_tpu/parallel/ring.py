"""Ring-blockwise SVGD transport over a mesh-sharded particle axis.

The ``[P, P]`` kernel matrix + transport is the only cross-particle coupling
in SVGD (reference svgd.py:258-261, 710-714). The plain sharded path
all-gathers the opposite side and computes ``[P_local, P]`` row blocks
(:func:`dibs_tpu.parallel.shard_ops.sharded_se_matrix`); this module is the
ring formulation — the SURVEY §5 "sequence-parallel analog": each device
keeps only its local particle block resident, and at ring step ``r``
computes one ``[P_blk, P_local]`` kernel tile against the block received
from its neighbor while ``jax.lax.ppermute`` forwards that block onward.
XLA's latency-hiding scheduler overlaps the permute with the tile compute,
so at scale the ICI transfer of the rotating ``(v, grad)`` blocks hides
behind the Gram matmuls, and no device ever materializes the full particle
batch — the resident working set per device is ``O(2 P/N · n)`` instead of
``O(P · n)``.

Everything the transport needs is ring-accumulable:

    driver_i    = Σ_m K[m, i] · grad_m          (tile-matmul partial sums)
    repulsion_i = c · (Σ_m K[m, i] · v_m  −  (Σ_m K[m, i]) · v_i)

Used automatically by the SVGD engine when the particle axis is sharded and
the kernel exposes the closed-form SE interface; numerically equal to the
unsharded transport up to summation order (tested on the virtual mesh).
The median-heuristic bandwidth needs the global distance matrix and falls
back to the all-gather path.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.tree_util import tree_leaves

from dibs_tpu.parallel.shard_ops import particle_axis_name, shard_map

__all__ = ["ring_marginal_transport", "ring_joint_transport", "ring_available"]

_HI = jax.lax.Precision.HIGHEST


def _prec():
    """Driver/repulsion matmul precision — same trace-time knob as the
    unsharded transport (dibs_tpu.config.transport_matmul_precision).
    The Gram cross-term stays at HIGHEST: its output feeds an exp."""
    from dibs_tpu.config import transport_matmul_precision

    return transport_matmul_precision()


def _flat(tree) -> jnp.ndarray:
    leaves = tree_leaves(tree)
    return jnp.concatenate(
        [leaf.reshape(leaf.shape[0], -1) for leaf in leaves], axis=1
    )


def _unflat_like(flat: jnp.ndarray, tree):
    import math

    out, off = [], 0
    leaves = tree_leaves(tree)
    for leaf in leaves:
        n = math.prod(leaf.shape[1:])
        out.append(flat[:, off:off + n].reshape(leaf.shape))
        off += n
    treedef = jax.tree_util.tree_structure(tree)
    return jax.tree_util.tree_unflatten(treedef, out)


def ring_available(kernel, sharding) -> bool:
    """Ring transport needs a mesh + one of the built-in fixed-bandwidth SE
    kernels (the tile formula reads their ``h``/``scale`` directly; custom
    kernels go through the all-gather / autodiff paths)."""
    from dibs_tpu.kernel import (
        AdditiveFrobeniusSEKernel,
        JointAdditiveFrobeniusSEKernel,
    )

    if sharding is None:
        return False
    if not isinstance(kernel, (AdditiveFrobeniusSEKernel,
                               JointAdditiveFrobeniusSEKernel)):
        return False
    return not (
        isinstance(getattr(kernel, "h", None), str)
        or isinstance(getattr(kernel, "h_latent", None), str)
        or isinstance(getattr(kernel, "h_theta", None), str)
    )


def _se_tile(x_blk, y_loc, h, scale):
    """``[P_blk, n] x [P_loc, n] -> [P_blk, P_loc]`` SE tile (Gram form)."""
    x_sq = jnp.sum(x_blk * x_blk, axis=1, keepdims=True)
    y_sq = jnp.sum(y_loc * y_loc, axis=1, keepdims=True)
    cross = jnp.matmul(x_blk, y_loc.T, precision=_HI)
    return scale * jnp.exp(-(x_sq + y_sq.T - 2.0 * cross) / h)


def _payload_dtype():
    """Wire dtype of the rotating blocks — trace-time config lookup
    (:func:`dibs_tpu.config.ring_payload_dtype`, default f32). With bf16
    the ppermute payload halves; see the knob's docstring for the
    numerics contract."""
    from dibs_tpu.config import ring_payload_dtype

    return ring_payload_dtype()


def _ring_loop(axis, n_dev, rotating, tile_step, acc_init):
    """Rotates ``rotating`` (a tuple of [P_blk, n] arrays) around the ring;
    ``tile_step(blocks) -> acc contributions`` runs once per resident block.
    Static python loop: n_dev tiles, each overlapped with the next permute.

    ``tile_step`` receives blocks upcast to f32. The wire dtype of the
    rotation is ``config.ring_payload_dtype()``: blocks are cast before the
    FIRST permute only (the cast is a no-op afterwards — blocks forward
    as-received, so quantization error does not compound around the ring)
    and the r=0 self-tile always sees the exact f32 block."""
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    wire = _payload_dtype()
    acc = acc_init
    blocks = rotating
    for r in range(n_dev):
        acc = tile_step(acc, tuple(b.astype(jnp.float32) for b in blocks))
        if r < n_dev - 1:  # last tile needs no forward
            blocks = tuple(
                jax.lax.ppermute(b.astype(wire), axis, perm) for b in blocks
            )
    return acc


def ring_marginal_transport(kernel, z: jnp.ndarray, dz: jnp.ndarray,
                            sharding: NamedSharding) -> jnp.ndarray:
    """Ring analog of :func:`dibs_tpu.inference.transport.marginal_transport`."""
    axis = particle_axis_name(sharding)
    n_dev = sharding.mesh.shape[axis]
    n_particles = z.shape[0]
    h, scale, factor = kernel.h, kernel.scale, kernel.grad_factor_z()

    def body(z_loc, dz_loc):
        z_f, dz_f = _flat(z_loc), _flat(dz_loc)
        # Center by the GLOBAL particle mean (one [1, n] psum), mirroring the
        # unsharded transport: the repulsion is exactly shift-invariant, and
        # centering makes matmul rounding relative to particle differences
        # instead of ||v|| (see transport._se_repulsion). Distances (and thus
        # the kernel tiles) are shift-invariant too, so centering before the
        # ring keeps every rotating block consistent.
        mu = jax.lax.psum(z_f.sum(axis=0, keepdims=True), axis) / n_particles
        z_f = z_f - mu

        def tile_step(acc, blocks):
            zb, dzb = blocks
            k_blk = _se_tile(zb, z_f, h, scale)  # [P_blk, P_loc]
            drv, rep_kv, colsum = acc
            drv = drv + jnp.matmul(k_blk.T, dzb, precision=_prec())
            rep_kv = rep_kv + jnp.matmul(k_blk.T, zb, precision=_prec())
            colsum = colsum + k_blk.sum(axis=0)
            return drv, rep_kv, colsum

        zero = jnp.zeros_like(z_f)
        drv, rep_kv, colsum = _ring_loop(
            axis, n_dev, (z_f, dz_f), tile_step,
            (jnp.zeros_like(dz_f), zero, jnp.zeros(z_f.shape[0])),
        )
        rep = factor * (rep_kv - colsum[:, None] * z_f)
        return (-(drv + rep) / n_particles).reshape(z_loc.shape)

    fn = shard_map(
        body, mesh=sharding.mesh, in_specs=(P(axis), P(axis)),
        out_specs=P(axis), check_vma=False,
    )
    return fn(z, dz)


def ring_joint_transport(kernel, z: jnp.ndarray, theta: Any,
                         dz: jnp.ndarray, dtheta: Any,
                         sharding: NamedSharding) -> Tuple[jnp.ndarray, Any]:
    """Ring analog of :func:`dibs_tpu.inference.transport.joint_transport`.

    Θ pytrees rotate as one flattened ``[P_blk, n_theta]`` block; the joint
    kernel ``K = K_z + K_θ`` drives both transports, with the component
    matrices supplying the two repulsion terms.
    """
    axis = particle_axis_name(sharding)
    n_dev = sharding.mesh.shape[axis]
    n_particles = z.shape[0]
    h_z, h_t = kernel.h_latent, kernel.h_theta
    s_z, s_t = kernel.scale_latent, kernel.scale_theta
    c_z, c_t = kernel.grad_factor_z(), kernel.grad_factor_theta()

    def body(z_loc, dz_loc, th_f_loc, dth_f_loc):
        z_f, dz_f = _flat(z_loc), _flat(dz_loc)
        # Global-mean centering of both particle families — same rationale
        # as the marginal ring (repulsion + distances are shift-invariant).
        mu_z = jax.lax.psum(z_f.sum(axis=0, keepdims=True), axis) \
            / n_particles
        mu_t = jax.lax.psum(th_f_loc.sum(axis=0, keepdims=True), axis) \
            / n_particles
        z_f = z_f - mu_z
        th_f_loc = th_f_loc - mu_t

        def tile_step(acc, blocks):
            zb, dzb, tb, dtb = blocks
            kz_blk = _se_tile(zb, z_f, h_z, s_z)
            kt_blk = _se_tile(tb, th_f_loc, h_t, s_t)
            k_blk = kz_blk + kt_blk
            (drv_z, rep_z, cs_z, drv_t, rep_t, cs_t) = acc
            drv_z = drv_z + jnp.matmul(k_blk.T, dzb, precision=_prec())
            rep_z = rep_z + jnp.matmul(kz_blk.T, zb, precision=_prec())
            cs_z = cs_z + kz_blk.sum(axis=0)
            drv_t = drv_t + jnp.matmul(k_blk.T, dtb, precision=_prec())
            rep_t = rep_t + jnp.matmul(kt_blk.T, tb, precision=_prec())
            cs_t = cs_t + kt_blk.sum(axis=0)
            return drv_z, rep_z, cs_z, drv_t, rep_t, cs_t

        p_loc = z_f.shape[0]
        acc0 = (jnp.zeros_like(dz_f), jnp.zeros_like(z_f), jnp.zeros(p_loc),
                jnp.zeros_like(dth_f_loc), jnp.zeros_like(th_f_loc),
                jnp.zeros(p_loc))
        drv_z, rep_kv_z, cs_z, drv_t, rep_kv_t, cs_t = _ring_loop(
            axis, n_dev, (z_f, dz_f, th_f_loc, dth_f_loc), tile_step, acc0,
        )
        phi_z = -(drv_z + c_z * (rep_kv_z - cs_z[:, None] * z_f)) / n_particles
        phi_t = -(drv_t + c_t * (rep_kv_t - cs_t[:, None] * th_f_loc)) \
            / n_particles
        return phi_z.reshape(z_loc.shape), phi_t

    fn = shard_map(
        body, mesh=sharding.mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)), check_vma=False,
    )
    phi_z, phi_t_flat = fn(z, dz, _flat(theta), _flat(dtheta))
    return phi_z, _unflat_like(phi_t_flat, theta)
