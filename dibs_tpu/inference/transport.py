"""SVGD transport: kernel-weighted gradient ascent + repulsion.

The SVGD update for particle ``i`` out of ``P`` is

    phi_i = (1/P) * sum_m [ k(v_m, v_i) * ∇ log p(v_m) + ∇_{v_m} k(v_m, v_i) ]

(Liu & Wang 2016; reference: /root/reference/dibs/inference/svgd.py:194-224,
591-670). The reference computes both terms with a nested
``vmap``-of-``vmap``-of-``grad`` over particle pairs. On TPU we lower the
whole transport to Gram matmuls instead:

  * driver term:     ``K^T @ G``                  (one ``[P, P] @ [P, n]`` matmul)
  * SE repulsion:    ``c * (K^T @ V - colsum(K) ⊙ V)``  (one more matmul)

using the closed form ``∇_x k(x, y) = c * k(x, y) * (x - y)`` of the squared
exponential family. The fast path engages when the kernel exposes
``matrix``/``grad_factor_*`` (see :mod:`dibs_tpu.kernel`); arbitrary
user kernels with only the reference ``eval`` signature fall back to the
autodiff path, which reproduces the reference computation exactly.

Returned transports are *negated* so a minimizing optimizer ascends the
target, same convention as the reference (svgd.py:216).
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from jax import grad, vmap
from jax.tree_util import tree_map

__all__ = [
    "marginal_transport",
    "joint_transport",
]

def _prec():
    """Transport matmul precision — a trace-time config lookup
    (:func:`dibs_tpu.config.transport_matmul_precision`, default HIGHEST).
    At production scale (d=128, P=1000) these two matmul families are ~a
    quarter of the SVGD step. ``'high'`` (bf16x3) halves their MXU passes;
    note the repulsion difference ``K^T V − colsum ⊙ V`` nearly cancels for
    clustered particles, which amplifies matmul rounding — see the knob's
    docstring in :mod:`dibs_tpu.config` before lowering it."""
    from dibs_tpu.config import transport_matmul_precision

    return transport_matmul_precision()


def _flat(a: jnp.ndarray) -> jnp.ndarray:
    return a.reshape(a.shape[0], -1)


def _driver(k_mat: jnp.ndarray, grads: jnp.ndarray) -> jnp.ndarray:
    """``sum_m K[m, i] * grads[m]`` for all ``i`` — one MXU matmul."""
    return jnp.matmul(k_mat.T, _flat(grads),
                      precision=_prec()).reshape(grads.shape)


def _se_repulsion(k_mat: jnp.ndarray, factor, values: jnp.ndarray) -> jnp.ndarray:
    """``sum_m ∇_{v_m} k(v_m, v_i) = factor * (K^T V - colsum(K) ⊙ V)``.

    ``V`` is centered by its particle mean first: the repulsion
    ``Σ_m K[m,i] (v_m − v_i)`` is exactly invariant under ``V → V − μ``
    (both matmul terms shift consistently), but the uncentered difference
    cancels the large common component of clustered particles, so matmul
    rounding lands on ``‖v‖`` instead of ``‖v_m − v_i‖``. Centering makes
    the rounding relative to the differences — required for the bf16-pass
    precisions (see :func:`dibs_tpu.config.set_transport_matmul_precision`).
    """
    vf = _flat(values)
    vf = vf - vf.mean(axis=0, keepdims=True)
    colsum = k_mat.sum(axis=0)
    rep = factor * (jnp.matmul(k_mat.T, vf, precision=_prec())
                    - colsum[:, None] * vf)
    return rep.reshape(values.shape)


# --------------------------------------------------------------------------
# Fast (closed-form SE) paths
# --------------------------------------------------------------------------


def _fused_phi_or_none(k_own, k_other, c, values, grads, kernel):
    """One whole transport family through the fused Pallas kernel
    (:mod:`dibs_tpu.ops.transport_kernel`), or ``None`` when ineligible.

    Eligible: TPU, unsharded, fixed float bandwidth (the factor must be a
    trace-time constant), and a [P, n] shape the resident-[P, P] kernel
    tier serves. At cfg5 this replaces ~4 elementwise HBM round-trips of
    the [1000, 49k] operands (centering, rhs materialization, epilogues)
    with one fused pass — the round-4 diagnosed conversion-traffic gap.

    ``values``/``grads`` may be arrays or matching pytrees (Θ); pytree
    leaves are flattened into one [P, n] block and split back after.
    """
    if not isinstance(c, float) or getattr(kernel, "sharding", None) is not None:
        return None
    from dibs_tpu.ops.pallas_kernels import pallas_enabled
    from dibs_tpu.ops.transport_kernel import (
        transport_phi,
        transport_phi_available,
    )

    if not pallas_enabled():
        return None
    leaves_v = jax.tree_util.tree_leaves(values)
    p = leaves_v[0].shape[0]
    n = sum(leaf[0].size for leaf in leaves_v)
    if not transport_phi_available(p, n):
        return None
    vf = jnp.concatenate([leaf.reshape(p, -1) for leaf in leaves_v], axis=1)
    gf = _flat_tree(grads, p)
    mu = vf.mean(axis=0, keepdims=True)
    phi_flat = transport_phi(k_own, k_other, gf, vf, c=c, mu=mu)
    # split back into the values pytree's leaf shapes
    treedef = jax.tree_util.tree_structure(values)
    out_leaves = []
    offset = 0
    for leaf in leaves_v:
        size = leaf[0].size
        out_leaves.append(
            phi_flat[:, offset : offset + size].reshape(leaf.shape))
        offset += size
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def _flat_tree(tree, p):
    leaves = jax.tree_util.tree_leaves(tree)
    if len(leaves) == 1:
        return leaves[0].reshape(p, -1)
    return jnp.concatenate([leaf.reshape(p, -1) for leaf in leaves], axis=1)


def marginal_transport(kernel, z: jnp.ndarray, dz: jnp.ndarray) -> jnp.ndarray:
    """Transport ``phi_z`` for Z-only SVGD. Fast path if the kernel supports it."""
    n_particles = z.shape[0]
    if hasattr(kernel, "matrix_and_grad_factor"):
        k_mat, factor = kernel.matrix_and_grad_factor(z, z)
        fused = _fused_phi_or_none(k_mat, None, factor, z, dz, kernel)
        if fused is not None:
            return fused
        phi = _driver(k_mat, dz) + _se_repulsion(k_mat, factor, z)
        return -phi / n_particles
    return _marginal_transport_autodiff(kernel, z, dz)


def joint_transport(
    kernel, z: jnp.ndarray, theta: Any, dz: jnp.ndarray, dtheta: Any
) -> Tuple[jnp.ndarray, Any]:
    """Transports ``(phi_z, phi_theta)`` for joint (Z, Θ) SVGD."""
    n_particles = z.shape[0]
    if hasattr(kernel, "component_matrices_and_factors"):
        k_z, k_t, c_z, c_t = kernel.component_matrices_and_factors(
            z, theta, z, theta
        )

        phi_z = _fused_phi_or_none(k_z, k_t, c_z, z, dz, kernel)
        phi_theta = _fused_phi_or_none(k_t, k_z, c_t, theta, dtheta, kernel)
        if phi_z is not None and phi_theta is not None:
            return phi_z, phi_theta

        k_mat = k_z + k_t
        if phi_z is None:
            phi_z = _driver(k_mat, dz) + _se_repulsion(k_z, c_z, z)
            phi_z = -phi_z / n_particles
        if phi_theta is None:
            phi_theta = tree_map(
                lambda g_leaf, v_leaf: -(
                    _driver(k_mat, g_leaf) + _se_repulsion(k_t, c_t, v_leaf)
                )
                / n_particles,
                dtheta,
                theta,
            )
        return phi_z, phi_theta
    return _joint_transport_autodiff(kernel, z, theta, dz, dtheta)


# --------------------------------------------------------------------------
# Generic autodiff fallbacks (reference-equivalent, any kernel with .eval)
# --------------------------------------------------------------------------


def _marginal_transport_autodiff(kernel, z, dz):
    f_kernel = lambda a, b: kernel.eval(x=a, y=b)
    k_mat = vmap(vmap(f_kernel, (None, 0)), (0, None))(z, z)

    def phi_single(single_z, kxx_col):
        weighted = kxx_col[:, None, None, None] * dz
        repulsion = vmap(grad(f_kernel, 0), (0, None))(z, single_z)
        return -(weighted + repulsion).mean(axis=0)

    return vmap(phi_single, (0, 1))(z, k_mat)


def _joint_transport_autodiff(kernel, z, theta, dz, dtheta):
    f_kernel = lambda az, at, bz, bt: kernel.eval(
        x_latent=az, x_theta=at, y_latent=bz, y_theta=bt
    )
    k_mat = vmap(vmap(f_kernel, (None, None, 0, 0)), (0, 0, None, None))(
        z, theta, z, theta
    )

    def phi_z_single(single_z, single_theta, kxx_col):
        weighted = kxx_col[:, None, None, None] * dz
        repulsion = vmap(grad(f_kernel, 0), (0, 0, None, None))(
            z, theta, single_z, single_theta
        )
        return -(weighted + repulsion).mean(axis=0)

    def phi_theta_single(single_z, single_theta, kxx_col):
        weighted = tree_map(
            lambda leaf: kxx_col.reshape((-1,) + (1,) * (leaf.ndim - 1)) * leaf,
            dtheta,
        )
        repulsion = vmap(grad(f_kernel, 1), (0, 0, None, None))(
            z, theta, single_z, single_theta
        )
        return tree_map(
            lambda w_leaf, r_leaf: -(w_leaf + r_leaf).mean(axis=0),
            weighted,
            repulsion,
        )

    phi_z = vmap(phi_z_single, (0, 0, 1))(z, theta, k_mat)
    phi_theta = vmap(phi_theta_single, (0, 0, 1))(z, theta, k_mat)
    return phi_z, phi_theta
