"""SVGD kernels with MXU-native batched evaluation.

Behavioral spec: /root/reference/dibs/kernel.py. The reference evaluates the
kernel pairwise through nested ``vmap`` and obtains repulsion gradients by
autodiff per particle pair (svgd.py:165-192, 554-588). For the squared
exponential family both the kernel matrix and its gradients have closed
forms that reduce to Gram matmuls:

    k(Z, Z')          = scale * exp(-||Z - Z'||_F^2 / h)
    ∇_Z k(Z, Z')      = -(2 / h) * k(Z, Z') * (Z - Z')

so the ``[P, P]`` kernel matrix is one ``[P, n] @ [n, P]`` matmul plus a
fused exp, and the summed repulsion term of the SVGD transport becomes a
second matmul (see :mod:`dibs_tpu.inference.svgd`). Bandwidths are fixed
constants, exactly like the reference (no median heuristic by default).

Custom kernels remain supported: any object with the reference's ``eval``
signature works through the engine's autodiff fallback path; the fast path
engages when the kernel provides the ``*_matrix`` methods defined here.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax.tree_util import tree_leaves

from dibs_tpu.ops.pallas_kernels import fused_se_matrix, pallas_enabled
from dibs_tpu.utils.func import pytree_sq_norm_matrix, squared_norm_pytree

__all__ = ["AdditiveFrobeniusSEKernel", "JointAdditiveFrobeniusSEKernel"]

# Auto-dispatch crossover for the SE kernel matrix (measured on TPU v5e:
# benchmarks/SE_CROSSOVER{,2}.json + end-to-end A/Bs; see _se_matrix).
# Pallas serves one-padded-tile outputs with modest reductions; the XLA
# Gram form serves everything larger.
_PALLAS_SE_MAX_ROWS = 128
_PALLAS_SE_MAX_FEATURES = 8192


def _flatten_rows(tree) -> jnp.ndarray:
    """Flattens a batched pytree to ``[batch, n]`` (concat over leaves)."""
    leaves = tree_leaves(tree)
    return jnp.concatenate(
        [leaf.reshape(leaf.shape[0], -1) for leaf in leaves], axis=1
    )


def _median_bandwidth(sq: jnp.ndarray) -> jnp.ndarray:
    """Median-heuristic bandwidth ``med(sq) / log(P)`` (Liu & Wang 2016).

    An *extension* over the reference, which only supports fixed bandwidths
    (kernel.py:16,46); select with ``h="median"``. Clamped away from zero
    for the degenerate all-identical-particles case.
    """
    p = sq.shape[0]
    med = jnp.median(sq)
    return jnp.maximum(med / jnp.log(p + 1.0), 1e-5)


def _se_matrix(xs, ys, h, scale, use_pallas, sharding=None):
    """SE kernel matrix with automatic Pallas/XLA dispatch.

    ``h`` may be a fixed float (reference behavior) or ``"median"`` for the
    per-step median heuristic (always computed on the XLA path — it needs
    the materialized distance matrix).

    With ``sharding`` (mesh-sharded particle axis) the fused Pallas kernel
    runs per shard via ``shard_map``, producing row blocks ``[P_local, P]``
    against the all-gathered opposite side instead of replicating both
    operands under GSPMD (see :mod:`dibs_tpu.parallel.shard_ops`).
    """
    if h == "median":
        sq = pytree_sq_norm_matrix(xs, ys)
        return scale * jnp.exp(-sq / _median_bandwidth(sq))
    if use_pallas is None:
        # Auto dispatch, measured on TPU both standalone
        # (benchmarks/SE_CROSSOVER.json) and inside a jitted chain
        # (SE_CROSSOVER2.json) plus end-to-end A/Bs:
        #   * SMALL shapes (P <= 128 rows, n <= 8192 features — one padded
        #     output tile, modest reduction): the fused Pallas kernel wins;
        #     the XLA form's unfused reduce/broadcast/exp epilogue costs
        #     ~20-30 us per evaluation in-program vs ~5 us fused (3-16% of
        #     a whole d=20/30 step).
        #   * LARGE shapes (P >= 256 or huge n): the plain XLA Gram form
        #     with the cross-term at HIGHEST wins 1.4-2.3x — the [P, P]
        #     matrix the kernel avoids rematerializing is tiny next to the
        #     [P, n] operands, and XLA tiles the big matmul better than
        #     Mosaic (cfg5 end-to-end: 20.5 -> 22.1 steps/s).
        #   * MESH-SHARDED particle axis: always the Pallas shard_map path,
        #     which computes [P_local, P] row blocks against the gathered
        #     opposite side instead of letting GSPMD replicate both
        #     operands.
        if sharding is not None:
            use_pallas = pallas_enabled()
        else:
            leaves_x, leaves_y = tree_leaves(xs), tree_leaves(ys)
            rows = max(leaves_x[0].shape[0], leaves_y[0].shape[0])
            n_feat = sum(leaf[0].size for leaf in leaves_x)
            use_pallas = (pallas_enabled() and rows <= _PALLAS_SE_MAX_ROWS
                          and n_feat <= _PALLAS_SE_MAX_FEATURES)
    if use_pallas:
        x_rows, y_rows = _flatten_rows(xs), _flatten_rows(ys)
        if sharding is not None:
            from dibs_tpu.parallel.shard_ops import (
                divides_mesh,
                sharded_se_matrix,
            )

            if divides_mesh(sharding, x_rows.shape[0]):
                return sharded_se_matrix(
                    x_rows, y_rows, h, scale, sharding=sharding
                )
        return fused_se_matrix(x_rows, y_rows, h, scale)
    return scale * jnp.exp(-pytree_sq_norm_matrix(xs, ys) / h)


class AdditiveFrobeniusSEKernel:
    """Squared-exponential kernel over latent particles ``Z``.

    ``k(Z, Z') = scale * exp(-||Z - Z'||_F^2 / h)``
    (class default ``h=20``; :class:`~dibs_tpu.inference.MarginalDiBS`
    overrides to ``h=5`` — same asymmetry as the reference, svgd.py:81 vs
    kernel.py:16).
    """

    def __init__(self, *, h=20.0, scale=1.0, use_pallas=None):
        self.h = h
        self.scale = scale
        self.use_pallas = use_pallas  # None = auto (TPU only)
        self.sharding = None  # set by the engine when mesh-sharded

    def eval(self, *, x, y):
        """Single-pair kernel value (reference-compatible signature)."""
        if isinstance(self.h, str):
            raise TypeError(
                "h='median' needs the particle batch; use matrix()/the "
                "engine's batched path, not single-pair eval()."
            )
        return self.scale * jnp.exp(-jnp.sum((x - y) ** 2.0) / self.h)

    def matrix(self, xs, ys):
        """Pairwise kernel matrix ``[A, B]``: Gram-form XLA matmul (HIGHEST)
        on one chip, fused Pallas row blocks per shard when mesh-sharded."""
        return _se_matrix(xs, ys, self.h, self.scale, self.use_pallas,
                          self.sharding)

    def matrix_and_grad_factor(self, xs, ys):
        """``(K, c)`` with ``∇_x k(x, y) = c * k(x, y) * (x - y)`` — the pair
        the SVGD transport consumes (``c`` reflects the effective bandwidth,
        including the median heuristic)."""
        if self.h == "median":
            sq = pytree_sq_norm_matrix(xs, ys)
            h_eff = _median_bandwidth(sq)
            return self.scale * jnp.exp(-sq / h_eff), -2.0 / h_eff
        return self.matrix(xs, ys), -2.0 / self.h

    def grad_factor_z(self):
        """Scalar ``c`` such that ``∇_x k(x, y) = c * k(x, y) * (x - y)``."""
        return -2.0 / self.h


class JointAdditiveFrobeniusSEKernel:
    """Additive SE kernel over ``(Z, Θ)`` particle pairs.

    ``k((Z, Θ), (Z', Θ')) = scale_z * exp(-||Z - Z'||^2 / h_z)
                           + scale_θ * exp(-||Θ - Θ'||^2 / h_θ)``

    The two addends have disjoint dependencies, so the Z-repulsion only
    involves the latent term and the Θ-repulsion only the theta term; the
    engine therefore asks for the two component matrices separately.
    """

    def __init__(self, *, h_latent=5.0, h_theta=500.0, scale_latent=1.0,
                 scale_theta=1.0, use_pallas=None):
        self.h_latent = h_latent
        self.h_theta = h_theta
        self.scale_latent = scale_latent
        self.scale_theta = scale_theta
        self.use_pallas = use_pallas  # None = auto (TPU only)
        self.sharding = None  # set by the engine when mesh-sharded

    def eval(self, *, x_latent, x_theta, y_latent, y_theta):
        """Single-pair kernel value (reference-compatible signature)."""
        if isinstance(self.h_latent, str) or isinstance(self.h_theta, str):
            raise TypeError(
                "h='median' needs the particle batch; use the engine's "
                "batched path, not single-pair eval()."
            )
        latent_sq = jnp.sum((x_latent - y_latent) ** 2.0)
        theta_sq = squared_norm_pytree(x_theta, y_theta)
        return (
            self.scale_latent * jnp.exp(-latent_sq / self.h_latent)
            + self.scale_theta * jnp.exp(-theta_sq / self.h_theta)
        )

    def component_matrices_and_factors(self, x_latents, x_thetas, y_latents,
                                       y_thetas):
        """``(K_z, K_theta, c_z, c_theta)`` — matrices plus the repulsion
        factors at the effective (possibly median-heuristic) bandwidths."""

        def component(xs, ys, h, scale):
            if h == "median":
                sq = pytree_sq_norm_matrix(xs, ys)
                h_eff = _median_bandwidth(sq)
                return scale * jnp.exp(-sq / h_eff), -2.0 / h_eff
            return _se_matrix(xs, ys, h, scale, self.use_pallas,
                              self.sharding), -2.0 / h

        k_z, c_z = component(x_latents, y_latents, self.h_latent,
                             self.scale_latent)
        k_t, c_t = component(x_thetas, y_thetas, self.h_theta,
                             self.scale_theta)
        return k_z, k_t, c_z, c_t

    def component_matrices(self, x_latents, x_thetas, y_latents, y_thetas):
        """Returns ``(K_z, K_theta)`` pairwise component matrices ``[A, B]``."""
        k_z = _se_matrix(
            x_latents, y_latents, self.h_latent, self.scale_latent,
            self.use_pallas, self.sharding,
        )
        k_t = _se_matrix(
            x_thetas, y_thetas, self.h_theta, self.scale_theta,
            self.use_pallas, self.sharding,
        )
        return k_z, k_t

    def matrix(self, x_latents, x_thetas, y_latents, y_thetas):
        """Full pairwise kernel matrix ``K_z + K_theta``."""
        k_z, k_t = self.component_matrices(x_latents, x_thetas, y_latents, y_thetas)
        return k_z + k_t

    def grad_factor_z(self):
        """``c`` with ``∇_{Z} k = c * K_z ⊙ (Z - Z')`` (latent term only)."""
        return -2.0 / self.h_latent

    def grad_factor_theta(self):
        """``c`` with ``∇_{Θ} k = c * K_θ ⊙ (Θ - Θ')`` (theta term only)."""
        return -2.0 / self.h_theta
