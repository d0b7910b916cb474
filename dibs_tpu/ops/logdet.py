"""Masked positive-definite log-determinants, tuned for huge tiny-matrix batches.

The BGe marginal likelihood evaluates two ``logdet`` s of masked ``[d, d]``
submatrices per node per MC graph sample — at the reference benchmark config
that is ~150k determinants of 20x20 matrices per SVGD step. XLA's batched
``cholesky``/``slogdet`` are latency-bound on such shapes (measured ~180 ms /
77k matrices on a v5e). This module computes ``logdet`` by plain Gaussian
elimination without pivoting (valid: the masked matrices are PD — see
:func:`dibs_tpu.utils.func.masked_logdet_pd`), which vmap-batches into ``d``
fused elementwise steps over the whole batch: pure VPU work at memory-bound
speed.

The backward pass uses the closed form ``d logdet(A)/dA = A^{-1}`` chained
through the mask outer-product, with the inverse reconstructed from the
forward elimination at O(d³) via triangular solves — no differentiation
through the elimination loop, no stored intermediates.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["masked_logdet_pd"]


def _masked_matrix(m, mask):
    d = mask.shape[-1]
    outer = mask[..., :, None] * mask[..., None, :]
    return outer * m + (1.0 - outer) * jnp.eye(d, dtype=m.dtype)


# Crossover between the elimination loop and XLA's blocked Cholesky: the
# loop rewrites the full [B, d, d] batch d times (O(d^3) HBM traffic per
# matrix), so past ~64 variables the factorization wins (measured on v5e:
# GE 9x faster at d=20, 2.8x at d=50; Cholesky 3.3x faster at d=128).
_GE_MAX_D = 64


def _chol_logdet(a):
    chol = jnp.linalg.cholesky(a)
    return 2.0 * jnp.sum(jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)))


def _pd_logdet(a):
    return _ge_logdet(a) if a.shape[-1] <= _GE_MAX_D else _chol_logdet(a)


def _ge_logdet(a):
    """logdet of a PD matrix by unpivoted Gaussian elimination.

    ``d`` sequential rank-1 updates, each a fused elementwise op — under
    ``vmap`` the whole MC-sample x particle x node batch advances one
    elimination column per step.
    """
    d = a.shape[-1]
    idx = jnp.arange(d)

    def body(i, carry):
        mat, acc = carry
        pivot = mat[i, i]
        col = mat[:, i] / pivot
        upd = col[:, None] * mat[i, :][None, :]
        trailing = (idx[:, None] > i) & (idx[None, :] > i)
        mat = jnp.where(trailing, mat - upd, mat)
        return mat, acc + jnp.log(pivot)

    _, logdet = lax.fori_loop(0, d, body, (a, jnp.zeros((), a.dtype)))
    return logdet


@jax.custom_vjp
def masked_logdet_pd(m: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Log-determinant of the (possibly soft-)masked submatrix of PD ``m``.

    Same semantics as the naive ``cholesky``/``slogdet`` formulations
    (property-tested equal); fast path for the BGe hot loop.
    """
    return _pd_logdet(_masked_matrix(m, mask))


def _fwd(m, mask):
    return masked_logdet_pd(m, mask), (m, mask)


def _bwd(res, g):
    m, mask = res
    d = mask.shape[-1]
    a = _masked_matrix(m, mask)
    # d logdet(A)/dA = A^{-1}; chain through A = s sᵀ ⊙ M + (I − s sᵀ ⊙ I)
    inv = jnp.linalg.inv(a)
    outer = mask[..., :, None] * mask[..., None, :]
    d_m = g * outer * inv
    eye = jnp.eye(d, dtype=m.dtype)
    d_mask = g * 2.0 * jnp.sum(inv * (m - eye) * mask[..., None, :], axis=-1)
    return d_m, d_mask


masked_logdet_pd.defvjp(_fwd, _bwd)


@functools.partial(jax.jit, static_argnames=())
def batched_masked_logdet_pd(m: jnp.ndarray, masks: jnp.ndarray) -> jnp.ndarray:
    """Convenience: one PD ``[d, d]`` matrix, ``[B, d]`` masks -> ``[B]``."""
    return jax.vmap(masked_logdet_pd, (None, 0))(m, masks)


def _ge_logdet_pair(a):
    """``(logdet of leading (d-1) block, logdet of full matrix)`` from one
    unpivoted elimination. Valid because without pivoting the leading-block
    pivots never depend on the last row/column."""
    d = a.shape[-1]
    if d > _GE_MAX_D:
        # Cholesky shares the leading-block property: L[:d-1, :d-1] is the
        # factor of the leading block, so one factorization yields both
        log_diag = jnp.log(jnp.diagonal(jnp.linalg.cholesky(a)))
        lead = 2.0 * jnp.sum(log_diag[: d - 1])
        return lead, lead + 2.0 * log_diag[d - 1]
    idx = jnp.arange(d)

    def body(i, carry):
        mat, acc, acc_lead = carry
        pivot = mat[i, i]
        col = mat[:, i] / pivot
        upd = col[:, None] * mat[i, :][None, :]
        trailing = (idx[:, None] > i) & (idx[None, :] > i)
        mat = jnp.where(trailing, mat - upd, mat)
        log_p = jnp.log(pivot)
        return mat, acc + log_p, acc_lead + jnp.where(i < d - 1, log_p, 0.0)

    zero = jnp.zeros((), a.dtype)
    _, logdet_full, logdet_lead = lax.fori_loop(0, d, body, (a, zero, zero))
    return logdet_lead, logdet_full


@jax.custom_vjp
def masked_logdet_pd_pair(m: jnp.ndarray, parents: jnp.ndarray,
                          e_j: jnp.ndarray):
    """BGe node-score determinant pair from ONE elimination.

    Returns ``(logdet R[Pa, Pa], logdet R[Pa∪j, Pa∪j])`` for parent mask
    ``parents`` (with ``parents[j] == 0``) of node ``j`` given as the one-hot
    ``e_j`` — the two terms of the BGe ``log det`` ratio
    (linearGaussian.py:109-115 in the reference). Size-tiered strategy
    (each tier measured fastest on v5e):

    * ``d <= 32``: node ``j`` is permuted to the last position so the
      leading ``(d-1)`` elimination block is exactly the ``Pa``-masked
      matrix — ONE elimination yields both determinants (the [d, d] gather
      is cheap at this size; 102 vs 54 steps/s on the d=20 benchmark);
    * ``32 < d <= 64``: two plain eliminations — the permutation gather
      costs more than the second elimination (128 vs 182 ms at d=50);
    * ``d > 64``: ONE Cholesky of the permuted (j-last) masked matrix —
      ``L``'s leading block factors the leading block, so both
      determinants come from one factorization (round 4; the permutation
      gather of ``m`` is sample-independent, so XLA hoists it out of the
      MC-sample batch — unlike the ``32 < d <= 64`` elimination tier,
      where the gather measured slower than the second elimination).
    """
    d = parents.shape[-1]
    if d > _GE_MAX_D:
        idx = jnp.arange(d)
        perm = jnp.argsort(jnp.where(e_j > 0.5, d, idx))  # j last
        m_p = m[perm][:, perm]
        a = _masked_matrix(m_p, (parents + e_j)[perm])
        log_diag = jnp.log(jnp.diagonal(jnp.linalg.cholesky(a)))
        lead = 2.0 * jnp.sum(log_diag[: d - 1])
        return lead, lead + 2.0 * log_diag[d - 1]
    if d > 32:
        return (
            _ge_logdet(_masked_matrix(m, parents)),
            _ge_logdet(_masked_matrix(m, parents + e_j)),
        )
    idx = jnp.arange(d)
    perm = jnp.argsort(jnp.where(e_j > 0.5, d, idx))  # j last, others stable
    m_p = m[perm][:, perm]
    mask_full = (parents + e_j)[perm]
    a = _masked_matrix(m_p, mask_full)
    return _ge_logdet_pair(a)


def _pair_fwd(m, parents, e_j):
    return masked_logdet_pd_pair(m, parents, e_j), (m, parents, e_j)


def _pair_bwd(res, cotangents):
    m, parents, e_j = res
    g_lead, g_full = cotangents
    d = parents.shape[-1]
    mask_full = parents + e_j

    a_pa = _masked_matrix(m, parents)
    a_fu = _masked_matrix(m, mask_full)
    inv_pa = jnp.linalg.inv(a_pa)
    inv_fu = jnp.linalg.inv(a_fu)
    eye = jnp.eye(d, dtype=m.dtype)
    o_pa = parents[:, None] * parents[None, :]
    o_fu = mask_full[:, None] * mask_full[None, :]

    d_m = g_lead * o_pa * inv_pa + g_full * o_fu * inv_fu
    # d logdet / d mask_i = 2 Σ_k inv_ik mask_k (M − I)_ik; mask_full = Pa + e_j
    d_pa = (
        g_lead * 2.0 * jnp.sum(inv_pa * (m - eye) * parents[None, :], axis=-1)
        + g_full * 2.0 * jnp.sum(inv_fu * (m - eye) * mask_full[None, :], axis=-1)
    )
    return d_m, d_pa, jnp.zeros_like(e_j)


masked_logdet_pd_pair.defvjp(_pair_fwd, _pair_bwd)
