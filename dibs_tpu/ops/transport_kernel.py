"""Fused SVGD transport phi kernel (Pallas, TPU).

Closes the cfg5 phi-family gap diagnosed in round 4 (benchmarks/RESULTS.md,
"transport 'default' precision" study): cutting MXU passes 3x moved the step
only ~2.5%/pass, so the 13.5-ms-vs-8-ms transport gap at cfg5 lives in
f32->bf16 conversion/copy traffic, unfused epilogues, and XLA's scheduling
of the [P,P]@[P,n] family — not logical matmul FLOPs.

This kernel computes one SVGD transport family in a single pass over the
big ``[P, n]`` operands (reference spec: the driver + repulsion coupling,
/root/reference/dibs/inference/svgd.py:194-224, 591-670):

    phi = -(1/P) * ( K_own^T @ (g + c v)  +  K_other^T @ g  -  c colsum(K_own) ⊙ v )

using the SE-family identity

    k_mat^T @ g + c (K_own^T @ v - colsum(K_own) ⊙ v)
        = K_own^T @ (g + c v) + K_other^T @ g - c colsum(K_own) ⊙ v

(``k_mat = K_own + K_other``; for the marginal engine ``K_other`` is absent
and the whole family is ONE matmul). The feature axis is tiled; the
``[P, P]`` kernel matrices stay resident in VMEM across grid steps; the
rhs combine (``g + c v``), the colsum rank-1 term, and the ``-1/P`` scale
all fuse into the tile visit — no ``[P, n]`` intermediate ever round-trips
HBM, and each operand tile is split for the MXU exactly once.

Numerics: Mosaic's ``dot_general`` supports only DEFAULT (one bf16 pass)
and HIGHEST (six passes); the policy this kernel replaces is HIGH (bf16x3,
dibs_tpu/config.py). So the three passes are emulated explicitly: the
resident matrices are pre-split into (hi, lo) bf16 outside the kernel, the
rhs tile is split in-kernel, and

    A @ X ≈ A_hi @ X_hi + A_hi @ X_lo + A_lo @ X_hi      (f32 accumulate)

which is term-for-term the bf16_3x algorithm XLA runs for HIGH.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["transport_phi", "transport_phi_available"]

# [P, P] hi/lo bf16 matrix pairs must stay resident in VMEM (~2 MB each at
# P=1000; four of them for the joint family) alongside double-buffered
# operand tiles.
_MAX_P = 1024
_TILE_N = 256


def transport_phi_available(p: int, n: int) -> bool:
    """The fused kernel serves one resident-[P,P] tier on TPU."""
    if jax.default_backend() != "tpu":
        return False
    return p <= _MAX_P and n % _TILE_N == 0 and p % 8 == 0


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


_DOT_T = (((0,), (0,)), ((), ()))  # contract dim 0 with dim 0: A^T @ X


def _dot3(a_hi, a_lo, x):
    """bf16x3 emulation of a HIGH-precision ``A^T @ X`` (f32 accumulate)."""
    x_hi, x_lo = _split(x)
    acc = jax.lax.dot_general(a_hi, x_hi, _DOT_T,
                              preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(a_hi, x_lo, _DOT_T,
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(a_lo, x_hi, _DOT_T,
                               preferred_element_type=jnp.float32)
    return acc


def _phi_kernel_joint(a_hi_ref, a_lo_ref, b_hi_ref, b_lo_ref, w_ref, mu_ref,
                      g_ref, v_ref, out_ref, *, c, neg_inv_p):
    g = g_ref[:]
    # centering fused into the tile visit: the repulsion needs v - mean so
    # matmul rounding lands on particle *differences*, not norms (see
    # _se_repulsion in inference/transport.py) — here the centered copy
    # never materializes in HBM
    v = v_ref[:] - mu_ref[:]
    acc = _dot3(a_hi_ref[:], a_lo_ref[:], g + c * v)
    acc += _dot3(b_hi_ref[:], b_lo_ref[:], g)
    # w = (1/P) * c * colsum(A) folded outside; epilogue is one fusion
    out_ref[:] = acc * neg_inv_p + w_ref[:] * v


def _phi_kernel_marginal(a_hi_ref, a_lo_ref, w_ref, mu_ref, g_ref, v_ref,
                         out_ref, *, c, neg_inv_p):
    g = g_ref[:]
    v = v_ref[:] - mu_ref[:]
    acc = _dot3(a_hi_ref[:], a_lo_ref[:], g + c * v)
    out_ref[:] = acc * neg_inv_p + w_ref[:] * v


@functools.partial(jax.jit, static_argnames=("c", "tile_n"))
def transport_phi(k_own, k_other, g, v, *, c, mu=None, tile_n=_TILE_N):
    """Fused transport family ``phi`` (see module docstring).

    Args:
        k_own:   ``[P, P]`` kernel matrix of the repulsion family (f32).
        k_other: ``[P, P]`` other additive component, or ``None`` (marginal).
        g:       ``[P, n]`` flat score/driver operand (f32).
        v:       ``[P, n]`` flat particle values (f32), centered in-kernel
                 when ``mu`` is given.
        c:       static repulsion factor ``-2/h`` of the SE kernel.
        mu:      optional ``[1, n]`` column means of ``v`` — the repulsion's
                 centering, fused into the tile visit.

    Returns:
        ``[P, n]`` transport ``phi`` (already negated and ``/P``-scaled).
    """
    p, n = g.shape
    neg_inv_p = -1.0 / p
    # rank-1 epilogue weight: +(1/P) * c * colsum(K_own), as a [P, 1] column
    w = (-neg_inv_p) * c * jnp.sum(k_own, axis=0)[:, None]
    if mu is None:
        mu = jnp.zeros((1, n), jnp.float32)

    grid = (n // tile_n,)
    mat_spec = pl.BlockSpec((p, p), lambda j: (0, 0))
    col_spec = pl.BlockSpec((p, 1), lambda j: (0, 0))
    row_spec = pl.BlockSpec((1, tile_n), lambda j: (0, j))
    tile_spec = pl.BlockSpec((p, tile_n), lambda j: (0, j))

    if k_other is None:
        kernel = functools.partial(
            _phi_kernel_marginal, c=c, neg_inv_p=neg_inv_p)
        in_specs = [mat_spec, mat_spec, col_spec, row_spec, tile_spec,
                    tile_spec]
        a_hi, a_lo = _split(k_own)
        args = (a_hi, a_lo, w, mu, g, v)
        flops_passes = 3 * 2 * p * p * n
    else:
        kernel = functools.partial(
            _phi_kernel_joint, c=c, neg_inv_p=neg_inv_p)
        in_specs = [mat_spec, mat_spec, mat_spec, mat_spec, col_spec,
                    row_spec, tile_spec, tile_spec]
        a_hi, a_lo = _split(k_own)
        b_hi, b_lo = _split(k_other)
        args = (a_hi, a_lo, b_hi, b_lo, w, mu, g, v)
        flops_passes = 3 * 4 * p * p * n

    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((p, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_passes,
            bytes_accessed=(g.size + v.size + g.size) * 4,
            transcendentals=0,
        ),
    )(*args)
