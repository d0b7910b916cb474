"""Pallas TPU kernel for the BGe determinant-pair batch.

The marginal-BGe score estimator evaluates, per node ``j`` of every hard MC
graph sample, the pair ``(logdet R_j[Pa, Pa], logdet R_j[Pa u j, Pa u j])``
(reference ``linearGaussian.py:109-115``). At the d=20 benchmark config that
is ``P*M*d ~ 77k`` masked determinants of 20x20 matrices per SVGD step — 91%
of the round-2 step time.

The XLA Gaussian-elimination path (``ops/logdet.py``) runs the batch as ``d``
*sequential unfused* elementwise steps, each rewriting the whole
``[B, d, d]`` buffer in HBM: ``O(B d^3)`` HBM traffic (~5 GB per step at the
benchmark config — the measured 10 ms is within 2x of pure-bandwidth time for
that traffic, i.e. the XLA path is HBM-bound, not op-bound). This kernel
keeps each matrix resident in VMEM across all ``d`` elimination steps, so HBM
traffic drops to read-the-masks + write-two-scalars (``O(B d)``).

Design (differs from the round-2 rejected designs, which kept the batch in
sublanes and extracted pivots with indicator matmuls / rolls):

* the *batch* axis rides the 128-wide lane dimension — one kernel instance
  eliminates ``TILE`` matrices in lock-step, and every GE operation is a
  plain ``[d, TILE]`` vector op with a sublane broadcast (no gathers, no
  matmuls, no relayouts);
* the node index ``j`` is a *grid* axis: per cell, the parent masks are the
  ``g[:, j]`` columns (sliced by BlockSpec) and ``R_j`` is the node's
  interventional posterior matrix;
* the determinant *pair* needs no permutation: eliminate the parent-masked
  matrix in natural order (non-parent rows are identity rows — pivot 1,
  log 0) while carrying node ``j``'s row/column as a bordered vector; after
  the sweep the accumulated log-pivots are ``logdet R[Pa, Pa]`` and the
  bordered scalar is the Schur complement, giving
  ``logdet R[Pa u j, Pa u j] = logdet R[Pa, Pa] + log(schur)``.
  (This is the "row-masked bordered-Schur form" flagged as the fallback
  simplification in docs/DESIGN.md — it turns out to be the *enabler* for
  the lane-batched layout, not a fallback.)

Valid for PD ``R`` (unpivoted GE; pivots are positive Schur complements) and
for soft masks, though the engine only routes *hard* sample batches here.
Forward-only: the score/score_rb REINFORCE estimators treat graph samples as
constants, so no VJP is defined (differentiating through this op raises).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from dibs_tpu.ops.pallas_kernels import pallas_enabled

try:  # pallas is TPU/GPU-only at runtime but always importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_AVAILABLE = True
except ImportError:  # pragma: no cover
    _PALLAS_AVAILABLE = False

__all__ = ["bge_logdet_pairs", "bge_pallas_available"]

_TILE = 256  # matrices eliminated per grid cell (lane-dim batch)
# Measured negative result (round 3e): widening TILE to 1024 at d=20 (the
# lane-filling lever that gave fused_linear +73%) changed config-1
# throughput by ~0 (1125 vs 1175 steps/s, within the process band) — the
# elimination's serial d^2/2-op chain is VPU-THROUGHPUT-bound per op
# ([d, TILE] tiles already span multiple vregs), so wider tiles trade
# proportionally more cycles per op for fewer ops. 256 stays.

# Round 4: the d <= 64 cap was justified by the XLA elimination's
# HBM-rewrite crossover (ops/logdet._GE_MAX_D), which does NOT apply to
# this VMEM-resident kernel — its traffic is masks-in/scalars-out at any
# d. Past 64 the TILE halves so the [d, d, TILE] scratch stays under
# VMEM (d=128: 8.4 MB at TILE=128), and the cap moves to 128. Measured
# at the d=128 marginal config: the XLA batched-Cholesky path runs 819k
# [128, 128] factorizations at ~0.1% of peak (12 s/step — tiny-matrix
# Cholesky is loop/latency-bound on TPU); this kernel's lock-step
# lane-batched elimination is the difference between that and a usable
# large-d marginal engine (see benchmarks/RESULTS.md round-4).
_MAX_D = 128

# Pivots eliminated per register-blocked panel (see _bge_pair_kernel). At
# K=1 the sweep degenerates to the round-3e unblocked form. Measured A/B
# (benchmarks/bench_bge_blocked.py, BGE_BLOCKED_AB.json): K=4 is 1.6x over
# K=1 at the cfg1 shape (d=20); d=128 is compute-bound and K-insensitive.
_BLOCK_K = 4


def _tile_for(d: int) -> int:
    return _TILE if d <= 64 else 128


def bge_pallas_available(d: int) -> bool:
    """True when the fused determinant-pair kernel can serve this ``d``."""
    return _PALLAS_AVAILABLE and pallas_enabled() and 2 <= d <= _MAX_D


def _bge_pair_kernel(r_ref, e_ref, gt_ref, out_pa_ref, out_full_ref, a_ref):
    """One grid cell: determinant pairs of node ``j`` for ``TILE`` graphs.

    Refs: ``r_ref [1, d, d]`` node's posterior matrix; ``e_ref [1, d]``
    node one-hot; ``gt_ref [1, d, TILE]`` parent-mask columns;
    ``a_ref [d, d, TILE]`` VMEM scratch holding the masked matrices
    *column-major* (``a_ref[c]`` = column ``c`` of every matrix).
    """
    d = r_ref.shape[1]
    tile = gt_ref.shape[2]
    f32 = jnp.float32

    r = r_ref[0]  # [d, d]
    e = e_ref[0]  # [1, d] one-hot of j
    m = gt_ref[0]  # [d, TILE] parent masks (m[j] = 0: diagonals are zeroed)

    # bordered row/column of node j: v = (R e_j) masked to parents,
    # s = e_j^T R e_j. One-hot selections via exact VPU multiply+lane-reduce
    # — NOT dot_general: the MXU truncates f32 operands to bf16 at default
    # precision, and the border feeds a catastrophically-cancelling Schur
    # chain (s_final can be ~1e-8 of s0 on collinear data), so bf16-level
    # input error made logdet(Pa u j) NaN on ill-conditioned real datasets
    # while the elimination (exact VMEM reads) stayed correct.
    v_col = jnp.sum(r * e, axis=1, keepdims=True)  # [d, 1] = R[:, j]
    s0 = jnp.sum(v_col * jnp.transpose(e), axis=0, keepdims=True)  # R[j, j]
    v = v_col * m  # [d, TILE]
    s = jnp.broadcast_to(s0, (1, tile))

    # build the parent-masked matrices in VMEM, column by column:
    # A[r, c] = m_r m_c R[r, c] + (r == c)(1 - m_r m_c)
    row_iota = jax.lax.broadcasted_iota(jnp.int32, (d, 1), 0)
    for c in range(d):
        rc = r[:, c : c + 1]  # [d, 1]
        mc = m[c : c + 1, :]  # [1, TILE]
        mm = m * mc  # [d, TILE] outer-mask column
        e_c = (row_iota == c).astype(f32)  # [d, 1]
        a_ref[c] = rc * mm + e_c * (1.0 - mm)

    # lock-step unpivoted GE over all TILE matrices; identity rows pass
    # through with pivot 1 (log 0), so the log-pivot sum IS logdet R[Pa, Pa].
    #
    # BLOCKED (round 5): the round-3e/4 unblocked form updated every trailing
    # column once per pivot — a full [d, TILE] VMEM load + store around 1
    # fma, so the VPU spent ~2/3 of its slots on traffic and sublane
    # broadcasts (the measured 3.1x gap to the fma floor at cfg1,
    # benchmarks/RESULTS.md round-4 fleet sweep). Here pivots are processed
    # in blocks of K: the block's K scaled columns (colf) are computed once
    # (register-resident, the "panel" phase), then each trailing column is
    # loaded ONCE, receives all K rank-1 updates in registers, and is stored
    # ONCE — amortizing the round-trip K-fold. The per-element operation
    # order is unchanged, so results are bitwise identical to the unblocked
    # sweep.
    acc = jnp.zeros((1, tile), f32)
    kb = _BLOCK_K
    for i0 in range(0, d, kb):
        hi = min(i0 + kb, d)
        # panel: eliminate within the block, keeping its columns in registers
        cols = [a_ref[c] for c in range(i0, hi)]
        colfs = []
        for i in range(i0, hi):
            col_i = cols[i - i0]
            pivot = col_i[i : i + 1, :]  # [1, TILE]
            inv_p = 1.0 / pivot
            colf = col_i * inv_p
            colfs.append(colf)
            acc = acc + jnp.log(pivot)
            # bordered update: after the full sweep s is the Schur
            # complement of entry (j, j) in R[Pa u j, Pa u j]
            vi = v[i : i + 1, :]
            s = s - vi * vi * inv_p
            v = v - colf * vi
            for c in range(i + 1, hi):
                col_c = cols[c - i0]
                cols[c - i0] = col_c - colf * col_c[i : i + 1, :]
        # trailing update: one load + one store per column for K pivots
        for c in range(hi, d):
            col_c = a_ref[c]
            for i in range(i0, hi):
                col_c = col_c - colfs[i - i0] * col_c[i : i + 1, :]
            a_ref[c] = col_c

    out_pa_ref[0] = acc
    out_full_ref[0] = acc + jnp.log(s)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _bge_pairs_padded(r_mats, gs_t, interpret=False):
    d = r_mats.shape[0]
    b = gs_t.shape[2]
    tile = _tile_for(d)
    grid = (d, b // tile)
    # singleton middle axes keep every block's trailing two dims either
    # equal to the array's or (8, 128)-tileable (Mosaic block constraint)
    eye = jnp.eye(d, dtype=jnp.float32)[:, None, :]  # [d, 1, d]
    out_pa, out_full = pl.pallas_call(
        _bge_pair_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, d, d), lambda j, t: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, d), lambda j, t: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, tile), lambda j, t: (j, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, 1, tile), lambda j, t: (j, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tile), lambda j, t: (j, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((d, 1, b), jnp.float32),
            jax.ShapeDtypeStruct((d, 1, b), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((d, d, tile), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=b * d * d * d,
            bytes_accessed=4 * (d * b + 2 * d * b),
            transcendentals=b * d,
        ),
        interpret=interpret,
    )(r_mats.astype(jnp.float32), eye, gs_t.astype(jnp.float32))
    return out_pa, out_full


def bge_logdet_pairs(r_mats: jnp.ndarray, gs: jnp.ndarray,
                     interpret: bool = False):
    """Batched BGe determinant pairs on TPU.

    Args:
        r_mats: ``[d, d, d]`` per-node posterior parameter matrices ``R_j``
            (PD; see ``BGe._posterior_r_mats``)
        gs: ``[B, d, d]`` (hard) adjacency samples; node ``j``'s parent mask
            is column ``gs[:, :, j]``

    Returns:
        ``(logdet_pa, logdet_full)``, each ``[B, d]``: per node,
        ``logdet R_j[Pa, Pa]`` and ``logdet R_j[Pa u j, Pa u j]``.

    Forward-only (no VJP) — callers are the REINFORCE estimators, which
    treat graph samples as constants.
    """
    b, d, _ = gs.shape
    gs = jax.lax.stop_gradient(gs)
    tile = _tile_for(d)
    bp = ((b + tile - 1) // tile) * tile
    # [B, d, d] -> [d(node j), d(parent row), B]; padded graphs are all-zero
    # masks -> identity matrices -> logdets 0, sliced away below
    gs_t = jnp.transpose(gs, (2, 1, 0))
    if bp != b:
        gs_t = jnp.zeros((d, d, bp), gs_t.dtype).at[:, :, :b].set(gs_t)
    out_pa, out_full = _bge_pairs_padded(r_mats, gs_t, interpret=interpret)
    return out_pa[:, 0, :].T[:b], out_full[:, 0, :].T[:b]
