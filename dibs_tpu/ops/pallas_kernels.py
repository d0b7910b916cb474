"""Pallas TPU kernels for the SVGD hot path.

``fused_se_matrix`` computes the squared-exponential kernel matrix

    K[i, j] = scale * exp(-||x_i - y_j||^2 / h)

as a single fused kernel: the pairwise squared distances accumulate in VMEM
scratch from tiled Gram matmuls on the MXU (``||x||^2 + ||y||^2 - 2 x·y``
per feature chunk) and the ``exp`` epilogue is applied in-register before the
tile is written back — the ``[A, B]`` distance matrix is never materialized
in HBM. Crossover (measured, benchmarks/SE_CROSSOVER{,2}.json): this kernel
wins at SMALL shapes (<= 128 rows, <= 8192 features — one padded output
tile, where XLA's unfused reduce/broadcast/exp epilogue costs ~20-30 us per
evaluation vs ~5 us fused); at LARGE shapes the plain XLA Gram form with
the cross-term at HIGHEST wins 1.4-2.3x (the [A, B] matrix this kernel
avoids rematerializing is tiny next to the [A, n] operands, and XLA tiles
the big matmul better than Mosaic). The engine's auto dispatch
(dibs_tpu/kernel.py) encodes that boundary, and always uses this kernel on
the MESH-SHARDED path, where its shard_map wrapper computes [P_local, P]
row blocks and avoids GSPMD replicating both operand matrices (see
parallel/shard_ops.py).

Grid layout: ``(A/BA, B/BB, n/BN)`` with the feature axis innermost so each
output tile's accumulator lives in VMEM across the whole reduction.
Inputs are zero-padded to tile multiples (zero padding does not perturb the
distances of real rows; padded rows are sliced away).

Falls back to the XLA Gram formulation automatically off-TPU; equality of the
two paths is property-tested in tests/test_pallas.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

try:  # pallas is TPU/GPU-only at runtime but always importable
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_AVAILABLE = True
except ImportError:  # pragma: no cover
    _PALLAS_AVAILABLE = False

__all__ = ["fused_se_matrix", "pallas_enabled"]

_BA = 128  # output tile rows
_BB = 128  # output tile cols
_BN = 512  # feature-chunk (reduction) tile

# Gumbel-sampler grid-cell seed strides and group size. The per-cell seed is
# ``seed + b * 1000003 + m * _GROUP_SEED_STRIDE`` (b = particle, m = sample
# group of _SAMPLE_BLOCK samples); parallel/shard_ops.py relies on these to
# reproduce global-cell seeds from sharded calls.
_SAMPLE_BLOCK = 8
_GROUP_SEED_STRIDE = 7919


def pallas_enabled() -> bool:
    """True if the current default backend can run the Pallas kernels.

    Honors the kill switch (:func:`dibs_tpu.config.set_pallas_enabled` /
    ``DIBS_DISABLE_PALLAS=1``): forced-off always wins; forced-on still
    requires an importable pallas."""
    from dibs_tpu.config import pallas_override

    forced = pallas_override()
    if forced is not None:
        return bool(forced) and _PALLAS_AVAILABLE
    return _PALLAS_AVAILABLE and jax.default_backend() == "tpu"


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _se_kernel_body(x_ref, y_ref, h_ref, scale_ref, out_ref, acc_ref):
    """One (i, j, k) grid step: accumulate this feature chunk's contribution
    to the squared distances; apply the exp epilogue on the last chunk."""
    k = pl.program_id(2)
    n_k = pl.num_programs(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x_blk = x_ref[:]  # [BA, BN]
    y_blk = y_ref[:]  # [BB, BN]
    x_sq = jnp.sum(x_blk * x_blk, axis=1, keepdims=True)  # [BA, 1]
    y_sq = jnp.sum(y_blk * y_blk, axis=1, keepdims=True)  # [BB, 1]
    # HIGHEST: Mosaic's default dot truncates MXU inputs to bf16, and the
    # x²+y²−2x·y form cancels catastrophically exactly where it matters —
    # nearby particles (K ≈ 1), whose squared distance is ≪ ‖x‖². The
    # multi-pass f32 matmul costs < 1 ms even at the P=2000 scaling config.
    cross = jax.lax.dot_general(
        x_blk, y_blk,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [BA, BB]
    acc_ref[:] += x_sq + y_sq.T - 2.0 * cross

    @pl.when(k == n_k - 1)
    def _():
        h = h_ref[0, 0]
        scale = scale_ref[0, 0]
        out_ref[:] = scale * jnp.exp(-acc_ref[:] / h)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_se_matrix_padded(x, y, h, scale, interpret=False):
    a, n = x.shape
    b, _ = y.shape
    grid = (a // _BA, b // _BB, n // _BN)
    return pl.pallas_call(
        _se_kernel_body,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BA, _BN), lambda i, j, k: (i, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BB, _BN), lambda i, j, k: (j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j, k: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((_BA, _BB), lambda i, j, k: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((a, b), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BA, _BB), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * a * b * n,
            bytes_accessed=4 * (a * n + b * n + a * b),
            transcendentals=a * b,
        ),
        interpret=interpret,
    )(x, y, jnp.array([[h]], jnp.float32), jnp.array([[scale]], jnp.float32))


def _make_gumbel_kernel(hard: bool):
    def kernel(seed_ref, alpha_ref, tau_ref, scores_ref, out_ref):
        """One grid cell: ``[BM, d, d]`` Gumbel samples for one particle.

        Logistic(0,1) noise is generated in VMEM from the TPU hardware PRNG —
        the noise tensor never exists in HBM and no host-side threefry runs.
        ``hard=False``: Gumbel-softmax ``sigmoid(tau (eps + alpha s))``;
        ``hard=True``: Gumbel-max ``1[eps + alpha s > 0]`` — distributed as
        ``Bernoulli(sigmoid(alpha s))``.
        """
        b = pl.program_id(0)
        m = pl.program_id(1)
        # single-scalar seed (multi-arg prng_seed is unsupported on this
        # backend): decorrelate grid cells with odd multipliers
        pltpu.prng_seed(
            seed_ref[0, 0] + b * jnp.int32(1000003)
            + m * jnp.int32(_GROUP_SEED_STRIDE)
        )

        scores = scores_ref[0]  # [d, d]
        bm, d, _ = out_ref.shape[1:4] if out_ref.ndim == 4 else out_ref.shape
        bits = pltpu.bitcast(pltpu.prng_random_bits((bm, d, d)), jnp.uint32)
        # uniform in (0, 1): top 24 bits via logical shift on uint32, then a
        # detour through int32 (mosaic lacks a direct uint32->f32 cast; the
        # shifted values are < 2^24 so the int32 reinterpretation is positive)
        top = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
        u = top.astype(jnp.float32) * (1.0 / (1 << 24)) + 0.5 / (1 << 24)
        # clamp away the round-to-even u == 1.0 case (top == 2^24-1); here
        # it only saturates the logit (benign), but keep every hardware
        # uniform on the same strictly-in-(0,1), reciprocal-safe contract
        # as the fused kernels (see fused_linear._gen_uniform: the TPU
        # reciprocal of 1 - 2^-24 is exactly 1.0)
        u = jnp.minimum(u, jnp.float32(1.0 - 2.0**-23))
        eps = jnp.log(u) - jnp.log1p(-u)  # Logistic(0, 1)

        alpha = alpha_ref[0, 0]
        logits = eps + alpha * scores[None, :, :]
        if hard:
            g = (logits > 0.0).astype(jnp.float32)
        else:
            tau = tau_ref[0, 0]
            g = jax.nn.sigmoid(tau * logits)

        row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        mask = (row != col).astype(g.dtype)
        out_ref[0] = g * mask[None, :, :]

    return kernel


_gumbel_soft_kernel = _make_gumbel_kernel(hard=False)
_gumbel_hard_kernel = _make_gumbel_kernel(hard=True)


def gumbel_soft_graphs_pallas(scores: jnp.ndarray, seed, alpha, tau,
                              n_samples: int, block_m: int = _SAMPLE_BLOCK,
                              interpret: bool = False,
                              hard: bool = False) -> jnp.ndarray:
    """Fused Gumbel graph sampling on TPU (soft by default, hard Bernoulli
    with ``hard=True``).

    ``scores``: ``[B, d, d]`` edge scores. Contract: ``d`` must be a sublane
    multiple (8) — callers with unaligned ``d`` go through the zero-padding
    wrapper ``dibs_tpu.ops.soft_graphs._pallas_graphs_padded``, which
    supports any ``2 <= d <= _MAX_SAMPLER_D``. ``seed``: int32 scalar;
    ``alpha`` may be traced (annealed). Returns ``[B, n_samples, d, d]``
    adjacency samples with zeroed diagonals.
    """
    b, d, _ = scores.shape
    if n_samples % block_m != 0:
        block_m = 1
    grid = (b, n_samples // block_m)
    return pl.pallas_call(
        _gumbel_hard_kernel if hard else _gumbel_soft_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, d, d), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_m, d, d), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_samples, d, d), jnp.float32),
        interpret=interpret,
    )(
        jnp.asarray(seed, jnp.int32).reshape(1, 1),
        jnp.asarray(alpha, jnp.float32).reshape(1, 1),
        jnp.asarray(tau, jnp.float32).reshape(1, 1),
        scores,
    )


def fused_se_matrix(x: jnp.ndarray, y: jnp.ndarray, h, scale,
                    interpret: bool = False) -> jnp.ndarray:
    """``[A, n] x [B, n] -> [A, B]`` SE kernel matrix, fused on TPU.

    ``x`` / ``y`` are flattened particle batches (rows = particles). ``h``
    and ``scale`` must be static Python floats here (they are fixed kernel
    hyperparameters for a run).
    """
    a, n = x.shape
    b, _ = y.shape
    a_pad = _round_up(max(a, 8), _BA)
    b_pad = _round_up(max(b, 8), _BB)
    n_pad = _round_up(max(n, 128), _BN)
    x_p = jnp.zeros((a_pad, n_pad), jnp.float32).at[:a, :n].set(x)
    y_p = jnp.zeros((b_pad, n_pad), jnp.float32).at[:b, :n].set(y)
    out = _fused_se_matrix_padded(x_p, y_p, float(h), float(scale),
                                  interpret=interpret)
    return out[:a, :b]
