"""Fused sample-and-score estimators for the linear-Gaussian likelihood.

The generic estimator path materializes, per SVGD step, ``P x M`` relaxed and
hard graph samples of shape ``[d, d]`` plus their masked weight matrices —
at the d=128 / P=1000 scaling config that is ~8 GB of HBM traffic. This
module computes the same two MC estimates

    dZ-likelihood  =  Σ_m softmax(ℓ_soft)_m ∇_scores ℓ_soft_m      (reparam)
    dΘ-likelihood  =  Σ_m softmax(ℓ_hard)_m ∇_Θ      ℓ_hard_m

in ONE Pallas pass (round 4 — previously a two-pass seed-replay scheme):
each Gumbel sample is generated from the TPU hardware PRNG in VMEM, scored
(one ``[N, d] @ [d, d]`` MXU matmul per sample), and its gradient
contribution accumulated immediately, with a flash-attention-style
**online softmax** per particle (running max + normalizer per stream; the
``[d, d]`` gradient accumulators are rescaled by ``exp(M_old − M_new)``
whenever the max advances, and divide by the normalizer after the last
group) — the same scheme the nonlinear kernel has used since round 3
(``fused_nonlinear.py``). The single pass removes the duplicated
sampling + delta-matmul chain of the old replay design (measured A/B:
benchmarks/SINGLEPASS_AB.json); the two-pass path is kept behind
``single_pass=False`` / ``_SINGLE_PASS`` for A/B and regression testing:

  * pass 1 regenerates each sample, scores it, and emits only the
    ``[P, M]`` log-probabilities; the softmax weights are formed in XLA;
  * pass 2 regenerates the *same* samples from the same seeds and
    accumulates the weighted gradients ``dscores`` / ``dΘ`` in VMEM.

No graph sample, masked weight matrix, or noise tensor ever exists in HBM;
per-step traffic drops to the ``[P, d, d]`` inputs/outputs. The fused path
engages automatically for ``JointDiBS`` + ``LinearGaussian`` + reparam on
TPU at any ``d`` (round 2): inputs are zero-padded to a sublane multiple
``dp`` and the per-group lane width ``bm * dp`` is chosen as a lane multiple
— padding is exact, not approximate, because every padded contribution is
multiplied by a zero (padded theta / edge-prior logpdf / observation weight).
Correctness against the unfused path is validated statistically on hardware
(scripts/validate_tpu.py) — the two paths use different PRNG streams, so the
comparison is distributional.

Math being fused (reference: dibs.py:395-459/:467-551 + linearGaussian.py):

    ℓ(G) = Σ w_nj [ logN(x_nj; (x @ (G ⊙ Θ))_nj, σ) ] + Σ_ij G_ij logN(Θ_ij)
    ∂ℓ/∂W = xᵀ (x_resid / σ²),  W = G ⊙ Θ
    ∂ℓ/∂G = Θ ⊙ ∂ℓ/∂W + logpdf(Θ),   ∂ℓ/∂Θ = G ⊙ ∂ℓ/∂W + G ⊙ (μ_e − Θ)/σ_e²
    ∂G_soft/∂scores = τ α G (1 − G)
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS = True
except ImportError:  # pragma: no cover
    _PALLAS = False

from dibs_tpu.ops.soft_graphs import _key_to_seed

__all__ = ["fused_linear_estimators", "fused_linear_available"]

_LANE = 128
_SUB = 8
# VMEM guard: the widest in-kernel buffers are [d_pad, bm*d_pad] floats; cap
# d so a handful of them plus the [N_pad, bm*d_pad] data tiles fit in ~16 MB
_MAX_D = 384

# Mosaic's default-precision dot truncates f32 inputs to bf16 on the MXU
# (see ops/bge_kernel.py for the first casualty). Log-likelihoods flow
# through the scoring matmul and the indicator-matmul reductions here, so
# on unstandardized (large-scale) data the per-sample ll differences drown
# in truncation noise and the softmax weights collapse (measured: AUROC
# 0.958 -> 0.500 at 10x data scale). Two precision classes:
#   _PREC_LL   — the scoring chain (means matmul, ll indicator-reduces,
#                pass-1 accumulators): multi-pass f32; errors here shift
#                log-likelihood *differences* and corrupt softmax weights.
#   _PREC_GRAD — gradient dots (x^T resid, s_mat accumulation, weight
#                broadcasts): already-weighted sums with no cancellation
#                amplification; a relative 2^-9 rounding acts as extra MC
#                noise, so fewer MXU passes are safe.
_PREC_LL = jax.lax.Precision.HIGHEST
_PREC_GRAD = jax.lax.Precision.DEFAULT
# CENTERED (delta) SCORING — the scale-invariance trick (round 3c).
# The pass-1 lls feed only a per-particle softmax, which is shift-
# invariant, and the pass-2 residuals are differences against the data.
# So the kernel scores every MC sample *relative to the expected graph*
# E[G|Z] = σ(α·s)⊙offdiag: per particle it computes the reference
# prediction  mean_ref = x @ (E[G]⊙Θ)  ONCE at HIGHEST precision (cost
# amortized over the M samples), keeps  resid_ref = x − mean_ref, and per
# sample computes only the delta matmul  D = x @ ((G_m − E[G])⊙Θ)  at
# fast single-pass precision, with
#     Δll_m   = −(1/2σ²)·Σ w·D·(D − 2·resid_ref)  +  Σ (G_m−E[G])·logpdf(Θ)
#     resid_m = (resid_ref − D)·w.
# Every bf16-truncated operand now carries a *delta* whose magnitude IS
# the inter-sample spread the softmax weighting depends on, so the
# truncation error is relative to the signal at any data scale — the
# previous three-regime precision policy (single-pass gated at |ll|<1e5,
# 3-pass split, true-f32 ablation) collapses to this one path. The f32
# *storage* of the [P, M] lls also stops quantizing weights at extreme
# scale (|ll| ~ 1e7 has 1-nat f32 resolution; centered lls are small) —
# the residual quality gap the round-3 ablations could not pin on the
# matmul (DESIGN.md §11f) was exactly this storage quantization.
# `_ll_dot` also serves the *nonlinear* kernel (fused_nonlinear.py),
# which centers its first layer the same way (linear in the parent mask).
_LL_SPLIT3 = True
# Delta-matmul true-f32 ablation toggle (module-level trace-time constant
# so experiments can A/B it in one process). Off by default.
_DELTA_HI = False
# Threshold for the estimator factory's extreme-data-scale advisory
# (estimators._data_scale_policy): beyond ~10x this, the *nonlinear
# model* itself stops resolving structure on unstandardized data
# (CENTERED_NL_AB.json — a model-fit property, not kernel precision;
# both fused and exact-XLA arms collapse identically there).
_FAST_LL_MAX = 1.0e5
# Single-pass (online-softmax) vs legacy two-pass (seed-replay) kernel.
# Module-level trace-time constant so A/B experiments can flip it in one
# process; per-call override via fused_linear_estimators(single_pass=...).
_SINGLE_PASS = True


def _ll_dot(a, b, dims, hi=False, fast=False):
    """Scoring-chain matmul at one of three precisions (used by the
    *nonlinear* kernel's scale-gated policy, and by the linear kernel's
    once-per-particle reference matmul via ``hi=True``):

    * ``fast`` — single DEFAULT-precision pass (Mosaic truncates the f32
      operands to bf16, ~2^-9 relative). Selected per dataset when the
      estimated per-sample |log-likelihood| stays below ``_FAST_LL_MAX``
      (standardized-scale data) — the configuration all round-2/3 parity
      and quality measurements ran at.
    * default — the 3-pass bf16 split (~2^-17 relative), for large-scale
      data where bf16 truncation drowns the ll differences.
    * ``hi`` — true f32 (HIGHEST, 6 Mosaic passes).
    """
    if hi or not _LL_SPLIT3:
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32,
                                   precision=jax.lax.Precision.HIGHEST)
    if fast:
        return jax.lax.dot_general(a, b, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)
    a_hi = a.astype(jnp.bfloat16).astype(jnp.float32)
    b_hi = b.astype(jnp.bfloat16).astype(jnp.float32)

    def dot(x, y):
        return jax.lax.dot_general(x, y, dimension_numbers=dims,
                                   preferred_element_type=jnp.float32)

    return dot(a_hi, b_hi) + (dot(a - a_hi, b_hi) + dot(a_hi, b - b_hi))


def fused_linear_available(n_vars: int, n_obs: int = 0) -> bool:
    """True when the fused kernel supports this shape on this backend.

    ``n_obs`` (when known) enters a VMEM budget check: the kernel keeps
    several live ``[N_pad, wd]`` data/residual/delta tiles and ~ten
    ``[dp, wd]`` parameter tiles per group, and past the budget the
    Mosaic compile fails opaquely (HTTP 500 tpu_compile_helper). The
    ``(3·N_pad + 10·dp)·wd·4 <= 20 MB`` rule is calibrated against
    measured v5e cliffs at the 1024-lane wide plan: compile OK at
    d=128/N=1024 (17.8 MB) and d=30/N=1500 (19.8 MB), fail at
    d=128/N=1536 (24 MB) and d=30/N=2048 (26.5 MB). The gate declines
    so the engine falls back to the exact XLA estimators instead of
    crashing the compile."""
    from dibs_tpu.ops.pallas_kernels import pallas_enabled

    ok = _PALLAS and pallas_enabled() and 2 <= n_vars <= _MAX_D
    if ok and n_obs:
        # the decline rule is evaluated at the full lane-target group width
        # (single=False) so the measured cliffs keep gating; the single-pass
        # kernel then runs at the bm that _pad_plan's scoped-VMEM reduction
        # picks for the same (d, N)
        dp, bm, _ = _pad_plan(n_vars, 1, single=False)
        n_pad = _round_up(max(n_obs, _SUB), _SUB)
        ok = (3 * n_pad + 10 * dp) * bm * dp * 4 <= 20 * 1024 * 1024
    return ok


def _round_up(v, m):
    return ((v + m - 1) // m) * m


_NOTICED: set = set()


def _notice_compile(d: int, n_samples: int) -> None:
    """One line to stderr the first time a shape is traced in this process:
    a first-EVER compile of the fused kernels at a new shape takes minutes
    (Mosaic), and silence looks like a hang (VERDICT r2 weak-item 3).
    Repeats are served by the persistent compilation cache. Pre-warm with
    ``dibs_tpu.warmup`` / ``scripts/prime_cache.py``."""
    import sys

    keyt = (d, n_samples)
    if keyt in _NOTICED:
        return
    _NOTICED.add(keyt)
    print(
        f"dibs-tpu: tracing fused Pallas kernels for d={d}, "
        f"M={n_samples} — a first-ever compile at this shape takes minutes "
        "(cached persistently afterwards; pre-warm via dibs_tpu.warmup)",
        file=sys.stderr, flush=True,
    )


# Single-pass scoped-VMEM model, calibrated against the one measured v5e
# cliff: at (n_pad=600, dp=32, wd=2048) Mosaic reports a 17.85 MB scoped
# allocation against its hard 16 MB limit — i.e. ~3 live [N_pad, wd] data/
# residual/delta tiles plus ~12 [dp, wd] parameter tiles. The single-pass
# kernel keeps the scoring-chain intermediates live (they were dead code
# in the legacy pass 2), so its working set exceeds the two-pass rule in
# fused_linear_available; the plan halves ``bm`` until the estimate fits
# under the limit with margin.
_VMEM_SINGLE_LIMIT = 15.5 * 1024 * 1024


def _single_vmem_fits(n_pad: int, dp: int, bm: int) -> bool:
    return (3 * n_pad + 12 * dp) * bm * dp * 4 <= _VMEM_SINGLE_LIMIT


def _pad_plan(d: int, n_samples: int, n_obs: int = 0, single=None):
    """Static padding plan: ``(dp, bm, m_total)``.

    ``dp``: d padded to a power of two (min 16) up to 128, then to a lane
    multiple — Mosaic compiles power-of-two wide layouts several times
    faster than ragged ones (measured: dp=24/bm=32 takes ~450 s to compile,
    dp=32/bm=8 ~110 s; at fixed shapes the result is persistent-cached, but
    fresh installs pay it once per shape); ``bm``: samples per wide group,
    chosen so the wide width ``bm * dp`` fills 2048 lanes at small ``d``
    (1024 at dp=128) — at small ``d`` the kernels are bound by the
    per-group matmul/epilogue count, and widening the groups from the
    earlier fixed bm=8 (wd=256 at d=20) measured **1.9x** at wd=1024 on
    the d=20 joint config (1350 -> 2574 steps/s) plus a consistent +5-10%
    more at wd=2048 (same-process A/B, both cfg2 and cfg4; wd=4096 blows
    the VMEM budget at cfg4's N=600); ``m_total``: n_samples padded to a
    ``bm`` multiple (extra samples get zero softmax weight and are sliced
    away).

    When ``n_obs`` is known and the single-pass kernel will run, ``bm`` is
    additionally halved until the scoped-VMEM estimate fits (see
    ``_single_vmem_fits``) — measured at cfg4 (d=30, N=600): wd 2048
    exceeds Mosaic's 16 MB scoped limit, wd 1024 fits.
    """
    if single is None:
        single = _SINGLE_PASS
    if d <= _LANE:
        dp = 16
        while dp < d:
            dp *= 2
    else:
        dp = _round_up(d, _LANE)
    bm = max(1, (2048 if dp <= 64 else 1024) // dp)
    if n_obs and single:
        n_pad = _round_up(max(n_obs, _SUB), _SUB)
        while bm > 1 and not _single_vmem_fits(n_pad, dp, bm):
            bm //= 2
    return dp, bm, _round_up(n_samples, bm)


def _gen_uniform(shape):
    """Uniform(0,1) from the hardware PRNG (see pallas_kernels)."""
    bits = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    top = pltpu.bitcast(bits >> jnp.uint32(8), jnp.int32)
    u = top.astype(jnp.float32) * (1.0 / (1 << 24)) + 0.5 / (1 << 24)
    # Two stacked hazards force the clamp one ulp below the largest f32
    # under 1: (a) round-to-even lands exactly on 1.0 when top == 2^24-1
    # (p = 2^-24 per draw); (b) the TPU reciprocal is not correctly
    # rounded -- measured on v5e, 1.0 / (1 - 2^-24) returns exactly 1.0
    # (x86 gives 1.0000001). Either way the fast-soft formula
    # (1/u - 1) * exp(-alpha*s) produces 0 * inf = NaN once exp overflows
    # (score < -88/alpha, routine under late annealing; ~1e7 draws/step at
    # d=20 made this a near-certain mid-run collapse). At 1 - 2^-23 the
    # hardware reciprocal is strictly > 1 and the limit is exact (g -> 0).
    return jnp.minimum(u, jnp.float32(1.0 - 2.0**-23))


def _gen_noise(shape):
    """Logistic(0,1) noise from the hardware PRNG (see pallas_kernels)."""
    u = _gen_uniform(shape)
    return jnp.log(u) - jnp.log1p(-u)


def _make_kernel(n_samples: int, tau: float, obs_noise: float, pass2: bool,
                 bf16: bool = False, block_m: int = 8,
                 debug_noise: bool = False, single: bool = False,
                 n_real: int = 0):
    """Builds the kernel body: single-pass (``single=True``, the default
    production path — online softmax, see module docstring), pass-1
    (scoring) or pass-2 (gradient) of the legacy two-pass scheme.

    Grid: ``(P,)`` — one cell per particle. Samples are processed
    ``block_m`` at a time in a fully 2-D "wide" layout: a group's graphs /
    weights live as ``[d, block_m*d]`` blocks concatenated along lanes, so
    the scoring matmul is one ``[N, d] @ [d, block_m*d]`` (full MXU
    utilization), per-sample reductions become indicator matmuls, and no 3-D
    transposes/reshapes ever reach the mosaic compiler.

    ``n_real`` (single mode only): the un-padded sample count — padded
    samples are masked out of the online softmax with ``-inf`` streams
    (the two-pass form zeroes their XLA-side weights instead).
    """
    inv_var = 1.0 / obs_noise
    if n_samples % block_m != 0:
        block_m = 1
    bm = block_m
    n_groups = n_samples // bm

    def kernel(*refs):
        noise_ref = None
        if single:
            if debug_noise:
                (seed_ref, alpha_ref, scores_ref, theta_ref, logpdf_ref,
                 dprior_ref, x_ref, w_ref, noise_ref,
                 dscores_ref, dtheta_ref) = refs
            else:
                (seed_ref, alpha_ref, scores_ref, theta_ref, logpdf_ref,
                 dprior_ref, x_ref, w_ref,
                 dscores_ref, dtheta_ref) = refs
        elif pass2:
            if debug_noise:
                (seed_ref, alpha_ref, scores_ref, theta_ref, logpdf_ref,
                 dprior_ref, x_ref, w_ref, wsoft_ref, whard_ref, noise_ref,
                 dscores_ref, dtheta_ref) = refs
            else:
                (seed_ref, alpha_ref, scores_ref, theta_ref, logpdf_ref,
                 dprior_ref, x_ref, w_ref, wsoft_ref, whard_ref,
                 dscores_ref, dtheta_ref) = refs
        else:
            if debug_noise:
                (seed_ref, alpha_ref, scores_ref, theta_ref, logpdf_ref,
                 x_ref, w_ref, noise_ref, lsoft_ref, lhard_ref) = refs
            else:
                (seed_ref, alpha_ref, scores_ref, theta_ref, logpdf_ref,
                 x_ref, w_ref, lsoft_ref, lhard_ref) = refs

        p_idx = pl.program_id(0)
        alpha = alpha_ref[0, 0]
        scores = scores_ref[0]       # [d, d]
        theta = theta_ref[0]         # [d, d]
        logpdf_theta = logpdf_ref[0]  # [d, d] edge-prior logpdf of theta
        x = x_ref[:]                 # [Np, d] (zero-padded rows)
        w = w_ref[:]                 # [Np, d] observation weights (0/1)

        d = scores.shape[-1]
        wd = bm * d  # wide lane dimension

        def tile(a):
            """[d, d] -> [d, bm*d] by lane-concatenating bm copies."""
            return jnp.concatenate([a] * bm, axis=1)

        row = jax.lax.broadcasted_iota(jnp.int32, (d, d), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (d, d), 1)
        offdiag_t = tile((row != col).astype(jnp.float32))  # [d, wd]

        # indicator matrices (2-D iota only):
        #   blk_of[k] = k // d   (which sample a wide lane belongs to)
        #   B  [wd, bm]: lane k -> one-hot of its sample      (block reduce)
        #   S  [wd, d] : lane k -> one-hot of k % d           (block sum)
        lanes_w_b = jax.lax.broadcasted_iota(jnp.int32, (wd, bm), 0)
        sample_b = jax.lax.broadcasted_iota(jnp.int32, (wd, bm), 1)
        b_mat = (lanes_w_b // d == sample_b).astype(jnp.float32)
        lanes_w_d = jax.lax.broadcasted_iota(jnp.int32, (wd, d), 0)
        within_d = jax.lax.broadcasted_iota(jnp.int32, (wd, d), 1)
        s_mat = (lanes_w_d % d == within_d).astype(jnp.float32)

        if single:
            dscores_ref[0] = jnp.zeros_like(dscores_ref[0])
            dtheta_ref[0] = jnp.zeros_like(dtheta_ref[0])
            dprior_t = tile(dprior_ref[0])  # (mu_e - theta)/sig_e^2, wide
            # [1, bm] within-group sample index (padded-sample masking)
            sample_iota = jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)
        elif pass2:
            dscores_ref[0] = jnp.zeros_like(dscores_ref[0])
            dtheta_ref[0] = jnp.zeros_like(dtheta_ref[0])
            dprior_t = tile(dprior_ref[0])  # (mu_e - theta)/sig_e^2, wide
            wsoft_row = wsoft_ref[0, :, :]  # [1, m_pad]
            whard_row = whard_ref[0, :, :]
            m_pad = wsoft_row.shape[-1]
        else:
            m_pad = lsoft_ref.shape[-1]
        if not single:
            lane_m = jax.lax.broadcasted_iota(jnp.int32, (bm, m_pad), 1)
            grp_row = jax.lax.broadcasted_iota(jnp.int32, (bm, m_pad), 0)

        # hoist all per-particle transcendentals out of the sample loop:
        #   hard:  1[eps + a s > 0]  ==  1[u < sigmoid(a s)]
        #   soft (tau==1):  sigmoid(eps + a s)  ==  1 / (1 + (1/u - 1) e^{-a s})
        fast_soft = tau == 1.0
        sig_as = jax.nn.sigmoid(alpha * scores)
        sig_as_t = tile(sig_as)
        if fast_soft:
            exp_neg_t = tile(jnp.exp(-alpha * scores))
        else:
            alpha_scores_t = tile(alpha * scores)
        theta_t = tile(theta)
        logpdf_t = tile(logpdf_theta)
        w_t = jnp.concatenate([w] * bm, axis=1)

        # centered-scoring reference, once per particle at HIGHEST precision
        # (see module comment): every sample is scored relative to the
        # expected graph E[G|Z] = σ(α·s)⊙offdiag
        offdiag = (row != col).astype(jnp.float32)
        ref_g = sig_as * offdiag
        ref_g_t = sig_as_t * offdiag_t
        mean_ref = _ll_dot(x, ref_g * theta, (((1,), (0,)), ((), ())),
                           hi=True)                       # [Np, d]
        resid_ref = x - mean_ref                          # [Np, d] unmasked
        resid_ref_t = jnp.concatenate([resid_ref] * bm, axis=1)  # [Np, wd]

        # seed once per particle; both passes draw the same bit stream in the
        # same order, so the sample replay stays exact
        if not debug_noise:
            # (skipped in debug mode: prng_seed has no CPU interpret rule)
            pltpu.prng_seed(seed_ref[0, 0] + p_idx * jnp.int32(1000003))

        def cast(a):
            return a.astype(jnp.bfloat16) if bf16 else a

        def group_score(g_t):
            """g_t: [d, wd] wide graphs -> (Δll [1, bm], resid [Np, wd]).

            Centered scoring (module comment): only the delta matmul
            against the per-particle reference runs per sample, at fast
            single-pass precision — its operand magnitudes ARE the
            inter-sample spread, so truncation error stays relative to
            the signal at any data scale. Pass 1 consumes the Δll
            (softmax weights are shift-invariant per particle, so the
            dropped ll_ref and the constant Σw·log_norm never matter);
            pass 2 consumes only resid (its unused Δll chain is dead
            code the compiler drops)."""
            dg_t = g_t - ref_g_t
            delta = _ll_dot(cast(x), cast(dg_t * theta_t),
                            (((1,), (0,)), ((), ())),
                            hi=_DELTA_HI, fast=True)  # [Np, wd]
            resid = (resid_ref_t - delta) * w_t
            per_lane = jnp.sum(
                w_t * (-0.5 * inv_var) * delta
                * (delta - 2.0 * resid_ref_t),
                axis=0, keepdims=True,
            )                                                    # [1, wd]
            prior_lane = jnp.sum(dg_t * logpdf_t, axis=0, keepdims=True)
            ll = jnp.dot(per_lane + prior_lane, b_mat,
                         preferred_element_type=jnp.float32,
                         precision=_PREC_LL)     # [1, bm]
            return ll, resid

        def group_dw(resid):
            """dW (wide): x^T resid / sigma^2 -> [d, wd]."""
            return inv_var * jax.lax.dot_general(
                cast(x), cast(resid),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_PREC_GRAD,
            )

        def accumulate(ws_lane, wh_lane, resid_soft, resid_hard, g_soft,
                       g_hard):
            """Adds this group's weighted gradient contributions (weights
            pre-expanded to wide lanes) into the output accumulators."""
            dw_soft = group_dw(resid_soft)
            dg = theta_t * dw_soft + logpdf_t
            contrib_s = ws_lane * (tau * alpha * g_soft * (1.0 - g_soft) * dg)
            dscores_ref[0] += jnp.dot(contrib_s, s_mat,
                                      preferred_element_type=jnp.float32,
                                      precision=_PREC_GRAD)

            dw_hard = group_dw(resid_hard)
            contrib_h = wh_lane * g_hard * (dw_hard + dprior_t)
            dtheta_ref[0] += jnp.dot(contrib_h, s_mat,
                                     preferred_element_type=jnp.float32,
                                     precision=_PREC_GRAD)

        neg_big = jnp.float32(-3.0e38)

        def body(grp, carry):
            m0 = grp * bm
            if debug_noise:
                u0 = noise_ref[0, 0, pl.ds(grp * d, d), :]
                u1 = noise_ref[0, 1, pl.ds(grp * d, d), :]
            else:
                u = _gen_uniform((2, d, wd))
                u0, u1 = u[0], u[1]
            if fast_soft:
                g_soft = offdiag_t / (1.0 + (1.0 / u0 - 1.0) * exp_neg_t)
            else:
                eps0 = jnp.log(u0) - jnp.log1p(-u0)
                g_soft = jax.nn.sigmoid(tau * (eps0 + alpha_scores_t)) \
                    * offdiag_t
            g_hard = (u1 < sig_as_t).astype(jnp.float32) * offdiag_t

            ll_soft, resid_soft = group_score(g_soft)
            ll_hard, resid_hard = group_score(g_hard)

            if single:
                # online softmax (flash-attention style; the scheme the
                # nonlinear kernel validated in round 3): rescale the
                # [d, d] accumulators when the running max advances,
                # accumulate exp(ll - max)-weighted grads, divide by the
                # normalizer after the last group.
                m_soft, z_soft, m_hard, z_hard = carry
                valid = (m0 + sample_iota) < n_real   # [1, bm]
                ll_s = jnp.where(valid, ll_soft, neg_big)
                ll_h = jnp.where(valid, ll_hard, neg_big)
                new_m_s = jnp.maximum(m_soft, jnp.max(ll_s))
                new_m_h = jnp.maximum(m_hard, jnp.max(ll_h))
                scale_s = jnp.exp(m_soft - new_m_s)
                scale_h = jnp.exp(m_hard - new_m_h)
                w_smp_s = jnp.where(valid, jnp.exp(ll_s - new_m_s), 0.0)
                w_smp_h = jnp.where(valid, jnp.exp(ll_h - new_m_h), 0.0)
                z_soft = z_soft * scale_s + jnp.sum(w_smp_s)
                z_hard = z_hard * scale_h + jnp.sum(w_smp_h)
                ws_lane = jnp.dot(w_smp_s, b_mat.T,
                                  preferred_element_type=jnp.float32,
                                  precision=_PREC_GRAD)   # [1, wd]
                wh_lane = jnp.dot(w_smp_h, b_mat.T,
                                  preferred_element_type=jnp.float32,
                                  precision=_PREC_GRAD)
                dscores_ref[0] *= scale_s
                dtheta_ref[0] *= scale_h
                accumulate(ws_lane, wh_lane, resid_soft, resid_hard,
                           g_soft, g_hard)
                return new_m_s, z_soft, new_m_h, z_hard

            # [bm, m_pad] one-hot rows for this group's lanes
            one_hot = (lane_m == (m0 + grp_row)).astype(jnp.float32)

            if not pass2:
                acc_soft, acc_hard = carry
                acc_soft = acc_soft + jnp.dot(
                    ll_soft, one_hot, preferred_element_type=jnp.float32,
                    precision=_PREC_LL,
                )
                acc_hard = acc_hard + jnp.dot(
                    ll_hard, one_hot, preferred_element_type=jnp.float32,
                    precision=_PREC_LL,
                )
                return acc_soft, acc_hard

            # gather this group's softmax weights, expand to wide lanes
            ws = jnp.dot(wsoft_row, one_hot.T,
                         preferred_element_type=jnp.float32, precision=_PREC_GRAD)   # [1, bm]
            wh = jnp.dot(whard_row, one_hot.T,
                         preferred_element_type=jnp.float32, precision=_PREC_GRAD)
            ws_lane = jnp.dot(ws, b_mat.T,
                              preferred_element_type=jnp.float32, precision=_PREC_GRAD)  # [1, wd]
            wh_lane = jnp.dot(wh, b_mat.T,
                              preferred_element_type=jnp.float32, precision=_PREC_GRAD)

            accumulate(ws_lane, wh_lane, resid_soft, resid_hard, g_soft,
                       g_hard)
            return carry

        if single:
            init = (neg_big, jnp.float32(0.0), neg_big, jnp.float32(0.0))
            if debug_noise:
                # static Python loop: grp stays a Python int, so the debug
                # noise reads are static slices (tests only; n_groups tiny)
                carry = init
                for grp in range(n_groups):
                    carry = body(grp, carry)
                m_s, z_s, m_h, z_h = carry
            else:
                m_s, z_s, m_h, z_h = jax.lax.fori_loop(
                    0, n_groups, body, init)
            dscores_ref[0] = dscores_ref[0] / z_s
            dtheta_ref[0] = dtheta_ref[0] / z_h
        elif pass2:
            if debug_noise:
                # static Python loop: grp stays a Python int, so the debug
                # noise reads are static slices (tests only; n_groups tiny)
                carry = 0
                for grp in range(n_groups):
                    carry = body(grp, carry)
            else:
                jax.lax.fori_loop(0, n_groups, body, 0)
        else:
            zero = jnp.zeros((1, m_pad), jnp.float32)
            if debug_noise:
                acc = (zero, zero)
                for grp in range(n_groups):
                    acc = body(grp, acc)
                acc_soft, acc_hard = acc
            else:
                acc_soft, acc_hard = jax.lax.fori_loop(
                    0, n_groups, body, (zero, zero)
                )
            lsoft_ref[0] = acc_soft
            lhard_ref[0] = acc_hard

    return kernel


def _particle_specs(d, extra_pass2, n_pad):
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    pdd = lambda: pl.BlockSpec((1, d, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    nd = lambda: pl.BlockSpec((n_pad, d), lambda i: (0, 0),
                              memory_space=pltpu.VMEM)
    specs = [smem(), smem(), pdd(), pdd(), pdd()]
    if extra_pass2:
        specs.append(pdd())
    specs += [nd(), nd()]
    return specs


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "bm", "tau", "obs_noise", "interpret",
                     "bf16"),
)
def _fused_pass1(seed, alpha, scores, theta, logpdf_theta, x_pad, w_pad,
                 noise=None, *, n_samples, bm, tau, obs_noise,
                 interpret=False, bf16=False):
    p, d, _ = scores.shape
    n_pad = x_pad.shape[0]
    kernel = _make_kernel(n_samples, tau, obs_noise, pass2=False, bf16=bf16,
                          block_m=bm, debug_noise=noise is not None)
    m_pad = _round_up(n_samples, _LANE)
    out_shape = [
        jax.ShapeDtypeStruct((p, 1, m_pad), jnp.float32),
        jax.ShapeDtypeStruct((p, 1, m_pad), jnp.float32),
    ]
    out_specs = [
        pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    in_specs = _particle_specs(d, False, n_pad)
    args = [seed, alpha, scores, theta, logpdf_theta, x_pad, w_pad]
    if noise is not None:
        in_specs.append(
            pl.BlockSpec((1,) + noise.shape[1:], lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM))
        args.append(noise)
    l_soft, l_hard = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(*args)
    return l_soft[:, 0, :n_samples], l_hard[:, 0, :n_samples]


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "n_real", "bm", "tau", "obs_noise",
                     "interpret", "bf16"),
)
def _fused_pass2(seed, alpha, scores, theta, logpdf_theta, dprior_theta,
                 x_pad, w_pad, w_soft, w_hard, noise=None, *, n_samples,
                 n_real, bm, tau, obs_noise, interpret=False, bf16=False):
    p, d, _ = scores.shape
    n_pad = x_pad.shape[0]
    m_pad = _round_up(n_samples, _LANE)
    # padded samples (n_real..n_samples) keep weight 0: the kernel replays
    # them for PRNG-stream alignment but they contribute nothing
    w_soft = jnp.zeros((p, 1, m_pad), jnp.float32).at[:, 0, :n_real].set(
        w_soft
    )
    w_hard = jnp.zeros((p, 1, m_pad), jnp.float32).at[:, 0, :n_real].set(
        w_hard
    )
    kernel = _make_kernel(n_samples, tau, obs_noise, pass2=True, bf16=bf16,
                          block_m=bm, debug_noise=noise is not None)
    in_specs = _particle_specs(d, True, n_pad) + [
        pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if noise is not None:
        in_specs.append(
            pl.BlockSpec((1,) + noise.shape[1:], lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM))
    out_specs = [
        pl.BlockSpec((1, d, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((p, d, d), jnp.float32),
        jax.ShapeDtypeStruct((p, d, d), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, alpha, scores, theta, logpdf_theta, dprior_theta, x_pad, w_pad,
      w_soft, w_hard, *([] if noise is None else [noise]))


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "n_real", "bm", "tau", "obs_noise",
                     "interpret", "bf16"),
)
def _fused_single(seed, alpha, scores, theta, logpdf_theta, dprior_theta,
                  x_pad, w_pad, noise=None, *, n_samples, n_real, bm, tau,
                  obs_noise, interpret=False, bf16=False):
    """One-pass sample-and-score-and-grad call (online softmax in-kernel;
    no [P, M] log-prob round-trip through HBM/XLA)."""
    p, d, _ = scores.shape
    n_pad = x_pad.shape[0]
    kernel = _make_kernel(n_samples, tau, obs_noise, pass2=True, bf16=bf16,
                          block_m=bm, debug_noise=noise is not None,
                          single=True, n_real=n_real)
    in_specs = _particle_specs(d, True, n_pad)
    if noise is not None:
        in_specs.append(
            pl.BlockSpec((1,) + noise.shape[1:], lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM))
    out_specs = [
        pl.BlockSpec((1, d, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, d, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((p, d, d), jnp.float32),
        jax.ShapeDtypeStruct((p, d, d), jnp.float32),
    ]
    return pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(seed, alpha, scores, theta, logpdf_theta, dprior_theta, x_pad, w_pad,
      *([] if noise is None else [noise]))


def fused_linear_estimators(
    *, zs, thetas, x, interv_mask, key, alpha, tau, n_samples, model,
    bf16: bool = False, seed_offset=0, interpret=False, debug_noise=None,
    single_pass=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Computes ``(d scores [P, d, d], d theta [P, d, d])`` — the fused
    Z-likelihood (reparam) and Θ-likelihood MC estimates for
    :class:`~dibs_tpu.models.LinearGaussian`.

    The caller chains ``d scores`` to ``Z`` via
    ``dU = dS @ V, dV = dSᵀ @ U`` (see the estimator factory).

    ``seed_offset`` is the global index of this batch's first particle —
    nonzero when the caller runs one shard of a mesh-sharded particle axis
    (see :func:`dibs_tpu.parallel.shard_ops.sharded_fused_linear`), making
    the sharded run bitwise-identical to the unsharded one.
    """
    from dibs_tpu.ops.edges import edge_scores

    if single_pass is None:
        single_pass = _SINGLE_PASS
    p, d, _, _ = zs.shape
    n_obs = x.shape[0]
    dp, bm, m_total = _pad_plan(d, n_samples, n_obs=n_obs,
                                single=single_pass)
    _notice_compile(d, n_samples)
    n_pad = _round_up(max(n_obs, _SUB), _SUB)
    x_pad = jnp.zeros((n_pad, dp), jnp.float32).at[:n_obs, :d].set(x)
    w_pad = jnp.zeros((n_pad, dp), jnp.float32).at[:n_obs, :d].set(
        1.0 - interv_mask.astype(jnp.float32)
    )

    def pad_dd(a):
        """[P, d, d] -> [P, dp, dp] zero-padded (exact: every padded-entry
        contribution is multiplied by a padded zero downstream)."""
        if dp == d:
            return a
        return jnp.zeros((p, dp, dp), jnp.float32).at[:, :d, :d].set(a)

    scores = pad_dd(edge_scores(zs))
    sig_e = model.sig_edge
    mu_e = model.mean_edge
    logpdf_theta = pad_dd(
        -0.5 * jnp.square((thetas - mu_e) / sig_e)
        - jnp.log(sig_e) - 0.5 * jnp.log(2.0 * jnp.pi)
    )
    dprior_theta = pad_dd((mu_e - thetas) / (sig_e**2))
    thetas_p = pad_dd(thetas)

    seed = (
        _key_to_seed(key)
        + jnp.asarray(seed_offset, jnp.int32) * jnp.int32(1000003)
    ).reshape(1, 1)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    if single_pass:
        dscores, dtheta = _fused_single(
            seed, alpha_arr, scores, thetas_p, logpdf_theta, dprior_theta,
            x_pad, w_pad, debug_noise,
            n_samples=m_total, n_real=n_samples, bm=bm, tau=float(tau),
            obs_noise=float(model.obs_noise), bf16=bf16,
            interpret=interpret,
        )
        if dp != d:
            dscores = dscores[:, :d, :d]
            dtheta = dtheta[:, :d, :d]
        return dscores, dtheta

    l_soft, l_hard = _fused_pass1(
        seed, alpha_arr, scores, thetas_p, logpdf_theta, x_pad, w_pad,
        debug_noise,
        n_samples=m_total, bm=bm, tau=float(tau),
        obs_noise=float(model.obs_noise), bf16=bf16, interpret=interpret,
    )
    l_soft = l_soft[:, :n_samples]
    l_hard = l_hard[:, :n_samples]
    w_soft = jnp.exp(l_soft - logsumexp(l_soft, axis=1, keepdims=True))
    w_hard = jnp.exp(l_hard - logsumexp(l_hard, axis=1, keepdims=True))

    dscores, dtheta = _fused_pass2(
        seed, alpha_arr, scores, thetas_p, logpdf_theta, dprior_theta,
        x_pad, w_pad, w_soft, w_hard, debug_noise,
        n_samples=m_total, n_real=n_samples, bm=bm, tau=float(tau),
        obs_noise=float(model.obs_noise), bf16=bf16, interpret=interpret,
    )
    if dp != d:
        dscores = dscores[:, :d, :d]
        dtheta = dtheta[:, :d, :d]
    return dscores, dtheta
