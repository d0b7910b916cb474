"""Fused single-pass sample-and-score kernel for DenseNonlinearGaussian.

Computes BOTH likelihood gradients of the joint engine — the Gumbel-softmax
reparameterization Z-gradient and the hard-sample Θ-gradient — in ONE
Pallas kernel pass over the MC sample batch, for single-hidden-layer MLP
conditionals (the reference default, nonlinearGaussian.py:105).

Like the linear kernel (``fused_linear.py``), graphs and Logistic noise are
generated in VMEM from the hardware PRNG (never touching HBM) in a "wide"
2-D layout: a group of ``bm`` samples lives as ``[d, bm*d]`` lane-
concatenated blocks, so every layer is a ``[N, d] @ [d, bm*d]`` MXU matmul
and per-sample reductions are indicator matmuls.

Unlike the linear kernel there is NO second (seed-replay) pass: the
self-normalized estimators need softmax weights over all M samples, and a
two-pass design would recompute every forward. Instead the kernel keeps an
**online softmax** per particle (flash-attention style): running max ``M``
and normalizer ``Z`` for the soft and hard log-probability streams, with
the gradient accumulators rescaled by ``exp(M_old - M_new)`` whenever the
max advances; after the last group the accumulators divide by ``Z``. This
makes the gradient estimate exactly

    sum_m softmax(l)_m * grad_m

in one pass with no stored per-sample state — ~1.5x fewer matmuls than the
two-pass form and a single kernel launch.

Gradient math (single hidden layer, act σ, per node j, parent mask g[:,j]):

    pre_h = x @ (g[:, j] ⊙ W1[j, :, h]) + b1[j, h]
    mean  = Σ_h act(pre_h) W2[j, h] + b2[j]
    δ     = (x - mean) keep / obs_noise
    u_h   = δ · act'(pre_h) · W2[j, h]
    ∂ll/∂W1[j,i,h] = g[i,j] xᵀ u_h      ∂ll/∂b1[j,h] = Σ_n u_h
    ∂ll/∂W2[j,h]   = Σ_n δ act(pre_h)   ∂ll/∂b2[j]   = Σ_n δ
    ∂/∂g[i,j]      = L1[i,j] + W1[j,i,h] (xᵀ u_h)    (L1 = masked-prior)
    dscores        = τ α g_soft (1-g_soft) ∂/∂g       (soft stream)

Sample-independent prior-gradient terms (unmasked leaves) are added
OUTSIDE the kernel: softmax weights sum to 1, so they contribute their
plain value. The masked first-layer prior gradient ``g ⊙ (-W1/σ_p²)``
depends on the hard sample and stays in-kernel.

Only the per-particle log-likelihood *differences* matter (softmax is
shift-invariant), so constant prior terms are dropped from the streams.

CENTERED (delta) SCORING — scale invariance (round 3c, mirrors
fused_linear.py). The first layer is linear in the parent mask
(``pre = x @ (g[:,j] ⊙ W1)``), so the kernel runs one reference forward
per particle at HIGHEST precision against the expected graph
``E[G|Z] = σ(α·s)⊙offdiag`` and per sample computes only the
first-layer delta matmul ``D_h = x @ ((G_m − E[G]) ⊙ W1_h)`` at fast
single-pass precision. Activation differences are then formed stably
(for relu, ``relu(p+D) − relu(p) = where(p ≥ 0, max(D, −p), max(p+D, 0))``
— no cancellation against the large reference pre-activation; bounded
activations use the plain difference, whose absolute error is already
tiny), giving the mean difference ``Δmean = Σ_h actdiff_h · W2_h`` and

    Δll   = −(1/2σ²)·Σ w·Δmean·(Δmean − 2·resid_ref)  +  Σ (G−E[G])·L1
    resid = (resid_ref − Δmean)·w

so both the MXU truncation and the f32 storage of the online-softmax
stream values stay relative to the inter-sample spread at any data
scale. Absolute pre-activations/activations (reference + delta) are
still materialized for the gradient chain (``act'(pre)``, ``dW2``),
where absolute f32 precision is sufficient.
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

from dibs_tpu.inference.fused_linear import _ll_dot
from dibs_tpu.ops.soft_graphs import _key_to_seed

__all__ = ["fused_nonlinear_estimators", "fused_nonlinear_available"]

_LANE = 128
_SUB = 8
_MAX_D = 256
_MAX_H = 16

# Exact-f32 dots: Mosaic's default precision truncates MXU inputs to bf16,
# which collapses the per-sample log-likelihood differences (and hence the
# softmax weights) on unstandardized data — see fused_linear (same two
# precision classes: scoring chain vs gradient accumulation).
_PREC_LL = jax.lax.Precision.HIGHEST
_PREC_GRAD = jax.lax.Precision.DEFAULT

_ACTS = {
    "relu": (lambda x: jnp.maximum(x, 0.0),
             lambda x: (x > 0.0).astype(jnp.float32)),
    "tanh": (jnp.tanh, lambda x: 1.0 - jnp.tanh(x) ** 2),
    "sigmoid": (jax.nn.sigmoid,
                lambda x: jax.nn.sigmoid(x) * (1.0 - jax.nn.sigmoid(x))),
    "leakyrelu": (lambda x: jnp.where(x > 0.0, x, 0.01 * x),
                  lambda x: jnp.where(x > 0.0, 1.0, 0.01)),
}


def _relu_diff(p, delta):
    """``relu(p + delta) − relu(p)`` without forming the (possibly huge)
    operands: exact case analysis, so no cancellation against ``p``."""
    return jnp.where(p >= 0.0, jnp.maximum(delta, -p),
                     jnp.maximum(p + delta, 0.0))


# act(p + D) − act(p), computed stably. relu (the reference default) gets
# the exact branch form; bounded activations (tanh/sigmoid) use the plain
# difference — their values are O(1), so the absolute error of the
# difference is already ~2^-24 regardless of |p|. leakyrelu is piecewise
# linear with slope >= 0.01, same argument up to 100x.
_ACT_DIFFS = {
    "relu": _relu_diff,
    "tanh": lambda p, d: jnp.tanh(p + d) - jnp.tanh(p),
    "sigmoid": lambda p, d: jax.nn.sigmoid(p + d) - jax.nn.sigmoid(p),
    "leakyrelu": lambda p, d: (jnp.where(p + d > 0.0, p + d, 0.01 * (p + d))
                               - jnp.where(p > 0.0, p, 0.01 * p)),
}


def fused_nonlinear_available(model, n_obs: int = 0) -> bool:
    """True when the fused kernel supports this model on this backend.

    ``n_obs`` (when known) enters a VMEM budget check: the kernel keeps
    ~``(6 h1 + 10)`` live ``[N_pad, bm*dp]`` f32 buffers per group (both
    streams' pre-activations/activations, the centered-scoring reference
    pre/act/residual tiles, and data tiles); past ~12 MB the Mosaic
    compile would fail opaquely, so the gate declines and the engine
    falls back to the XLA estimators. Calibrated against measured v5e
    failures (d=20, h1=5: compile OK at N=400, fails at N=800 — the gate
    declines from N=400, conservative by design).
    """
    from dibs_tpu.ops.pallas_kernels import pallas_enabled

    ok = (
        _PALLAS and pallas_enabled()
        and len(model.hidden_layers) == 1
        and model.hidden_layers[0] <= _MAX_H
        and 2 <= model.n_vars <= _MAX_D
        and model.activation in _ACTS
        and model.bias
    )
    if ok and n_obs:
        dp, bm, _ = _pad_plan_nl(model.n_vars, 1)
        n_pad = _round_up(max(n_obs, _SUB), _SUB)
        h1 = model.hidden_layers[0]
        live = (6 * h1 + 10) * n_pad * bm * dp * 4
        ok = live <= 12 * 1024 * 1024
    return ok


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _pad_plan_nl(d: int, n_samples: int):
    """``(dp, bm, m_total)``: d padded to a sublane multiple; bm = smallest
    group size making the wide width ``bm*dp`` a lane multiple."""
    dp = _round_up(max(d, 2), _SUB)
    import math

    bm = _LANE // math.gcd(dp, _LANE)
    return dp, bm, _round_up(n_samples, bm)


def _gen_uniform(shape):
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


def _make_nl_kernel(*, n_samples: int, m_total: int, bm: int, h1: int,
                    tau: float, obs_noise: float, sig_param: float,
                    activation: str, debug_noise: bool):
    """Kernel body. Grid ``(P,)``; one cell = one particle, all samples."""
    inv_var = 1.0 / obs_noise
    inv_varp = 1.0 / (sig_param * sig_param)
    act, dact = _ACTS[activation]
    act_diff = _ACT_DIFFS[activation]
    n_groups = m_total // bm
    fast_soft = tau == 1.0

    def kernel(*refs):
        if debug_noise:
            (seed_ref, alpha_ref, scores_ref, w1_ref, l1_ref, b1_ref,
             w2_ref, x_ref, wobs_ref, noise_ref,
             dscores_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
             lse_ref) = refs
        else:
            (seed_ref, alpha_ref, scores_ref, w1_ref, l1_ref, b1_ref,
             w2_ref, x_ref, wobs_ref,
             dscores_ref, dw1_ref, db1_ref, dw2_ref, db2_ref,
             lse_ref) = refs

        p_idx = pl.program_id(0)
        alpha = alpha_ref[0, 0]
        scores = scores_ref[0]      # [dp, dp]
        l1 = l1_ref[0]              # [dp, dp] masked-prior logpdf sums
        w1 = w1_ref[0]              # [h1, dp(in i), dp(node j)]
        b1 = b1_ref[0]              # [h1, dp]
        w2 = w2_ref[0]              # [h1+1, dp] (row h1 = b2)
        x = x_ref[:]                # [Np, dp]
        wobs = wobs_ref[:]          # [Np, dp]

        dp = scores.shape[-1]
        wd = bm * dp

        def tile(a):
            return jnp.concatenate([a] * bm, axis=1)

        row = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 1)
        offdiag_t = tile((row != col).astype(jnp.float32))

        # lane k of a wide block belongs to sample k//dp, node k%dp
        lanes_w_d = jax.lax.broadcasted_iota(jnp.int32, (wd, dp), 0)
        within_d = jax.lax.broadcasted_iota(jnp.int32, (wd, dp), 1)
        s_mat = (lanes_w_d % dp == within_d).astype(jnp.float32)
        # lane -> sample one-hot (per-sample reduce / weight broadcast)
        lanes_w_b = jax.lax.broadcasted_iota(jnp.int32, (wd, bm), 0)
        sample_b = jax.lax.broadcasted_iota(jnp.int32, (wd, bm), 1)
        b_mat = (lanes_w_b // dp == sample_b).astype(jnp.float32)

        sig_as = jax.nn.sigmoid(alpha * scores)
        sig_as_t = tile(sig_as)
        if fast_soft:
            exp_neg_t = tile(jnp.exp(-alpha * scores))
        else:
            alpha_scores_t = tile(alpha * scores)
        l1_t = tile(l1)
        w_t = jnp.concatenate([wobs] * bm, axis=1)
        w1_t = [tile(w1[hh]) for hh in range(h1)]         # [dp, wd] each
        w2_t = [tile(w2[hh:hh + 1, :]) for hh in range(h1)]
        dprior_w1_t = [-inv_varp * a for a in w1_t]

        # centered-scoring reference forward, once per particle at HIGHEST
        # precision (module comment): expected graph E[G|Z] = σ(α·s)⊙offdiag
        offdiag_sm = (row != col).astype(jnp.float32)
        ref_g = sig_as * offdiag_sm
        ref_g_t = sig_as_t * offdiag_t

        def tile_n(a):
            """[Np, dp] -> [Np, wd] by lane-concatenating bm copies."""
            return jnp.concatenate([a] * bm, axis=1)

        is_relu = activation == "relu"
        mean_ref = jnp.broadcast_to(w2[h1:h1 + 1, :], x.shape)  # b2 term
        pre_ref_t, act_ref_t = [], []
        for hh in range(h1):
            pre_r = _ll_dot(x, ref_g * w1[hh], (((1,), (0,)), ((), ())),
                            hi=True) + b1[hh:hh + 1, :]     # [Np, dp]
            a_r = act(pre_r)
            mean_ref = mean_ref + a_r * w2[hh:hh + 1, :]
            pre_ref_t.append(tile_n(pre_r))
            if not is_relu:   # relu reconstructs act directly from pre
                act_ref_t.append(tile_n(a_r))
        resid_ref_t = tile_n(x - mean_ref)                  # [Np, wd]

        # per-group sample validity (padded samples masked out of softmax)
        sample_iota = jax.lax.broadcasted_iota(jnp.int32, (1, bm), 1)

        if not debug_noise:
            # (skipped in debug mode: prng_seed has no CPU interpret rule)
            pltpu.prng_seed(seed_ref[0, 0] + p_idx * jnp.int32(1000003))

        # zero the accumulators (grid cell owns its whole output block)
        dscores_ref[0] = jnp.zeros_like(dscores_ref[0])
        dw1_ref[0] = jnp.zeros_like(dw1_ref[0])
        db1_ref[0] = jnp.zeros_like(db1_ref[0])
        dw2_ref[0] = jnp.zeros_like(dw2_ref[0])
        db2_ref[0] = jnp.zeros_like(db2_ref[0])

        neg_big = jnp.float32(-3.0e38)

        def forward(g_t):
            """g_t [dp, wd] -> (Δll [1, wd], δ [Np, wd], pre list, a list).

            Centered scoring (module comment): per sample only the
            first-layer delta matmul runs, at fast single-pass precision;
            activation differences are formed stably against the
            reference, and the Δll/residual carry inter-sample-spread
            magnitudes at any data scale. Absolute pre/act (reference +
            delta) feed the gradient chain."""
            dg_t = g_t - ref_g_t
            pres, acts_ = [], []
            mean_diff = jnp.float32(0.0)   # b2 cancels against the ref
            for hh in range(h1):
                d_pre = _ll_dot(x, dg_t * w1_t[hh],
                                (((1,), (0,)), ((), ())), fast=True)
                pre = pre_ref_t[hh] + d_pre
                if is_relu:
                    # stable a_diff reuses pre: relu(p+D) − relu(p)
                    a = jnp.maximum(pre, 0.0)
                    a_diff = jnp.where(pre_ref_t[hh] >= 0.0,
                                       jnp.maximum(d_pre, -pre_ref_t[hh]), a)
                else:
                    a_diff = act_diff(pre_ref_t[hh], d_pre)
                    a = act_ref_t[hh] + a_diff
                pres.append(pre)
                acts_.append(a)
                mean_diff = mean_diff + a_diff * w2_t[hh]
            resid = (resid_ref_t - mean_diff) * w_t
            ll = jnp.sum(
                w_t * (-0.5 * inv_var) * mean_diff
                * (mean_diff - 2.0 * resid_ref_t),
                axis=0, keepdims=True,
            )
            ll = ll + jnp.sum(dg_t * l1_t, axis=0, keepdims=True)
            delta = inv_var * resid
            return ll, delta, pres, acts_

        def body(grp, carry):
            m_soft, z_soft, m_hard, z_hard = carry
            m0 = grp * bm

            if debug_noise:
                u0 = noise_ref[0, 0, pl.ds(grp * dp, dp), :]
                u1 = noise_ref[0, 1, pl.ds(grp * dp, dp), :]
            else:
                u = _gen_uniform((2, dp, wd))
                u0, u1 = u[0], u[1]
            if fast_soft:
                g_soft = offdiag_t / (1.0 + (1.0 / u0 - 1.0) * exp_neg_t)
            else:
                eps0 = jnp.log(u0) - jnp.log1p(-u0)
                g_soft = jax.nn.sigmoid(tau * (eps0 + alpha_scores_t)) \
                    * offdiag_t
            g_hard = (u1 < sig_as_t).astype(jnp.float32) * offdiag_t

            valid = (m0 + sample_iota) < n_samples   # [1, bm]

            ll_lane_s, delta_s, pre_s, act_s = forward(g_soft)
            ll_lane_h, delta_h, pre_h, act_h = forward(g_hard)
            # per-sample log-probs: reduce each sample's dp node-lanes
            ll_s = jnp.dot(ll_lane_s, b_mat,
                           preferred_element_type=jnp.float32,
                           precision=_PREC_LL)  # [1, bm]
            ll_h = jnp.dot(ll_lane_h, b_mat,
                           preferred_element_type=jnp.float32,
                           precision=_PREC_LL)
            ll_s = jnp.where(valid, ll_s, neg_big)
            ll_h = jnp.where(valid, ll_h, neg_big)

            # --- online softmax state updates (per sample) ---
            grp_max_s = jnp.max(ll_s)
            grp_max_h = jnp.max(ll_h)
            new_m_s = jnp.maximum(m_soft, grp_max_s)
            new_m_h = jnp.maximum(m_hard, grp_max_h)
            scale_s = jnp.exp(m_soft - new_m_s)
            scale_h = jnp.exp(m_hard - new_m_h)
            w_smp_s = jnp.where(valid, jnp.exp(ll_s - new_m_s), 0.0)
            w_smp_h = jnp.where(valid, jnp.exp(ll_h - new_m_h), 0.0)
            z_soft = z_soft * scale_s + jnp.sum(w_smp_s)
            z_hard = z_hard * scale_h + jnp.sum(w_smp_h)
            # broadcast each sample's weight to its dp lanes
            w_lane_s = jnp.dot(w_smp_s, b_mat.T,
                               preferred_element_type=jnp.float32, precision=_PREC_GRAD)  # [1, wd]
            w_lane_h = jnp.dot(w_smp_h, b_mat.T,
                               preferred_element_type=jnp.float32, precision=_PREC_GRAD)

            dscores_ref[0] *= scale_s
            dw1_ref[0] *= scale_h
            db1_ref[0] *= scale_h
            dw2_ref[0] *= scale_h
            db2_ref[0] *= scale_h

            # --- soft stream -> dscores ---
            dg = l1_t
            for hh in range(h1):
                u_h = delta_s * dact(pre_s[hh]) * w2_t[hh]
                xtu = jax.lax.dot_general(
                    x, u_h, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC_GRAD,
                )  # [dp, wd]
                dg = dg + w1_t[hh] * xtu
            sens = tau * alpha * g_soft * (1.0 - g_soft)
            contrib = w_lane_s * sens * dg
            dscores_ref[0] += jnp.dot(contrib, s_mat,
                                      preferred_element_type=jnp.float32, precision=_PREC_GRAD)

            # --- hard stream -> theta gradients ---
            delta_hw = w_lane_h * delta_h          # weight folded into δ
            db2_ref[0] += jnp.dot(
                jnp.sum(delta_hw, axis=0, keepdims=True), s_mat,
                preferred_element_type=jnp.float32, precision=_PREC_GRAD,
            )
            for hh in range(h1):
                u_h = delta_hw * dact(pre_h[hh]) * w2_t[hh]
                xtu = jax.lax.dot_general(
                    x, u_h, dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32, precision=_PREC_GRAD,
                )
                dw1_wide = g_hard * (xtu + w_lane_h * dprior_w1_t[hh])
                dw1_ref[0, hh] += jnp.dot(dw1_wide, s_mat,
                                          preferred_element_type=jnp.float32, precision=_PREC_GRAD)
                db1_ref[0, hh:hh + 1, :] += jnp.dot(
                    jnp.sum(u_h, axis=0, keepdims=True), s_mat,
                    preferred_element_type=jnp.float32, precision=_PREC_GRAD,
                )
                dw2_ref[0, hh:hh + 1, :] += jnp.dot(
                    jnp.sum(delta_hw * act_h[hh], axis=0, keepdims=True),
                    s_mat, preferred_element_type=jnp.float32, precision=_PREC_GRAD,
                )

            return new_m_s, z_soft, new_m_h, z_hard

        init = (neg_big, jnp.float32(0.0), neg_big, jnp.float32(0.0))
        if debug_noise:
            # static Python loop: grp stays a Python int, so the debug
            # noise reads are static slices (tests only; n_groups is tiny)
            carry = init
            for grp in range(n_groups):
                carry = body(grp, carry)
            m_s, z_s, m_h, z_h = carry
        else:
            m_s, z_s, m_h, z_h = jax.lax.fori_loop(0, n_groups, body, init)

        dscores_ref[0] = dscores_ref[0] / z_s
        dw1_ref[0] = dw1_ref[0] / z_h
        db1_ref[0] = db1_ref[0] / z_h
        dw2_ref[0] = dw2_ref[0] / z_h
        db2_ref[0] = db2_ref[0] / z_h
        lse_ref[0] = jnp.concatenate(
            [jnp.full((1, 1), m_s + jnp.log(z_s), jnp.float32),
             jnp.full((1, 1), m_h + jnp.log(z_h), jnp.float32)], axis=0,
        )

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_samples", "m_total", "bm", "h1", "tau", "obs_noise",
                     "sig_param", "activation", "interpret"),
)
def _fused_nl_call(seed, alpha, scores, w1t, l1, b1t, w2t, x_pad, w_pad,
                   noise, *, n_samples, m_total, bm, h1, tau, obs_noise,
                   sig_param, activation, interpret=False):
    p, dp, _ = scores.shape
    n_pad = x_pad.shape[0]
    debug_noise = noise is not None
    kernel = _make_nl_kernel(
        n_samples=n_samples, m_total=m_total, bm=bm, h1=h1, tau=tau,
        obs_noise=obs_noise, sig_param=sig_param, activation=activation,
        debug_noise=debug_noise,
    )
    smem = lambda: pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.SMEM)
    pdd = lambda: pl.BlockSpec((1, dp, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        smem(), smem(), pdd(),
        pl.BlockSpec((1, h1, dp, dp), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pdd(),
        pl.BlockSpec((1, h1, dp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h1 + 1, dp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((n_pad, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((n_pad, dp), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    args = [seed, alpha, scores, w1t, l1, b1t, w2t, x_pad, w_pad]
    if debug_noise:
        # [P, 2, n_groups*dp, wd] uniforms (tests only)
        in_specs.append(
            pl.BlockSpec((1,) + noise.shape[1:],
                         lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)
        )
        args.append(noise)
    out_specs = [
        pdd(),
        pl.BlockSpec((1, h1, dp, dp), lambda i: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h1, dp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, h1, dp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, dp), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, 1), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((p, dp, dp), jnp.float32),
        jax.ShapeDtypeStruct((p, h1, dp, dp), jnp.float32),
        jax.ShapeDtypeStruct((p, h1, dp), jnp.float32),
        jax.ShapeDtypeStruct((p, h1, dp), jnp.float32),
        jax.ShapeDtypeStruct((p, 1, dp), jnp.float32),
        jax.ShapeDtypeStruct((p, 2, 1), jnp.float32),
    ]
    return pl.pallas_call(
        kernel, grid=(p,), in_specs=in_specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret,
    )(*args)


def fused_nonlinear_estimators(
    *, zs, thetas, x, interv_mask, key, alpha, tau, n_samples, model,
    seed_offset=0, interpret=False, debug_noise=None,
) -> Tuple[jnp.ndarray, list]:
    """Computes ``(dscores [P, d, d], dtheta pytree)`` for
    :class:`~dibs_tpu.models.DenseNonlinearGaussian` with one hidden layer.

    ``dscores`` is the reparam Z-likelihood gradient w.r.t. the edge-score
    matrix (chain to Z outside); ``dtheta`` matches the model's parameter
    pytree ``[(W1, b1), (W2, b2)]`` with leading particle dim.

    ``debug_noise``: optional ``[P, 2, m_total*dp, bm*dp]`` uniforms for
    deterministic tests (replaces the hardware PRNG stream).
    """
    from dibs_tpu.inference.fused_linear import _notice_compile
    from dibs_tpu.ops.edges import edge_scores

    _notice_compile(model.n_vars, n_samples)  # silence looks like a hang
    p, d, _, _ = zs.shape
    h1 = model.hidden_layers[0]
    dp, bm, m_total = _pad_plan_nl(d, n_samples)
    n_obs = x.shape[0]
    n_pad = _round_up(max(n_obs, _SUB), _SUB)

    (w1, b1), (w2, b2) = thetas[0], thetas[1]
    # wide layouts: W1 -> [P, h1, dp(in), dp(node)]; b1 -> [P, h1, dp];
    # W2 -> [P, h1+1, dp] with b2 as the extra row h1
    w1_perm = jnp.transpose(w1, (0, 3, 2, 1))  # [P, h1, d(in), d(node)]
    w1t = jnp.zeros((p, h1, dp, dp), jnp.float32).at[:, :, :d, :d].set(
        w1_perm)
    # masked-prior logpdf sums: L1[i, j] = sum_h logpdf(W1[j, i, h])
    sp = model.sig_param
    logpdf_w1 = (-0.5 * jnp.square(w1 / sp) - jnp.log(sp)
                 - 0.5 * jnp.log(2.0 * jnp.pi))  # [P, d, d, h1]
    l1_full = jnp.transpose(jnp.sum(logpdf_w1, axis=-1), (0, 2, 1))  # [P,i,j]
    l1 = jnp.zeros((p, dp, dp), jnp.float32).at[:, :d, :d].set(l1_full)

    b1t = jnp.zeros((p, h1, dp), jnp.float32).at[:, :, :d].set(
        jnp.transpose(b1, (0, 2, 1)))
    # W2 rows 0..h1-1; row h1 = b2 (the kernel adds it as a constant mean
    # term by treating its "activation" as 1 — implemented by adding b2 to
    # the mean outside the act loop; we pass it in the same ref)
    w2t = jnp.zeros((p, h1 + 1, dp), jnp.float32)
    w2t = w2t.at[:, :h1, :d].set(jnp.transpose(w2[..., 0], (0, 2, 1)))
    w2t = w2t.at[:, h1, :d].set(b2[..., 0])

    x_pad = jnp.zeros((n_pad, dp), jnp.float32).at[:n_obs, :d].set(x)
    w_pad = jnp.zeros((n_pad, dp), jnp.float32).at[:n_obs, :d].set(
        1.0 - interv_mask.astype(jnp.float32))

    scores = jnp.zeros((p, dp, dp), jnp.float32).at[:, :d, :d].set(
        edge_scores(zs))

    seed = (
        _key_to_seed(key)
        + jnp.asarray(seed_offset, jnp.int32) * jnp.int32(1000003)
    ).reshape(1, 1)
    alpha_arr = jnp.asarray(alpha, jnp.float32).reshape(1, 1)

    dscores, dw1, db1, dw2, db2, _lse = _fused_nl_call(
        seed, alpha_arr, scores, w1t, l1, b1t, w2t, x_pad, w_pad,
        debug_noise,
        n_samples=n_samples, m_total=m_total, bm=bm, h1=h1, tau=float(tau),
        obs_noise=float(model.obs_noise), sig_param=float(model.sig_param),
        activation=model.activation, interpret=interpret,
    )

    dscores = dscores[:, :d, :d]
    # back to model layout + sample-independent prior-gradient terms
    # (softmax weights sum to 1, so they add their plain value):
    inv_varp = 1.0 / (sp * sp)
    dw1_out = jnp.transpose(dw1[:, :, :d, :d], (0, 3, 2, 1))  # [P,d,d,h1]
    db1_out = jnp.transpose(db1[:, :, :d], (0, 2, 1)) - inv_varp * b1
    dw2_out = (jnp.transpose(dw2[:, :, :d], (0, 2, 1))[..., None]
               - inv_varp * w2)
    db2_out = db2[:, 0, :d][..., None] - inv_varp * b2
    dtheta = [(dw1_out, db1_out), (dw2_out, db2_out)]
    return dscores, dtheta
