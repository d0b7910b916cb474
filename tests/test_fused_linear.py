"""Fused linear-Gaussian estimator path — CPU-checkable pieces.

The Pallas kernels need TPU hardware (validated by scripts/validate_tpu.py);
here we check the gating logic and that the engine composes correctly when
the fused path is absent.
"""
import jax.numpy as jnp
from jax import random

from dibs_tpu.inference import JointDiBS
from dibs_tpu.inference.fused_linear import fused_linear_available
from dibs_tpu.target import make_linear_gaussian_model


def test_fused_unavailable_on_cpu():
    assert not fused_linear_available(128)
    assert not fused_linear_available(20)


def test_engine_runs_without_fused_path():
    data, gm, lm = make_linear_gaussian_model(
        key=random.PRNGKey(0), n_vars=6, graph_prior_str="er",
        n_observations=20, n_ho_observations=5,
    )
    dibs = JointDiBS(
        x=data.x, graph_model=gm, likelihood_model=lm,
        n_grad_mc_samples=4, n_acyclicity_mc_samples=2,
        fused_sample_sharing=None,
    )
    assert dibs.est.fused_grad_both is None  # CPU: Pallas gate closed
    gs, thetas = dibs.sample(key=random.PRNGKey(1), n_particles=3, steps=5)
    assert jnp.isfinite(thetas).all()

    # default: the generic shared-sample fused estimator serves the joint
    # engine even off-TPU (round-3 'hard' sampling-sharing default)
    dibs2 = JointDiBS(
        x=data.x, graph_model=gm, likelihood_model=lm,
        n_grad_mc_samples=4, n_acyclicity_mc_samples=2,
    )
    assert dibs2.est.fused_grad_both is not None
    gs, thetas = dibs2.sample(key=random.PRNGKey(1), n_particles=3, steps=5)
    assert jnp.isfinite(thetas).all()


def test_fused_gate_requires_reparam():
    """The fused kernel implements the reparam Z-estimator only."""
    data, gm, lm = make_linear_gaussian_model(
        key=random.PRNGKey(0), n_vars=6, graph_prior_str="er",
        n_observations=20, n_ho_observations=5,
    )
    dibs = JointDiBS(
        x=data.x, graph_model=gm, likelihood_model=lm,
        grad_estimator_z="score",
    )
    assert dibs.est.fused_grad_both is None


# ---------------------------------------------------------------------------
# Debug-noise exactness: with injected uniforms the two-pass kernel is
# deterministic, and its outputs must equal jax.grad of
# ``logsumexp_m log p(Θ, D | G_m)`` (grad of logsumexp = softmax-weighted sum
# of per-sample grads — exactly the self-normalized estimator). Runs in
# interpret mode on CPU; the 10x data scale guards the regime where the
# bf16-MXU truncation class of bugs shows up on hardware.
# ---------------------------------------------------------------------------
import jax
import pytest
from jax.scipy.special import logsumexp

from dibs_tpu.inference.fused_linear import (
    _pad_plan,
    fused_linear_estimators,
)
from dibs_tpu.models import LinearGaussian
from dibs_tpu.ops.edges import edge_scores

pytestmark = []


def _ll_joint(g, theta, x, w, model):
    mean = x @ (g * theta)
    resid = (x - mean) * w
    log_norm = -0.5 * jnp.log(2.0 * jnp.pi * model.obs_noise)
    ll = jnp.sum(w * (-0.5 / model.obs_noise * resid**2 + log_norm))
    lp = (-0.5 * ((theta - model.mean_edge) / model.sig_edge) ** 2
          - jnp.log(model.sig_edge) - 0.5 * jnp.log(2.0 * jnp.pi))
    return ll + jnp.sum(g * lp)


@pytest.mark.heavy
@pytest.mark.parametrize("single_pass", [True, False])
@pytest.mark.parametrize("tau,scale", [
    (1.0, 1.0),    # fast_soft production path
    (1.0, 10.0),   # unstandardized-data regime
    (0.7, 1.0),    # generic sigmoid path
])
def test_fused_linear_matches_autodiff(tau, scale, single_pass):
    d, p, m, alpha = 6, 2, 20, 1.7
    n_obs = 12
    key = random.PRNGKey(0)
    model = LinearGaussian(n_vars=d, obs_noise=0.1)
    k1, k2, k3, k4 = random.split(key, 4)
    thetas = model.sample_parameters(key=k1, n_vars=d, n_particles=p)
    x = random.normal(k2, (n_obs, d)) * scale
    interv = (random.uniform(k3, x.shape) < 0.2).astype(jnp.int32)
    w = 1.0 - interv.astype(jnp.float32)
    zs = 0.7 * random.normal(k4, (p, d, d, 2))

    dp, bm, m_total = _pad_plan(d, m)
    n_groups = m_total // bm
    wd = bm * dp
    uniforms = random.uniform(
        random.PRNGKey(42), (p, 2, n_groups * dp, wd),
        minval=1e-4, maxval=1.0 - 1e-4)

    dscores, dtheta = fused_linear_estimators(
        zs=zs, thetas=thetas, x=x, interv_mask=interv,
        key=random.PRNGKey(7), alpha=alpha, tau=tau, n_samples=m,
        model=model, interpret=True, debug_noise=uniforms,
        single_pass=single_pass)

    scores = edge_scores(zs)
    offdiag = 1.0 - jnp.eye(d)

    def blocks(pp, which, mm):
        grp, mloc = mm // bm, mm % bm
        return uniforms[pp, which, grp * dp:(grp + 1) * dp,
                        mloc * dp:(mloc + 1) * dp][:d, :d]

    for pp in range(p):
        theta_p = thetas[pp]

        def lse_soft(s):
            lls = []
            for mm in range(m):
                u0 = blocks(pp, 0, mm)
                eps = jnp.log(u0) - jnp.log1p(-u0)
                g_soft = jax.nn.sigmoid(tau * (eps + alpha * s)) * offdiag
                lls.append(_ll_joint(g_soft, theta_p, x, w, model))
            return logsumexp(jnp.stack(lls))

        def lse_hard(th):
            lls = []
            for mm in range(m):
                u1 = blocks(pp, 1, mm)
                g_hard = (u1 < jax.nn.sigmoid(alpha * scores[pp])).astype(
                    jnp.float32) * offdiag
                lls.append(_ll_joint(g_hard, th, x, w, model))
            return logsumexp(jnp.stack(lls))

        ds_exp = jax.grad(lse_soft)(scores[pp])
        dt_exp = jax.grad(lse_hard)(theta_p)
        ds_tol = 1e-4 * max(1.0, float(jnp.abs(ds_exp).max()))
        dt_tol = 1e-4 * max(1.0, float(jnp.abs(dt_exp).max()))
        assert jnp.abs(dscores[pp] - ds_exp).max() < ds_tol, (
            f"dscores mismatch p={pp}: "
            f"{float(jnp.abs(dscores[pp] - ds_exp).max()):.3e} vs tol {ds_tol:.3e}")
        assert jnp.abs(dtheta[pp] - dt_exp).max() < dt_tol, (
            f"dtheta mismatch p={pp}: "
            f"{float(jnp.abs(dtheta[pp] - dt_exp).max()):.3e} vs tol {dt_tol:.3e}")


def test_uniform_clamp_prevents_fast_soft_nan():
    """The 24-bit hardware-uniform mapping rounds to exactly 1.0 when the
    top bits are all ones (round-to-even at (2^24-1)/2^24 + 2^-25), and the
    fast-soft formula ``offdiag / (1 + (1/u - 1) * exp(-alpha*s))`` then
    produces 0 * inf = NaN once ``exp`` overflows (strongly negative score
    under late annealing). The kernels clamp every uniform to the largest
    f32 below 1; this pins both the hazard and the fix's arithmetic."""
    import numpy as np

    top = np.float32(2**24 - 1)
    u_unclamped = top * np.float32(1.0 / (1 << 24)) + np.float32(
        0.5 / (1 << 24))
    assert u_unclamped == np.float32(1.0)  # the hazard is real
    with np.errstate(invalid="ignore"):
        bad = (np.float32(1.0) / u_unclamped - np.float32(1.0)) * np.float32(
            np.inf)
    assert np.isnan(bad)

    # the clamp must sit at 1 - 2^-23, NOT 1 - 2^-24: the TPU's f32
    # reciprocal is not correctly rounded and returns exactly 1.0 for
    # 1 - 2^-24 (measured on v5e; x86 below computes 1.0000001), which
    # re-creates t1 == 0 and the same 0 * inf. At 1 - 2^-23 the quotient
    # is >= 1 + 2^-23 under ANY faithful rounding, so t1 > 0 everywhere.
    u = np.minimum(u_unclamped, np.float32(1.0 - 2.0**-23))
    assert u < np.float32(1.0)
    t1 = np.float32(1.0) / u - np.float32(1.0)
    assert t1 > 0.0
    g = np.float32(1.0) / (np.float32(1.0) + t1 * np.float32(np.inf))
    assert g == np.float32(0.0)  # correct sigmoid(-inf) limit, not NaN
    # and the clamp target is what jnp.minimum applies in the kernels
    import jax.numpy as jnp
    assert float(jnp.float32(1.0 - 2.0**-23)) == float(u)


@pytest.mark.heavy
@pytest.mark.parametrize("single_pass", [True, False])
def test_centered_scoring_survives_extreme_data_scale(single_pass):
    """The centered (delta) scoring scheme is the reason the fused linear
    kernel is scale-invariant: at data scale ~300 the absolute lls reach
    ~3e7 nats, where plain-f32 storage has multi-nat resolution and a
    direct (uncentered) f32 scoring chain corrupts the softmax weights.
    Compare the fused gradients (interpret mode, injected noise) against
    a closed-form float64 reference of the self-normalized estimators —
    only the centered scheme keeps the error small here."""
    import numpy as np

    d, p, m, alpha, tau = 6, 2, 20, 1.7, 1.0
    n_obs = 12
    scale = 300.0
    key = random.PRNGKey(3)
    model = LinearGaussian(n_vars=d, obs_noise=0.1)
    k1, k2, k3, k4 = random.split(key, 4)
    thetas = model.sample_parameters(key=k1, n_vars=d, n_particles=p)
    x = random.normal(k2, (n_obs, d)) * scale
    interv = (random.uniform(k3, x.shape) < 0.2).astype(jnp.int32)
    w = 1.0 - interv.astype(jnp.float32)
    zs = 0.7 * random.normal(k4, (p, d, d, 2))

    dp, bm, m_total = _pad_plan(d, m)
    n_groups = m_total // bm
    wd = bm * dp
    uniforms = random.uniform(
        random.PRNGKey(11), (p, 2, n_groups * dp, wd),
        minval=1e-4, maxval=1.0 - 1e-4)

    dscores, dtheta = fused_linear_estimators(
        zs=zs, thetas=thetas, x=x, interv_mask=interv,
        key=random.PRNGKey(7), alpha=alpha, tau=tau, n_samples=m,
        model=model, interpret=True, debug_noise=uniforms,
        single_pass=single_pass)

    # float64 closed-form reference (per-sample grads weighted by the
    # f64 softmax of the exact lls)
    scores = np.asarray(edge_scores(zs), np.float64)
    x64 = np.asarray(x, np.float64)
    w64 = np.asarray(w, np.float64)
    th64 = np.asarray(thetas, np.float64)
    u64 = np.asarray(uniforms, np.float64)
    offdiag = 1.0 - np.eye(d)
    inv_var = 1.0 / model.obs_noise
    logpdf = (-0.5 * ((th64 - model.mean_edge) / model.sig_edge) ** 2
              - np.log(model.sig_edge) - 0.5 * np.log(2.0 * np.pi))
    dprior = (model.mean_edge - th64) / model.sig_edge**2

    def blk(pp, which, mm):
        grp, mloc = mm // bm, mm % bm
        return u64[pp, which, grp * dp:(grp + 1) * dp,
                   mloc * dp:(mloc + 1) * dp][:d, :d]

    for pp in range(p):
        g_soft, g_hard, lls, llh = [], [], [], []
        for mm in range(m):
            u0, u1 = blk(pp, 0, mm), blk(pp, 1, mm)
            eps = np.log(u0) - np.log1p(-u0)
            gs = offdiag / (1.0 + np.exp(-tau * (eps + alpha * scores[pp])))
            gh = (u1 < 1.0 / (1.0 + np.exp(-alpha * scores[pp]))) * offdiag

            def ll(g):
                resid = (x64 - x64 @ (g * th64[pp])) * w64
                return (np.sum(w64 * (-0.5 * inv_var) * resid**2)
                        + np.sum(g * logpdf[pp]))

            g_soft.append(gs), g_hard.append(gh)
            lls.append(ll(gs)), llh.append(ll(gh))
        ws = np.exp(lls - np.max(lls)) / np.sum(np.exp(lls - np.max(lls)))
        wh = np.exp(llh - np.max(llh)) / np.sum(np.exp(llh - np.max(llh)))
        ds_ref = np.zeros((d, d))
        dt_ref = np.zeros((d, d))
        for mm in range(m):
            gs, gh = g_soft[mm], g_hard[mm]
            dW_s = inv_var * x64.T @ ((x64 - x64 @ (gs * th64[pp]))
                                      * w64)
            ds_ref += ws[mm] * (tau * alpha * gs * (1.0 - gs)
                                * (th64[pp] * dW_s + logpdf[pp]))
            dW_h = inv_var * x64.T @ ((x64 - x64 @ (gh * th64[pp]))
                                      * w64)
            dt_ref += wh[mm] * (gh * (dW_h + dprior[pp]))
        ds_tol = 2e-3 * max(1.0, float(np.abs(ds_ref).max()))
        dt_tol = 2e-3 * max(1.0, float(np.abs(dt_ref).max()))
        assert np.abs(np.asarray(dscores[pp], np.float64) - ds_ref).max() \
            < ds_tol
        assert np.abs(np.asarray(dtheta[pp], np.float64) - dt_ref).max() \
            < dt_tol
