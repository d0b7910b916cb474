"""Estimator validation against an exact-enumeration oracle.

On d=3 the expectation ``E_{p(G|Z)}[p(D | G)]`` is enumerable exactly over all
2^6 off-diagonal binary graphs, so ``∇_Z log E`` can be computed by autodiff
of the exact sum — the strongest available correctness check for both the
score-function (REINFORCE) and Gumbel-reparameterization estimators
(SURVEY.md §7 step 4).
"""
import itertools

import jax
import jax.numpy as jnp
import numpy as onp
import pytest
from jax import random

from dibs_tpu.inference.estimators import EstimatorConfig, make_estimators
from dibs_tpu.models.graph import ErdosReniDAGDistribution
from dibs_tpu.models.linear_gaussian import LinearGaussian
from dibs_tpu.ops import edges as edge_ops

D = 3
_OFFDIAG = [(i, j) for i in range(D) for j in range(D) if i != j]


def _all_graphs():
    gs = []
    for bits in itertools.product([0, 1], repeat=len(_OFFDIAG)):
        g = onp.zeros((D, D), dtype=onp.float32)
        for b, (i, j) in zip(bits, _OFFDIAG):
            g[i, j] = b
        gs.append(g)
    return jnp.array(onp.stack(gs))  # [64, 3, 3]


def _setup():
    key = random.PRNGKey(0)
    model = LinearGaussian(n_vars=D, obs_noise=0.5)
    er = ErdosReniDAGDistribution(D, 1)
    key, k1, k2, k3, k4 = random.split(key, 5)
    g_gt = er.sample_G(k1)
    theta_gt = model.sample_parameters(key=k2, n_vars=D)
    x = model.sample_obs(key=k3, n_samples=20, g=g_gt, theta=theta_gt)
    interv = jnp.zeros_like(x, dtype=jnp.int32)
    z = 0.5 * random.normal(k4, (D, D, 2))
    theta = model.sample_parameters(key=k2, n_vars=D)
    return model, x, interv, z, theta


def _exact_grad_z(model, x, interv, z, theta, alpha):
    """Autodiff of the exactly-enumerated log E_{p(G|Z)}[p(Θ, D | G)]."""
    gs = _all_graphs()
    log_liks = jax.vmap(
        lambda g: model.interventional_log_joint_prob(g, theta, x, interv, None)
    )(gs)

    def log_expectation(z_):
        log_pg = jax.vmap(lambda g: edge_ops.latent_log_prob(g, z_, alpha))(gs)
        return jax.scipy.special.logsumexp(log_pg + log_liks)

    return jax.grad(log_expectation)(z)


@pytest.mark.parametrize("estimator", ["score", "reparam"])
def test_grad_z_estimator_matches_exact_enumeration(estimator):
    model, x, interv, z, theta = _setup()
    t = 10.0
    alpha_linear = 0.2
    alpha = alpha_linear * t

    exact = _exact_grad_z(model, x, interv, z, theta, alpha)

    cfg = EstimatorConfig(
        alpha_linear=alpha_linear,
        # tiny tau bias is inherent to reparam; large MC count for tightness
        n_grad_mc_samples=6000 if estimator == "score" else 3000,
        tau=5.0,
        grad_estimator_z=estimator,
    )
    est = make_estimators(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    grads, _ = est.eltwise_grad_z_likelihood(
        z[None], theta[None], jnp.zeros(1), t, random.split(random.PRNGKey(5), 1)
    )
    approx = grads[0]

    denom = jnp.abs(exact).max()
    rel_err = jnp.abs(approx - exact).max() / denom
    # MC estimators: loose statistical tolerance (reparam additionally carries
    # the concrete-relaxation bias controlled by tau)
    assert rel_err < 0.35, f"{estimator}: rel err {rel_err}"


def test_grad_theta_estimator_matches_exact_enumeration():
    model, x, interv, z, theta = _setup()
    t = 10.0
    alpha_linear = 0.2
    alpha = alpha_linear * t

    gs = _all_graphs()
    log_pg = jax.vmap(lambda g: edge_ops.latent_log_prob(g, z, alpha))(gs)

    def log_expectation(th):
        log_liks = jax.vmap(
            lambda g: model.interventional_log_joint_prob(g, th, x, interv, None)
        )(gs)
        return jax.scipy.special.logsumexp(log_pg + log_liks)

    exact = jax.grad(log_expectation)(theta)

    cfg = EstimatorConfig(alpha_linear=alpha_linear, n_grad_mc_samples=6000)
    est = make_estimators(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    approx = est.eltwise_grad_theta_likelihood(
        z[None], theta[None], t, random.split(random.PRNGKey(6), 1)
    )[0]

    rel_err = jnp.abs(approx - exact).max() / jnp.abs(exact).max()
    assert rel_err < 0.3, f"rel err {rel_err}"


def test_score_function_baseline_updates():
    model, x, interv, z, theta = _setup()
    cfg = EstimatorConfig(
        alpha_linear=0.2, n_grad_mc_samples=32, grad_estimator_z="score",
        score_function_baseline=0.5,
    )
    est = make_estimators(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    baselines = jnp.zeros(1)
    grads, new_baselines = est.eltwise_grad_z_likelihood(
        z[None], theta[None], baselines, 5.0, random.split(random.PRNGKey(7), 1)
    )
    assert jnp.isfinite(grads).all()
    assert not jnp.allclose(new_baselines, baselines)  # EMA moved


def test_grad_latent_prior_terms():
    """Gaussian term must be -z/sigma^2 when beta=0 and prior is flat."""
    model, x, interv, z, theta = _setup()
    cfg = EstimatorConfig(alpha_linear=0.2, beta_linear=0.0, n_acyclicity_mc_samples=4)
    est = make_estimators(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    std = 0.7
    out = est.eltwise_grad_latent_prior(
        z[None], random.split(random.PRNGKey(8), 1), 3.0, std
    )
    assert jnp.allclose(out[0], -z / std**2, atol=1e-5)


def test_unknown_estimator_raises():
    model, x, interv, z, theta = _setup()
    cfg = EstimatorConfig(grad_estimator_z="bogus")
    with pytest.raises(ValueError):
        make_estimators(
            cfg=cfg,
            log_graph_prior=lambda soft_g: jnp.array(0.0),
            log_joint_prob=model.interventional_log_joint_prob,
            x=x,
            interv_mask=interv,
        )
