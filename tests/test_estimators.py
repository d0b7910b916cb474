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

pytestmark = pytest.mark.heavy  # compile-heavy; excluded from `make test-fast`

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


def test_grad_z_score_matches_exact_enumeration():
    """The REINFORCE estimator is unbiased — it must converge to the exact
    enumerated gradient with enough MC samples."""
    model, x, interv, z, theta = _setup()
    t = 10.0
    alpha_linear = 0.2
    alpha = alpha_linear * t

    exact = _exact_grad_z(model, x, interv, z, theta, alpha)

    cfg = EstimatorConfig(
        alpha_linear=alpha_linear, n_grad_mc_samples=6000,
        grad_estimator_z="score",
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
    rel_err = jnp.abs(grads[0] - exact).max() / jnp.abs(exact).max()
    assert rel_err < 0.35, f"rel err {rel_err}"


def test_grad_z_reparam_correct_and_directionally_aligned():
    """The Gumbel-softmax estimator is *biased* by the concrete relaxation
    (the reference carries the same bias), so exact equality to the hard-graph
    gradient is the wrong check. Instead: (a) the implementation must
    bit-match an independently-coded reference-style two-pass evaluation with
    the same keys; (b) at the default tau=1 it must be directionally aligned
    with the exact enumerated gradient."""
    from jax import grad as jgrad, vmap
    from jax.scipy.special import logsumexp

    from dibs_tpu.ops.edges import particle_to_soft_graph
    from dibs_tpu.utils.func import expand_by

    model, x, interv, z, theta = _setup()
    t, alpha_linear, tau, n_mc = 10.0, 0.2, 1.0, 512
    alpha = alpha_linear * t

    cfg = EstimatorConfig(
        alpha_linear=alpha_linear, n_grad_mc_samples=n_mc, tau=tau,
        grad_estimator_z="reparam",
    )
    est = make_estimators(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    key0 = random.PRNGKey(5)
    grads, _ = est.eltwise_grad_z_likelihood(
        z[None], theta[None], jnp.zeros(1), t, key0[None]
    )

    # (a) reference-style independent recompute (two passes) with the same
    # noise: the batched sampler draws eps = logistic(keys[0], [B, M, d, d])
    eps = random.logistic(key0, shape=(1, n_mc, D, D))[0]

    def f(zz, e):
        sg = particle_to_soft_graph(zz, e, alpha, tau)
        return model.interventional_log_joint_prob(sg, theta, x, interv, key0)

    logprobs = vmap(f, (None, 0))(z, eps)
    gz = vmap(jgrad(f, 0), (None, 0))(z, eps)
    log_num, sign = logsumexp(
        a=expand_by(logprobs, 3), b=gz, axis=0, return_sign=True
    )
    ref = sign * jnp.exp(log_num - logsumexp(logprobs, axis=0))
    assert jnp.allclose(grads[0], ref, atol=1e-5)

    # (b) directional alignment with the exact hard-graph gradient
    exact = _exact_grad_z(model, x, interv, z, theta, alpha)
    a, b = grads[0].ravel(), exact.ravel()
    cos = (a @ b) / (jnp.linalg.norm(a) * jnp.linalg.norm(b))
    assert cos > 0.5, f"cosine {cos}"


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
    # the log-space EMA warm-starts at -inf ("no baseline yet"), matching
    # DiBS._init_sf_baseline
    baselines = jnp.full(1, -jnp.inf)
    grads, new_baselines = est.eltwise_grad_z_likelihood(
        z[None], theta[None], baselines, 5.0, random.split(random.PRNGKey(7), 1)
    )
    assert jnp.isfinite(grads).all()
    assert jnp.isfinite(new_baselines).all()  # EMA moved off -inf
    # second step: baseline active, gradient stays finite
    grads2, nb2 = est.eltwise_grad_z_likelihood(
        z[None], theta[None], new_baselines, 6.0,
        random.split(random.PRNGKey(8), 1),
    )
    assert jnp.isfinite(grads2).all()
    assert jnp.isfinite(nb2).all()


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


def test_grad_z_score_rb_matches_exact_enumeration_and_cuts_variance():
    """The per-node Rao-Blackwellized estimator (a) targets the same exact
    gradient (the likelihood expectation factorizes over independent parent
    columns) and (b) has much lower variance than the joint-score estimator
    at equal sample count."""
    from dibs_tpu.models import BGe

    D = 3
    key = random.PRNGKey(7)
    key, k1, k2, k3 = random.split(key, 4)
    from dibs_tpu.models import ErdosReniDAGDistribution, LinearGaussian

    er = ErdosReniDAGDistribution(D, n_edges_per_node=1)
    gen = LinearGaussian(n_vars=D)
    g_gt = er.sample_G(k1)
    x = gen.sample_obs(key=k2, n_samples=20, g=g_gt,
                       theta=gen.sample_parameters(key=k1, n_vars=D))
    interv = jnp.zeros_like(x, dtype=jnp.int32)
    z = 0.5 * random.normal(k3, (D, D, 2))
    bge = BGe(n_vars=D)

    t, alpha_linear = 10.0, 0.2
    alpha = alpha_linear * t

    # exact gradient of log E_{p(G|Z)}[p(D|G)] by enumeration
    gs = _all_graphs()
    log_liks = jax.vmap(
        lambda g: bge.interventional_log_marginal_prob(g, None, x, interv,
                                                       None)
    )(gs)

    def log_expectation(z_):
        log_pg = jax.vmap(
            lambda g: edge_ops.latent_log_prob(g, z_, alpha))(gs)
        return jax.scipy.special.logsumexp(log_pg + log_liks)

    exact = jax.grad(log_expectation)(z)

    def estimate(kind, n_mc, seed):
        cfg = EstimatorConfig(
            alpha_linear=alpha_linear, n_grad_mc_samples=n_mc,
            grad_estimator_z=kind,
        )
        est = make_estimators(
            cfg=cfg,
            log_graph_prior=lambda soft_g: jnp.array(0.0),
            log_joint_prob=bge.interventional_log_marginal_prob,
            node_log_joint_prob=bge.interventional_node_log_marginal_probs,
            x=x, interv_mask=interv,
        )
        grads, _ = est.eltwise_grad_z_likelihood(
            z[None], None, jnp.zeros(1), t,
            random.split(random.PRNGKey(seed), 1),
        )
        return grads[0]

    # (a) unbiasedness: converges to the exact enumerated gradient
    est_rb = estimate("score_rb", 6000, 5)
    rel = jnp.abs(est_rb - exact).max() / jnp.abs(exact).max()
    assert rel < 0.2, f"rel err {rel}"

    # (b) variance: per-node weights beat joint weights at equal M
    def spread(kind):
        ests = jnp.stack([estimate(kind, 128, s) for s in range(8)])
        return float(jnp.var(ests, axis=0).sum())

    v_joint, v_rb = spread("score"), spread("score_rb")
    assert v_rb < 0.5 * v_joint, (v_rb, v_joint)


def test_score_rb_requires_node_decomposition():
    from dibs_tpu.models import LinearGaussian

    model = LinearGaussian(n_vars=3)
    x = jnp.zeros((4, 3))
    cfg = EstimatorConfig(grad_estimator_z="score_rb", n_grad_mc_samples=4)
    est = make_estimators(
        cfg=cfg, log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x, interv_mask=jnp.zeros_like(x, dtype=jnp.int32),
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="score_rb"):
        est.eltwise_grad_z_likelihood(
            jnp.zeros((1, 3, 3, 2)), None, jnp.zeros(1), 1.0,
            random.split(random.PRNGKey(0), 1),
        )


def _exact_grad_theta(model, x, interv, z, theta, alpha):
    """Autodiff of the exactly-enumerated ``log E_{p(G|Z)}[p(Θ, D | G)]``
    w.r.t. Θ (the Θ-estimator's estimand, reference dibs.py:467-551)."""
    gs = _all_graphs()
    log_pg = jax.vmap(lambda g: edge_ops.latent_log_prob(g, z, alpha))(gs)

    def log_expectation(theta_):
        log_liks = jax.vmap(
            lambda g: model.interventional_log_joint_prob(
                g, theta_, x, interv, None
            )
        )(gs)
        return jax.scipy.special.logsumexp(log_pg + log_liks)

    return jax.grad(log_expectation)(theta)


def test_fused_sample_sharing_matches_generic_and_oracle():
    """The shared-sample fused Z+Θ estimator ('hard' mode): (a) its
    Z-gradient bit-matches the generic reparam estimator under the same
    key; (b) its Θ-gradient converges to the exact enumerated Θ-gradient
    (thresholded Gumbel-max samples are exactly Bernoulli, so the
    estimator is unbiased).

    Note: a fully-relaxed 'soft' variant (Θ-gradient from the soft graphs
    too, one shared vjp) was evaluated and REJECTED: its Θ-gradient has
    cosine ~0.2/-0.1/0.2 to the exact gradient at alpha = 2/10/40 — the
    soft mask reweights the Θ-prior term continuously and the bias never
    vanishes — while this 'hard' mode measures 1.000/0.952/0.999 at the
    same settings.
    """
    model, x, interv, z, theta = _setup()
    t, alpha_linear, n_mc = 10.0, 0.2, 4000
    alpha = alpha_linear * t

    cfg = EstimatorConfig(
        alpha_linear=alpha_linear, n_grad_mc_samples=n_mc,
        grad_estimator_z="reparam",
    )
    common = dict(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    est_generic = make_estimators(**common)
    est_fused = make_estimators(fused_sample_sharing="hard", **common)
    assert est_fused.fused_grad_both is not None

    key = random.PRNGKey(7)
    keys = random.split(key, 1)
    dz_gen, _ = est_generic.eltwise_grad_z_likelihood(
        z[None], theta[None], jnp.zeros(1), t, keys
    )
    # fused consumes the same key the generic path reads as keys[0]
    dz_f, dtheta_f = est_fused.fused_grad_both(z[None], theta[None], t, keys[0])
    assert jnp.allclose(dz_f, dz_gen, rtol=1e-5, atol=1e-6), (
        jnp.abs(dz_f - dz_gen).max()
    )

    exact_t = _exact_grad_theta(model, x, interv, z, theta, alpha)
    rel_err = jnp.abs(dtheta_f[0] - exact_t).max() / jnp.abs(exact_t).max()
    assert rel_err < 0.35, f"rel err {rel_err}"


def test_score_rb_rejects_ema_baseline():
    """score_rb applies no EMA control variate; a baseline setting must not
    be silently ignored (ADVICE r2)."""
    import pytest as _pytest

    from dibs_tpu.models import LinearGaussian

    model = LinearGaussian(n_vars=3)
    x = jnp.zeros((4, 3))
    cfg = EstimatorConfig(
        grad_estimator_z="score_rb", n_grad_mc_samples=4,
        score_function_baseline=0.5,
    )
    with _pytest.raises(ValueError, match="score_function_baseline"):
        make_estimators(
            cfg=cfg, log_graph_prior=lambda soft_g: jnp.array(0.0),
            log_joint_prob=model.interventional_log_joint_prob,
            x=x, interv_mask=jnp.zeros_like(x, dtype=jnp.int32),
        )


def test_forced_pallas_sampler_respects_vmem_cap():
    """Explicit use_pallas=True past the VMEM cap raises a descriptive error
    instead of a Mosaic OOM (ADVICE r2)."""
    import pytest as _pytest

    from dibs_tpu.ops.soft_graphs import (
        _MAX_SAMPLER_D,
        sample_hard_graphs,
        sample_soft_graphs,
    )

    d = _MAX_SAMPLER_D + 8
    scores = jnp.zeros((1, d, d))
    with _pytest.raises(ValueError, match="VMEM"):
        sample_soft_graphs(scores, random.PRNGKey(0), 1.0, 1.0, 2,
                           use_pallas=True)
    with _pytest.raises(ValueError, match="VMEM"):
        sample_hard_graphs(scores, random.PRNGKey(0), 1.0, 2, use_pallas=True)


def test_score_baseline_reference_parity_and_overflow():
    """Pins the reference's EMA-baseline behavior next to our documented
    divergence (VERDICT r2 item 8c; reference dibs.py:363-389).

    The reference subtracts the (linear-EMA) baseline from the numerator
    log-weights: grad_ref = exp(-b) * E[p grad]/E[p] — the whole gradient is
    RESCALED by exp(-b). Where |log p| is moderate both forms are finite and
    the reference equals exp(-b) times the plain ratio estimate (asserted
    here); where |log p| is large (any realistic BGe/likelihood magnitude),
    exp(-b) overflows fp32 and the reference gradient becomes non-finite,
    while our signed-linear-space control variate stays finite (asserted) —
    and remains an unbiased estimate of the same gradient (oracle-tested in
    test_grad_z_score_matches_exact_enumeration).
    """
    from jax.scipy.special import logsumexp as lse

    from dibs_tpu.inference.estimators import stable_ratio_grad
    from dibs_tpu.utils.func import expand_by
    from dibs_tpu.ops.edges import grad_latent_log_prob_batch, sample_g

    model, x, interv, z, theta = _setup()
    t, alpha_linear, n_mc, c = 10.0, 0.2, 64, 0.5
    alpha = alpha_linear * t

    key = random.PRNGKey(11)
    p = edge_ops.edge_probs(z, alpha)
    g_samples = sample_g(p, key, n_mc)
    logprobs = jax.vmap(
        lambda g: model.interventional_log_joint_prob(g, theta, x, interv,
                                                      None)
    )(g_samples)
    grad_z = grad_latent_log_prob_batch(g_samples, z, alpha)

    def reference_estimate(lp, b):
        adjusted = lp - b  # dibs.py:363-367
        log_num, sign = lse(a=expand_by(adjusted, 3), b=grad_z, axis=0,
                            return_sign=True)
        return sign * jnp.exp(log_num - lse(lp, axis=0))

    # finite regime: scale log-probs to |mean| ~ 10 so exp(-b) stays
    # representable (the identity is algebraic — any (logprobs, grad_z)
    # pair witnesses it)
    logprobs_small = logprobs * (10.0 / jnp.abs(logprobs.mean()))
    plain = stable_ratio_grad(logprobs_small, logprobs_small, grad_z)
    b = c * logprobs_small.mean() + (1 - c) * 0.0  # reference linear EMA
    ref = reference_estimate(logprobs_small, b)
    assert jnp.isfinite(ref).all()
    assert jnp.allclose(ref, jnp.exp(-b) * plain, rtol=1e-4), (
        "reference baseline form is exactly an exp(-b) rescaling"
    )

    # realistic-magnitude regime (|log p| a few hundred, e.g. any joint
    # likelihood at N=100): the reference's exp(-b) overflows fp32; our
    # control variate stays finite
    logprobs_big = logprobs
    b_big = c * logprobs_big.mean()
    ref_big = reference_estimate(logprobs_big, b_big)
    assert not jnp.isfinite(ref_big).all(), (
        "expected the reference form to overflow at this magnitude"
    )
    m = jnp.maximum(logprobs_big, b_big)
    log_w = m + jnp.log(jnp.abs(jnp.exp(logprobs_big - m)
                                - jnp.exp(b_big - m)))
    sign_w = jnp.sign(logprobs_big - b_big)
    ours_big = stable_ratio_grad(
        log_w, logprobs_big, sign_w[:, None, None, None] * grad_z
    )
    assert jnp.isfinite(ours_big).all()


def test_acyclicity_constraint_mean_matches_direct_autodiff():
    """'mean' mode (beyond-reference): the prior score must equal the direct
    autodiff of the deterministic mean-field penalty,
    ``-beta(t) ∇h(edge_probs(z)) - z/std^2`` under a flat graph prior —
    no MC machinery involved."""
    model, x, interv, z, theta = _setup()
    cfg = EstimatorConfig(alpha_linear=0.2, beta_linear=1.5,
                          acyclicity_constraint="mean")
    est = make_estimators(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    std, t = 0.7, 3.0
    out = est.eltwise_grad_latent_prior(
        z[None], random.split(random.PRNGKey(8), 1), t, std
    )

    from dibs_tpu.ops.acyclic import acyclic_constr

    def direct(z_):
        return acyclic_constr(edge_ops.edge_probs(z_, cfg.alpha(t)), D,
                              jax.lax.Precision.DEFAULT)

    expected = -cfg.beta(t) * jax.grad(direct)(z) - z / std**2
    assert jnp.allclose(out[0], expected, atol=1e-5)


def test_acyclicity_constraint_mean_zero_on_hard_dag():
    """A particle whose edge probs are saturated on a DAG gets (near-)zero
    constraint gradient in 'mean' mode — h and its gradient vanish on
    strictly-triangular soft graphs."""
    model, x, interv, z, theta = _setup()
    # u_i = 10 e_i, v_j[i] = +-10 so s_ij = u_i . v_j = +100 iff i < j:
    # a saturated upper-triangular (hard DAG) soft graph
    u = 10.0 * jnp.eye(D)
    v = 10.0 * jnp.where(jnp.arange(D)[None, :] < jnp.arange(D)[:, None],
                         1.0, -1.0)
    z_dag = jnp.stack([u, v], axis=-1)
    cfg = EstimatorConfig(alpha_linear=1.0, beta_linear=1.0,
                          acyclicity_constraint="mean")
    est = make_estimators(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    std, t = 1.0, 100.0
    out = est.eltwise_grad_latent_prior(
        z_dag[None], random.split(random.PRNGKey(8), 1), t, std
    )
    constraint_part = out[0] + z_dag / std**2
    assert jnp.abs(constraint_part).max() < 1e-4


def test_acyclicity_constraint_bad_value_raises():
    model, x, interv, z, theta = _setup()
    cfg = EstimatorConfig(acyclicity_constraint="bogus")
    est = make_estimators(
        cfg=cfg,
        log_graph_prior=lambda soft_g: jnp.array(0.0),
        log_joint_prob=model.interventional_log_joint_prob,
        x=x,
        interv_mask=interv,
    )
    with pytest.raises(ValueError):
        est.eltwise_grad_latent_prior(
            z[None], random.split(random.PRNGKey(8), 1), 3.0, 1.0
        )
