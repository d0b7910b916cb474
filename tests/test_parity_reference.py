"""Golden parity vs the ACTUAL reference implementation.

These tests import the real upstream package from /root/reference (via the
igraph shim in :mod:`parity.igraph_shim` — igraph is its only uninstallable
dependency) and compare dibs-tpu's math against it function by function:

* latent->graph maps (exact)
* acyclicity constraint + gradient (exact)
* BGe marginal likelihood, hard + soft graphs, observational + interventional
  (tolerance)
* LinearGaussian / DenseNonlinearGaussian joint probability (tolerance)
* SVGD kernel matrices and transport phi (exact given the same inputs)
* gradient-estimator ratio math given the SAME MC samples (exact): validates
  the one-vjp batched forms against the reference's per-sample loops
* score-function estimator distributionally (mean over many keys)

Reference call sites are cited per test. SVGD end-to-end metric parity lives
in tests/test_quality.py (slow-marked).
"""
import sys

import jax
import jax.numpy as jnp
import numpy as onp
import pytest
from jax import random, vmap
from jax.scipy.special import logsumexp

sys.path.insert(0, ".")
from parity.refload import load_reference, reference_available  # noqa: E402

if not reference_available():  # pragma: no cover
    pytest.skip("reference tree not mounted", allow_module_level=True)

load_reference()

from dibs.inference import MarginalDiBS as RefMarginalDiBS  # noqa: E402
from dibs.inference import JointDiBS as RefJointDiBS  # noqa: E402
from dibs.graph_utils import acyclic_constr_nograd as ref_acyclic  # noqa: E402
from dibs.kernel import (  # noqa: E402
    AdditiveFrobeniusSEKernel as RefSEKernel,
    JointAdditiveFrobeniusSEKernel as RefJointSEKernel,
)
from dibs.models import BGe as RefBGe  # noqa: E402
from dibs.models import LinearGaussian as RefLinearGaussian  # noqa: E402
from dibs.models import (  # noqa: E402
    DenseNonlinearGaussian as RefDenseNonlinearGaussian,
)
from dibs.models import ErdosReniDAGDistribution as RefER  # noqa: E402

from dibs_tpu.inference import JointDiBS, MarginalDiBS  # noqa: E402
from dibs_tpu.inference.estimators import stable_ratio_grad  # noqa: E402
from dibs_tpu.inference.transport import (  # noqa: E402
    joint_transport,
    marginal_transport,
)
from dibs_tpu.kernel import (  # noqa: E402
    AdditiveFrobeniusSEKernel,
    JointAdditiveFrobeniusSEKernel,
)
from dibs_tpu.models import (  # noqa: E402
    BGe,
    DenseNonlinearGaussian,
    ErdosReniDAGDistribution,
    LinearGaussian,
)
from dibs_tpu.ops import acyclic, edges  # noqa: E402

pytestmark = pytest.mark.heavy  # compile-heavy; excluded from `make test-fast`

D, K, P = 6, 4, 5


def _rand_data(key, d=D, n=20):
    k1, k2 = random.split(key)
    x = random.normal(k1, (n, d))
    mask = (random.uniform(k2, (n, d)) < 0.2).astype(jnp.int32)
    return x, mask


def _rand_dags(key, m, d=D):
    """Random DAGs as upper-triangular-under-permutation matrices."""
    k1, k2 = random.split(key)
    tril = (random.uniform(k1, (m, d, d)) < 0.4).astype(jnp.float32)
    tril = jnp.tril(tril, k=-1)
    perms = vmap(lambda k: random.permutation(k, d))(random.split(k2, m))
    eye = jnp.eye(d)
    pmats = eye[perms]  # [m, d, d]
    return jnp.einsum("mij,mjk,mlk->mil", pmats, tril, pmats)


@pytest.fixture(scope="module")
def ref_marginal_pair():
    """(reference MarginalDiBS, dibs-tpu MarginalDiBS) on identical data/models."""
    key = random.PRNGKey(7)
    x, mask = _rand_data(key)
    ref_graph = RefER(n_vars=D)
    ref_bge = RefBGe(n_vars=D)
    ref = RefMarginalDiBS(
        x=x, interv_mask=mask, graph_model=ref_graph, likelihood_model=ref_bge
    )
    ours = MarginalDiBS(
        x=x,
        interv_mask=mask,
        graph_model=ErdosReniDAGDistribution(n_vars=D),
        likelihood_model=BGe(n_vars=D),
    )
    return ref, ours


@pytest.fixture(scope="module")
def ref_joint_pair():
    key = random.PRNGKey(11)
    x, mask = _rand_data(key)
    ref = RefJointDiBS(
        x=x,
        interv_mask=mask,
        graph_model=RefER(n_vars=D),
        likelihood_model=RefLinearGaussian(n_vars=D),
    )
    ours = JointDiBS(
        x=x,
        interv_mask=mask,
        graph_model=ErdosReniDAGDistribution(n_vars=D),
        likelihood_model=LinearGaussian(n_vars=D),
    )
    return ref, ours


# --------------------------------------------------------------------------
# latent -> graph maps (reference dibs.py:84-247)
# --------------------------------------------------------------------------


def test_edge_maps_match_reference(ref_marginal_pair):
    ref, ours = ref_marginal_pair
    z = random.normal(random.PRNGKey(0), (P, D, K, 2))
    t = 37
    alpha = ours.cfg.alpha(t)

    onp.testing.assert_allclose(
        vmap(lambda zz: ref.edge_probs(zz, t))(z),
        edges.edge_probs(z, alpha),
        rtol=1e-6,
    )
    ref_lp, ref_lp_neg = vmap(lambda zz: ref.edge_log_probs(zz, t))(z)
    lp, lp_neg = edges.edge_log_probs(z, alpha)
    onp.testing.assert_allclose(ref_lp, lp, rtol=1e-6, atol=1e-6)
    onp.testing.assert_allclose(ref_lp_neg, lp_neg, rtol=1e-6, atol=1e-6)
    onp.testing.assert_array_equal(
        ref.particle_to_g_lim(z), edges.particle_to_g_lim(z)
    )

    eps = random.logistic(random.PRNGKey(1), (D, D))
    onp.testing.assert_allclose(
        vmap(lambda zz: ref.particle_to_soft_graph(zz, eps, t))(z),
        vmap(lambda zz: edges.particle_to_soft_graph(zz, eps, alpha, ours.cfg.tau))(z),
        rtol=1e-6,
        atol=1e-7,
    )
    onp.testing.assert_array_equal(
        vmap(lambda zz: ref.particle_to_hard_graph(zz, eps, t))(z),
        vmap(lambda zz: edges.particle_to_hard_graph(zz, eps, alpha))(z),
    )


def test_latent_log_prob_and_grad_match_reference(ref_marginal_pair):
    ref, ours = ref_marginal_pair
    z = random.normal(random.PRNGKey(2), (D, K, 2))
    gs = _rand_dags(random.PRNGKey(3), 8)
    t = 11
    alpha = ours.cfg.alpha(t)

    ref_lp = vmap(lambda g: ref.latent_log_prob(g, z, t))(gs)
    our_lp = vmap(lambda g: edges.latent_log_prob(g, z, alpha))(gs)
    onp.testing.assert_allclose(ref_lp, our_lp, rtol=1e-5)

    # reference: per-sample autodiff (dibs.py:232-247); ours: closed form
    ref_grad = ref.eltwise_grad_latent_log_prob(gs, z, t)
    our_grad = edges.grad_latent_log_prob_batch(gs, z, alpha)
    onp.testing.assert_allclose(ref_grad, our_grad, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# acyclicity constraint (reference graph_utils.py:8-30)
# --------------------------------------------------------------------------


def test_acyclicity_and_grad_match_reference():
    soft = random.uniform(random.PRNGKey(4), (9, D, D))
    ref_h = vmap(lambda g: ref_acyclic(g, D))(soft)
    our_h = acyclic.elwise_acyclic_constr(soft, D)
    onp.testing.assert_allclose(ref_h, our_h, rtol=1e-5)

    ref_grad = vmap(jax.grad(lambda g: ref_acyclic(g, D)))(soft)
    our_grad = vmap(jax.grad(lambda g: acyclic.acyclic_constr(g, D)))(soft)
    onp.testing.assert_allclose(ref_grad, our_grad, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# models (reference models/linearGaussian.py, nonlinearGaussian.py, graph.py)
# --------------------------------------------------------------------------


def test_bge_matches_reference(ref_marginal_pair):
    ref, ours = ref_marginal_pair
    x, mask = ref.x, ref.interv_mask
    gs_hard = _rand_dags(random.PRNGKey(5), 12)
    gs_soft = random.uniform(random.PRNGKey(6), (6, D, D)) * (1 - jnp.eye(D))

    for gs in (gs_hard, gs_soft):
        ref_scores = vmap(
            lambda g: ref.log_joint_prob(g, None, x, mask, None)
        )(gs)
        our_scores = vmap(
            lambda g: ours.log_joint_prob(g, None, x, mask, None)
        )(gs)
        onp.testing.assert_allclose(ref_scores, our_scores, rtol=5e-5, atol=5e-5)

    # gradients through the soft relaxation (the reparam-through-BGe path)
    ref_g = vmap(jax.grad(lambda g: ref.log_joint_prob(g, None, x, mask, None)))(
        gs_soft
    )
    our_g = vmap(jax.grad(lambda g: ours.log_joint_prob(g, None, x, mask, None)))(
        gs_soft
    )
    onp.testing.assert_allclose(ref_g, our_g, rtol=1e-3, atol=1e-4)


def test_linear_gaussian_matches_reference(ref_joint_pair):
    ref, ours = ref_joint_pair
    x, mask = ref.x, ref.interv_mask
    gs = _rand_dags(random.PRNGKey(8), 10)
    theta = random.normal(random.PRNGKey(9), (10, D, D))

    ref_scores = vmap(
        lambda g, th: ref.log_joint_prob(g, th, x, mask, None)
    )(gs, theta)
    our_scores = vmap(
        lambda g, th: ours.log_joint_prob(g, th, x, mask, None)
    )(gs, theta)
    onp.testing.assert_allclose(ref_scores, our_scores, rtol=1e-5)

    ref_gt = vmap(
        jax.grad(lambda th, g: ref.log_joint_prob(g, th, x, mask, None)),
        (0, 0),
    )(theta, gs)
    our_gt = vmap(
        jax.grad(lambda th, g: ours.log_joint_prob(g, th, x, mask, None)),
        (0, 0),
    )(theta, gs)
    onp.testing.assert_allclose(ref_gt, our_gt, rtol=1e-4, atol=1e-5)


def _ref_theta_to_ours(ref_theta):
    """stax params (activation layers contribute empty tuples) -> our stack."""
    return [layer for layer in ref_theta if len(layer) > 0]


def test_nonlinear_gaussian_matches_reference():
    key = random.PRNGKey(10)
    x, mask = _rand_data(key, n=15)
    hidden = (5,)
    ref_model = RefDenseNonlinearGaussian(
        n_vars=D, hidden_layers=hidden, obs_noise=0.1, sig_param=1.0
    )
    our_model = DenseNonlinearGaussian(
        n_vars=D, hidden_layers=hidden, obs_noise=0.1, sig_param=1.0
    )

    ref_theta = ref_model.sample_parameters(key=random.PRNGKey(12), n_vars=D)
    our_theta = _ref_theta_to_ours(ref_theta)
    # same layout: list of (W [d, in, out], b [d, out]) per Dense layer
    assert jax.tree_util.tree_structure(
        our_theta
    ) == jax.tree_util.tree_structure(
        our_model.sample_parameters(key=random.PRNGKey(0), n_vars=D)
    )

    gs_hard = _rand_dags(random.PRNGKey(13), 4)
    gs_soft = random.uniform(random.PRNGKey(14), (4, D, D)) * (1 - jnp.eye(D))
    for gs in (gs_hard, gs_soft):
        ref_scores = vmap(
            lambda g: ref_model.interventional_log_joint_prob(g, ref_theta, x, mask, None)
        )(gs)
        our_scores = vmap(
            lambda g: our_model.interventional_log_joint_prob(g, our_theta, x, mask, None)
        )(gs)
        onp.testing.assert_allclose(ref_scores, our_scores, rtol=1e-4, atol=1e-4)


def test_er_graph_prior_matches_reference():
    ref_er = RefER(n_vars=D)
    our_er = ErdosReniDAGDistribution(n_vars=D)
    soft = random.uniform(random.PRNGKey(15), (7, D, D))
    onp.testing.assert_allclose(
        vmap(lambda g: ref_er.unnormalized_log_prob_soft(soft_g=g))(soft),
        vmap(lambda g: our_er.unnormalized_log_prob_soft(soft_g=g))(soft),
        rtol=1e-5,
    )


# --------------------------------------------------------------------------
# kernels + transport (reference kernel.py, svgd.py:150-224, 518-660)
# --------------------------------------------------------------------------


def test_kernel_matrices_match_reference():
    z = random.normal(random.PRNGKey(16), (P, D, K, 2))
    ref_k = RefSEKernel(h=5.0)
    our_k = AdditiveFrobeniusSEKernel(h=5.0)
    ref_mat = vmap(
        vmap(lambda a, b: ref_k.eval(x=a, y=b), (None, 0)), (0, None)
    )(z, z)
    onp.testing.assert_allclose(ref_mat, our_k.matrix(z, z), rtol=1e-5)

    theta = random.normal(random.PRNGKey(17), (P, D, D))
    ref_jk = RefJointSEKernel()
    our_jk = JointAdditiveFrobeniusSEKernel()
    ref_jmat = vmap(
        vmap(
            lambda az, at, bz, bt: ref_jk.eval(
                x_latent=az, x_theta=at, y_latent=bz, y_theta=bt
            ),
            (None, None, 0, 0),
        ),
        (0, 0, None, None),
    )(z, theta, z, theta)
    onp.testing.assert_allclose(
        ref_jmat, our_jk.matrix(z, theta, z, theta), rtol=1e-5
    )


def test_marginal_transport_matches_reference(ref_marginal_pair):
    ref, ours = ref_marginal_pair
    z = random.normal(random.PRNGKey(18), (P, D, K, 2))
    dz = random.normal(random.PRNGKey(19), (P, D, K, 2))
    kxx = ref._f_kernel_mat(z, z)
    ref_phi = ref._parallel_update_z(z, kxx, z, dz)
    our_phi = marginal_transport(ours.kernel, z, dz)
    onp.testing.assert_allclose(ref_phi, our_phi, rtol=1e-4, atol=1e-6)


def test_joint_transport_matches_reference(ref_joint_pair):
    ref, ours = ref_joint_pair
    z = random.normal(random.PRNGKey(20), (P, D, K, 2))
    theta = random.normal(random.PRNGKey(21), (P, D, D))
    dz = random.normal(random.PRNGKey(22), (P, D, K, 2))
    dtheta = random.normal(random.PRNGKey(23), (P, D, D))

    kxx = ref._f_kernel_mat(z, theta, z, theta)
    ref_phi_z = ref._parallel_update_z(z, theta, kxx, z, theta, dz)
    ref_phi_t = ref._parallel_update_theta(z, theta, kxx, z, theta, dtheta)
    our_phi_z, our_phi_t = joint_transport(ours.kernel, z, theta, dz, dtheta)
    onp.testing.assert_allclose(ref_phi_z, our_phi_z, rtol=1e-4, atol=1e-6)
    onp.testing.assert_allclose(ref_phi_t, our_phi_t, rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------------
# estimator ratio math, given the SAME MC samples (exact)
# --------------------------------------------------------------------------


def test_score_ratio_matches_reference_given_same_samples(ref_marginal_pair):
    """REINFORCE ratio (dibs.py:325-391, zero baseline): feed the reference
    fixed graph samples by stubbing its `sample_g`, compare against our
    stable_ratio_grad + closed-form REINFORCE direction on the same samples."""
    ref, ours = ref_marginal_pair
    z = random.normal(random.PRNGKey(24), (D, K, 2)) * 0.7
    t = 21
    alpha = ours.cfg.alpha(t)
    gs = _rand_dags(random.PRNGKey(25), 16)

    ref.sample_g = lambda p, subk, n: gs  # instance-level stub
    old_m = ref.n_grad_mc_samples
    ref.n_grad_mc_samples = gs.shape[0]
    try:
        ref_grad, _ = ref.grad_z_likelihood_score_function(
            z, None, jnp.zeros(1), t, random.PRNGKey(26)
        )
    finally:
        del ref.sample_g
        ref.n_grad_mc_samples = old_m

    logprobs = vmap(
        lambda g: ours.log_joint_prob(g, None, ours.x, ours.interv_mask, None)
    )(gs)
    grad_z = edges.grad_latent_log_prob_batch(gs, z, alpha)
    our_grad = stable_ratio_grad(logprobs, logprobs, grad_z)
    onp.testing.assert_allclose(ref_grad, our_grad, rtol=1e-4, atol=1e-5)


def test_score_baseline_finite_regime_matches_reference(ref_marginal_pair):
    """Reference EMA baseline in its finite regime (dibs.py:363-391):
    with ``score_function_baseline = c > 0`` the reference (a) rescales the
    WHOLE zero-baseline ratio gradient by ``exp(-b)`` — the log-space
    subtraction enters only the numerator logsumexp — and (b) updates the
    baseline by a linear-space EMA ``c * mean(logprobs) + (1-c) * b``.

    Pinned next to dibs-tpu's documented divergence (estimators.py
    ``_grad_z_score_from_logprobs``): the third block shows the exp(-b)
    factor overflowing at a realistically-sized |log p| baseline (the EMA
    tracks mean log-joint ≈ -1e3 at d=20/N=100), which is WHY dibs-tpu uses
    a signed linear-space control variate instead (its finiteness at every
    scale is covered by test_estimators.test_score_function_baseline_updates).
    """
    ref, ours = ref_marginal_pair
    z = random.normal(random.PRNGKey(40), (D, K, 2)) * 0.7
    t = 21
    gs = _rand_dags(random.PRNGKey(41), 16)

    ref.sample_g = lambda p, subk, n: gs  # instance-level stub
    old_m = ref.n_grad_mc_samples
    old_c = ref.score_function_baseline
    c = 0.33
    ref.n_grad_mc_samples = gs.shape[0]
    ref.score_function_baseline = c
    try:
        key = random.PRNGKey(42)
        grad_b0, new_b0 = ref.grad_z_likelihood_score_function(
            z, None, jnp.zeros(1), t, key
        )
        b = jnp.array([1.7])
        grad_b, new_b = ref.grad_z_likelihood_score_function(z, None, b, t, key)
        # (a) exp(-b) rescaling of the zero-baseline gradient
        onp.testing.assert_allclose(
            grad_b, jnp.exp(-b[0]) * grad_b0, rtol=1e-4, atol=1e-6
        )
        # (b) linear-space EMA: new_b - (1-c) b == c * mean(logprobs),
        # identical across calls because the update ignores the adjustment
        onp.testing.assert_allclose(
            new_b - (1.0 - c) * b, new_b0, rtol=1e-5, atol=1e-6
        )
        # (c) the overflow that motivates the divergence: once the EMA has
        # tracked a realistic mean log-joint, exp(-b) is inf in f32
        grad_real, _ = ref.grad_z_likelihood_score_function(
            z, None, jnp.array([-1.0e3]), t, key
        )
        assert not bool(jnp.isfinite(grad_real).all())
    finally:
        del ref.sample_g
        ref.n_grad_mc_samples = old_m
        ref.score_function_baseline = old_c


def test_reparam_ratio_matches_reference_given_same_eps(ref_joint_pair):
    """Gumbel reparam ratio (dibs.py:395-459): same Logistic noise on both
    sides; validates the one-vjp softmax-cotangent form against the
    reference's M-backward-passes form."""
    ref, ours = ref_joint_pair
    z = random.normal(random.PRNGKey(27), (D, K, 2)) * 0.7
    theta = random.normal(random.PRNGKey(28), (D, D))
    t, m = 13, 12
    alpha, tau = ours.cfg.alpha(t), ours.cfg.tau
    eps = random.logistic(random.PRNGKey(29), (m, D, D))

    # reference per-sample forward+backward
    lp_ref = vmap(ref.log_joint_prob_soft, (None, None, 0, None, None))(
        z, theta, eps, t, random.PRNGKey(0)
    )
    grads_ref = vmap(
        jax.grad(ref.log_joint_prob_soft, 0), (None, None, 0, None, None)
    )(z, theta, eps, t, random.PRNGKey(0))
    lse, sign = logsumexp(a=lp_ref[:, None, None, None], b=grads_ref, axis=0,
                          return_sign=True)
    ref_grad = sign * jnp.exp(lse - logsumexp(lp_ref, axis=0))

    # ours: one vjp with softmax weights as cotangents
    def batched_logprobs(zz):
        soft = vmap(
            lambda e: edges.particle_to_soft_graph(zz, e, alpha, tau)
        )(eps)
        return vmap(
            lambda g: ours.log_joint_prob(g, theta, ours.x, ours.interv_mask, None)
        )(soft)

    lp_ours, vjp_fn = jax.vjp(batched_logprobs, z)
    onp.testing.assert_allclose(lp_ref, lp_ours, rtol=1e-5)
    weights = jnp.exp(lp_ours - logsumexp(lp_ours))
    (our_grad,) = vjp_fn(weights)
    onp.testing.assert_allclose(ref_grad, our_grad, rtol=1e-4, atol=1e-5)


def test_theta_ratio_matches_reference_given_same_samples(ref_joint_pair):
    """Θ-likelihood pytree ratio (dibs.py:467-551) on fixed graph samples."""
    ref, ours = ref_joint_pair
    z = random.normal(random.PRNGKey(30), (D, K, 2)) * 0.7
    theta = random.normal(random.PRNGKey(31), (D, D))
    t = 17
    gs = _rand_dags(random.PRNGKey(32), 16)

    ref.sample_g = lambda p, subk, n: gs
    old_m = ref.n_grad_mc_samples
    ref.n_grad_mc_samples = gs.shape[0]
    try:
        ref_grad = ref.grad_theta_likelihood(z, theta, t, random.PRNGKey(33))
    finally:
        del ref.sample_g
        ref.n_grad_mc_samples = old_m

    def batched_logprobs(th):
        return vmap(
            lambda g: ours.log_joint_prob(g, th, ours.x, ours.interv_mask, None)
        )(gs)

    lp, vjp_fn = jax.vjp(batched_logprobs, theta)
    weights = jnp.exp(lp - logsumexp(lp))
    (our_grad,) = vjp_fn(weights)
    onp.testing.assert_allclose(ref_grad, our_grad, rtol=1e-4, atol=1e-5)


def test_constraint_grad_matches_reference_given_same_eps(ref_marginal_pair):
    """Acyclicity-penalty gradient (dibs.py:576-601) with shared noise."""
    ref, ours = ref_marginal_pair
    z = random.normal(random.PRNGKey(34), (D, K, 2)) * 0.7
    t, n_mc = 9, 8
    alpha, tau = ours.cfg.alpha(t), ours.cfg.tau
    eps = random.logistic(random.PRNGKey(35), (n_mc, D, D))

    ref_grad = vmap(jax.grad(ref.constraint_gumbel, 0), (None, 0, None))(
        z, eps, t
    ).mean(0)

    def mean_h(zz):
        soft = vmap(lambda e: edges.particle_to_soft_graph(zz, e, alpha, tau))(eps)
        return vmap(lambda g: acyclic.acyclic_constr(g, D))(soft).mean()

    our_grad = jax.grad(mean_h)(z)
    onp.testing.assert_allclose(ref_grad, our_grad, rtol=1e-4, atol=1e-5)


def test_prior_score_matches_reference_given_same_eps(ref_marginal_pair):
    """Full Z-prior score (dibs.py:626-658): -β(t)E[∇h] - Z/σ² + ∇log f(Z).
    The E[∇h] term uses per-particle noise; compare the deterministic parts
    exactly and the full combination with shared eps."""
    ref, ours = ref_marginal_pair
    z = random.normal(random.PRNGKey(36), (D, K, 2)) * 0.7
    t = 5

    ref_soft_prior = jax.grad(lambda zz: ref.log_graph_prior_particle(zz, t))(z)
    our_soft_prior = jax.grad(
        lambda zz: ours.log_graph_prior(
            soft_g=edges.edge_probs(zz, ours.cfg.alpha(t))
        )
    )(z)
    onp.testing.assert_allclose(ref_soft_prior, our_soft_prior, rtol=1e-4,
                                atol=1e-6)


# --------------------------------------------------------------------------
# score-function estimator, distributional (native PRNG on both sides)
# --------------------------------------------------------------------------


def test_score_estimator_mean_matches_reference_distributionally():
    """Small-d statistical check: the two frameworks' REINFORCE estimators
    (each with its own PRNG schedule) agree in expectation."""
    d, k, n_keys, m = 3, 3, 48, 96
    key = random.PRNGKey(40)
    x, mask = _rand_data(key, d=d, n=12)
    ref = RefMarginalDiBS(
        x=x, interv_mask=mask, graph_model=RefER(n_vars=d),
        likelihood_model=RefBGe(n_vars=d), n_grad_mc_samples=m,
    )
    ours = MarginalDiBS(
        x=x, interv_mask=mask, graph_model=ErdosReniDAGDistribution(n_vars=d),
        likelihood_model=BGe(n_vars=d), n_grad_mc_samples=m,
    )
    z = random.normal(random.PRNGKey(41), (d, k, 2)) * 0.8
    t = 15

    keys = random.split(random.PRNGKey(42), n_keys)
    ref_fn = jax.jit(
        lambda kk: ref.grad_z_likelihood_score_function(
            z, None, jnp.zeros(1), t, kk
        )[0]
    )
    ref_mean = jnp.stack([ref_fn(kk) for kk in keys]).mean(0)

    our_fn = jax.jit(
        lambda kk: ours.est.eltwise_grad_z_likelihood(
            z[None], None, jnp.zeros(1), t, kk[None]
        )[0][0]
    )
    our_mean = jnp.stack([our_fn(kk) for kk in keys]).mean(0)

    scale = jnp.abs(ref_mean).max()
    onp.testing.assert_allclose(
        our_mean / scale, ref_mean / scale, atol=0.25
    )
