"""BGe marginal likelihood vs an independent dense float64 oracle.

The oracle extracts explicit submatrices per node (no masking tricks), which
is the textbook form of the Geiger/Heckerman score with the Kuipers-corrected
``R`` matrix — an implementation deliberately different from the framework's
masked-slogdet path.
"""
import jax.numpy as jnp
import numpy as onp
import pytest
from jax import grad, random
from scipy.special import gammaln

from dibs_tpu.models.graph import ErdosReniDAGDistribution
from dibs_tpu.models.linear_gaussian import BGe, LinearGaussian


def _oracle_bge(g, x, interv, mean_obs, alpha_mu, alpha_lambd):
    g = onp.asarray(g)
    x_full = onp.asarray(x, dtype=onp.float64)
    interv = onp.asarray(interv)
    _, d = x_full.shape
    small_t = (alpha_mu * (alpha_lambd - d - 1)) / (alpha_mu + 1)
    total = 0.0
    for j in range(d):
        rows = interv[:, j] == 0
        xj = x_full[rows]
        n = xj.shape[0]
        if n == 0:
            continue
        x_bar = xj.mean(0, keepdims=True)
        s_n = (xj - x_bar).T @ (xj - x_bar)
        r = (
            small_t * onp.eye(d)
            + s_n
            + (n * alpha_mu) / (n + alpha_mu)
            * (x_bar - mean_obs).T @ (x_bar - mean_obs)
        )
        parents = onp.flatnonzero(g[:, j])
        l = len(parents)
        log_gamma = (
            0.5 * (onp.log(alpha_mu) - onp.log(n + alpha_mu))
            + gammaln(0.5 * (n + alpha_lambd - d + l + 1))
            - gammaln(0.5 * (alpha_lambd - d + l + 1))
            - 0.5 * n * onp.log(onp.pi)
            + 0.5 * (alpha_lambd - d + 2 * l + 1) * onp.log(small_t)
        )
        sub_ii = r[onp.ix_(parents, parents)]
        logdet_ii = onp.linalg.slogdet(sub_ii)[1] if l else 0.0
        pj = onp.r_[parents, j]
        logdet_jj = onp.linalg.slogdet(r[onp.ix_(pj, pj)])[1]
        total += (
            log_gamma
            + 0.5 * (n + alpha_lambd - d + l) * logdet_ii
            - 0.5 * (n + alpha_lambd - d + l + 1) * logdet_jj
        )
    return total


def _make_data(seed, d=6, n=40):
    key = random.PRNGKey(seed)
    er = ErdosReniDAGDistribution(d, n_edges_per_node=1)
    key, k1, k2, k3 = random.split(key, 4)
    g = er.sample_G(k1)
    lin = LinearGaussian(n_vars=d)
    theta = lin.sample_parameters(key=k2, n_vars=d)
    x = lin.sample_obs(key=k3, n_samples=n, g=g, theta=theta)
    return g, x


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_bge_matches_dense_oracle(seed):
    d = 6
    g, x = _make_data(seed, d=d)
    model = BGe(n_vars=d)
    interv = jnp.zeros_like(x, dtype=jnp.int32)
    score = model.log_marginal_likelihood(g=g, x=x, interv_targets=interv)
    oracle = _oracle_bge(
        g, x, interv, onp.zeros(d), model.alpha_mu, model.alpha_lambd
    )
    assert abs(float(score) - oracle) < 1e-2 * max(1.0, abs(oracle) * 1e-3)


def test_bge_markov_equivalence_invariance():
    """The defining BGe property: equal scores within a Markov equivalence class."""
    d = 3
    _, x = _make_data(7, d=d)
    model = BGe(n_vars=d)
    interv = jnp.zeros_like(x, dtype=jnp.int32)

    def score(edges):
        g = onp.zeros((d, d), dtype=onp.int32)
        for i, j in edges:
            g[i, j] = 1
        return float(
            model.log_marginal_likelihood(g=jnp.array(g), x=x, interv_targets=interv)
        )

    chain = score([(0, 1), (1, 2)])       # 0 -> 1 -> 2
    rev_chain = score([(2, 1), (1, 0)])   # 0 <- 1 <- 2
    fork = score([(1, 0), (1, 2)])        # 0 <- 1 -> 2
    collider = score([(0, 1), (2, 1)])    # 0 -> 1 <- 2   (different MEC)

    assert abs(chain - rev_chain) < 1e-3
    assert abs(chain - fork) < 1e-3
    assert abs(chain - collider) > 1e-3


def test_bge_interventional_masking():
    """Intervened rows must be excluded from the intervened node's statistics."""
    d = 4
    g, x = _make_data(3, d=d, n=30)
    model = BGe(n_vars=d)

    # interventions on node 0 in half the rows
    interv = onp.zeros(x.shape, dtype=onp.int32)
    interv[:15, 0] = 1
    score = model.log_marginal_likelihood(
        g=g, x=x, interv_targets=jnp.array(interv)
    )
    oracle = _oracle_bge(g, x, interv, onp.zeros(d), model.alpha_mu, model.alpha_lambd)
    assert abs(float(score) - oracle) < 1e-2


def test_bge_differentiable_soft_graph():
    """Gradient w.r.t. a soft adjacency must exist and be finite (reparam path)."""
    d = 4
    _, x = _make_data(5, d=d)
    model = BGe(n_vars=d)
    interv = jnp.zeros_like(x, dtype=jnp.int32)
    soft_g = jnp.full((d, d), 0.5) * (1 - jnp.eye(d))

    def f(sg):
        return model.log_marginal_likelihood(g=sg, x=x, interv_targets=interv)

    gr = grad(f)(soft_g)
    assert jnp.isfinite(gr).all()
    assert jnp.abs(gr).sum() > 0


def test_bge_rejects_bad_alpha_lambd():
    with pytest.raises(ValueError):
        BGe(n_vars=5, alpha_lambd=5.0)
