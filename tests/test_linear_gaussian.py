import jax.numpy as jnp
import numpy as onp
import pytest
from jax import random
from scipy.stats import norm as scipy_norm

from dibs_tpu.models.graph import ErdosReniDAGDistribution
from dibs_tpu.models.linear_gaussian import LinearGaussian
from dibs_tpu.native import graph as native_graph


def _setup(seed, d=6, n=25):
    key = random.PRNGKey(seed)
    er = ErdosReniDAGDistribution(d, n_edges_per_node=1)
    key, k1, k2 = random.split(key, 3)
    g = er.sample_G(k1)
    model = LinearGaussian(n_vars=d)
    theta = model.sample_parameters(key=k2, n_vars=d)
    return key, g, model, theta


def test_sample_parameters_min_edge():
    model = LinearGaussian(n_vars=5, min_edge=0.5)
    theta = model.sample_parameters(key=random.PRNGKey(0), n_vars=5)
    assert theta.shape == (5, 5)
    assert jnp.all(jnp.abs(theta) >= 0.5)
    # batched shapes drop zero dims
    assert model.sample_parameters(
        key=random.PRNGKey(0), n_vars=5, n_particles=3
    ).shape == (3, 5, 5)
    assert model.sample_parameters(
        key=random.PRNGKey(0), n_vars=5, n_particles=3, batch_size=2
    ).shape == (2, 3, 5, 5)


@pytest.mark.parametrize("seed", [0, 1])
def test_sample_obs_matches_toposort_oracle(seed):
    """The d-step fixed-point sampler must equal explicit ancestral sampling."""
    key, g, model, theta = _setup(seed)
    key, subk = random.split(key)
    x = model.sample_obs(key=subk, n_samples=10, g=g, theta=theta)

    # oracle: regenerate the same noise, walk the toposort explicitly
    # (sample_obs consumes its key exactly once, for the noise matrix)
    z = jnp.sqrt(model.obs_noise) * random.normal(subk, shape=(10, 6))
    order = native_graph.topological_sort(onp.asarray(g))
    x_ref = onp.zeros((10, 6))
    g_np, th_np = onp.asarray(g), onp.asarray(theta)
    for j in order:
        parents = onp.flatnonzero(g_np[:, j])
        mean = x_ref[:, parents] @ th_np[parents, j] if len(parents) else 0.0
        x_ref[:, j] = mean + onp.asarray(z)[:, j]
    assert onp.allclose(onp.asarray(x), x_ref, atol=1e-4)


def test_sample_obs_interventions_clamped():
    key, g, model, theta = _setup(2)
    x = model.sample_obs(
        key=key, n_samples=8, g=g, theta=theta, interv={1: 2.5, 3: -1.0}
    )
    assert jnp.all(x[:, 1] == 2.5)
    assert jnp.all(x[:, 3] == -1.0)


def test_log_likelihood_matches_scipy():
    key, g, model, theta = _setup(4)
    key, subk = random.split(key)
    x = model.sample_obs(key=subk, n_samples=12, g=g, theta=theta)
    interv = jnp.zeros_like(x, dtype=jnp.int32)
    ll = model.log_likelihood(x=x, theta=theta, g=g, interv_targets=interv)

    means = onp.asarray(x) @ (onp.asarray(g) * onp.asarray(theta))
    ref = scipy_norm.logpdf(
        onp.asarray(x), loc=means, scale=onp.sqrt(model.obs_noise)
    ).sum()
    assert abs(float(ll) - ref) < 1e-2


def test_log_likelihood_interv_masking():
    key, g, model, theta = _setup(5)
    key, subk = random.split(key)
    x = model.sample_obs(key=subk, n_samples=12, g=g, theta=theta)
    interv = onp.zeros(x.shape, dtype=onp.int32)
    interv[:, 2] = 1
    ll_masked = model.log_likelihood(
        x=x, theta=theta, g=g, interv_targets=jnp.array(interv)
    )
    # manual: drop column 2's contributions entirely
    means = onp.asarray(x) @ (onp.asarray(g) * onp.asarray(theta))
    logpdf = scipy_norm.logpdf(onp.asarray(x), loc=means, scale=onp.sqrt(0.1))
    logpdf[:, 2] = 0.0
    assert abs(float(ll_masked) - logpdf.sum()) < 1e-2


def test_log_prob_parameters_edge_masked():
    model = LinearGaussian(n_vars=3, mean_edge=0.0, sig_edge=1.0)
    theta = jnp.ones((3, 3))
    g = jnp.zeros((3, 3)).at[0, 1].set(1)
    lp = model.log_prob_parameters(theta=theta, g=g)
    expected = scipy_norm.logpdf(1.0, 0.0, 1.0)
    assert abs(float(lp) - expected) < 1e-4  # fp32 logpdf
