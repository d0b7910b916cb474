import jax.numpy as jnp
import numpy as onp
import pytest
from jax import random
from scipy.stats import norm as scipy_norm

from dibs_tpu.models.graph import ErdosReniDAGDistribution
from dibs_tpu.models.nonlinear_gaussian import DenseNonlinearGaussian


def _model(d=5, hidden=(4,), **kw):
    return DenseNonlinearGaussian(n_vars=d, hidden_layers=hidden, **kw)


def _manual_forward(theta, x_masked_j, act, bias):
    """Single-node MLP forward in numpy for node j (given masked input)."""
    h = onp.asarray(x_masked_j, dtype=onp.float64)
    n_layers = len(theta)
    for i, layer in enumerate(theta):
        w = onp.asarray(layer[0], dtype=onp.float64)
        h = h @ w
        if bias:
            h = h + onp.asarray(layer[1], dtype=onp.float64)
        if i < n_layers - 1:
            h = act(h)
    return h[:, 0]


def test_param_shapes():
    model = _model(d=5, hidden=(4, 3))
    theta = model.sample_parameters(key=random.PRNGKey(0), n_vars=5)
    assert len(theta) == 3
    assert theta[0][0].shape == (5, 5, 4)
    assert theta[0][1].shape == (5, 4)
    assert theta[1][0].shape == (5, 4, 3)
    assert theta[2][0].shape == (5, 3, 1)
    # with particles leading dim
    theta_p = model.sample_parameters(key=random.PRNGKey(0), n_vars=5, n_particles=7)
    assert theta_p[0][0].shape == (7, 5, 5, 4)


def test_all_node_means_matches_manual():
    d = 4
    model = _model(d=d, hidden=(3,))
    theta = model.sample_parameters(key=random.PRNGKey(1), n_vars=d)
    x = random.normal(random.PRNGKey(2), (6, d))
    g = jnp.array(ErdosReniDAGDistribution(d, 1).sample_G(random.PRNGKey(3)))
    means = model.all_node_means(theta, x, g)
    assert means.shape == (6, d)

    relu = lambda v: onp.maximum(v, 0)
    for j in range(d):
        x_msk = onp.asarray(x) * onp.asarray(g)[:, j]
        theta_j = [tuple(onp.asarray(leaf)[j] for leaf in layer) for layer in theta]
        ref = _manual_forward(theta_j, x_msk, relu, bias=True)
        assert onp.allclose(onp.asarray(means)[:, j], ref, atol=1e-4)


@pytest.mark.parametrize("bias", [True, False])
def test_log_prob_parameters_first_layer_masking(bias):
    d = 3
    model = _model(d=d, hidden=(2,), bias=bias, sig_param=1.0)
    theta = model.sample_parameters(key=random.PRNGKey(4), n_vars=d)
    g_full = jnp.ones((d, d)) * (1 - jnp.eye(d))
    g_empty = jnp.zeros((d, d))
    lp_full = model.log_prob_parameters(theta=theta, g=g_full)
    lp_empty = model.log_prob_parameters(theta=theta, g=g_empty)

    # difference must equal the first-layer weight logpdfs of off-diag entries
    w1 = onp.asarray(theta[0][0])  # [d(node), d(in), h]
    diff_ref = 0.0
    for j in range(d):
        for i in range(d):
            if i != j:
                diff_ref += scipy_norm.logpdf(w1[j, i], 0.0, 1.0).sum()
    assert abs((float(lp_full) - float(lp_empty)) - diff_ref) < 1e-3


def test_log_likelihood_matches_manual():
    d = 4
    model = _model(d=d, hidden=(3,))
    theta = model.sample_parameters(key=random.PRNGKey(5), n_vars=d)
    g = jnp.array(ErdosReniDAGDistribution(d, 1).sample_G(random.PRNGKey(6)))
    x = random.normal(random.PRNGKey(7), (8, d))
    interv = jnp.zeros_like(x, dtype=jnp.int32)
    ll = model.log_likelihood(x=x, theta=theta, g=g, interv_targets=interv)
    means = model.all_node_means(theta, x, g)
    ref = scipy_norm.logpdf(
        onp.asarray(x), loc=onp.asarray(means), scale=onp.sqrt(model.obs_noise)
    ).sum()
    assert abs(float(ll) - ref) < 1e-2


def test_sample_obs_roots_are_pure_noise():
    """Parentless nodes bypass their MLP in generation (reference convention,
    nonlinearGaussian.py:228-240)."""
    d = 4
    model = _model(d=d, hidden=(3,), obs_noise=0.1)
    theta = model.sample_parameters(key=random.PRNGKey(8), n_vars=d)
    g = jnp.zeros((d, d)).at[0, 1].set(1)  # only node 1 has a parent
    key = random.PRNGKey(9)
    x = model.sample_obs(key=key, n_samples=2000, g=g, theta=theta)
    # root nodes: mean ~ 0, var ~ obs_noise
    for j in [0, 2, 3]:
        assert abs(float(x[:, j].mean())) < 0.05
        assert abs(float(x[:, j].var()) - 0.1) < 0.03


def test_sample_obs_matches_toposort_oracle():
    """The d-step fixed-point sampler must equal an explicit toposort walk
    (with the reference's root-nodes-are-pure-noise convention)."""
    from dibs_tpu.native import graph as native_graph

    d = 5
    model = _model(d=d, hidden=(3,))
    theta = model.sample_parameters(key=random.PRNGKey(20), n_vars=d)
    g = jnp.array(ErdosReniDAGDistribution(d, 1).sample_G(random.PRNGKey(21)))
    subk = random.PRNGKey(22)
    x = model.sample_obs(key=subk, n_samples=6, g=g, theta=theta)

    # oracle: same noise (key consumed once), explicit topological order
    z = jnp.sqrt(model.obs_noise) * random.normal(subk, shape=(6, d))
    order = native_graph.topological_sort(onp.asarray(g))
    x_ref = onp.zeros((6, d), dtype=onp.float64)
    g_np = onp.asarray(g)
    for j in order:
        if g_np[:, j].sum() == 0:
            x_ref[:, j] = onp.asarray(z)[:, j]
        else:
            means = model.all_node_means(theta, jnp.asarray(x_ref, jnp.float32), g)
            x_ref[:, j] = onp.asarray(means)[:, j] + onp.asarray(z)[:, j]
    assert onp.allclose(onp.asarray(x), x_ref, atol=1e-4)


def test_sample_obs_interventions():
    d = 4
    model = _model(d=d)
    theta = model.sample_parameters(key=random.PRNGKey(10), n_vars=d)
    g = jnp.array(ErdosReniDAGDistribution(d, 1).sample_G(random.PRNGKey(11)))
    x = model.sample_obs(
        key=random.PRNGKey(12), n_samples=5, g=g, theta=theta, interv={2: 1.5}
    )
    assert jnp.all(x[:, 2] == 1.5)


def test_activations_all_work():
    for act in ["sigmoid", "tanh", "relu", "leakyrelu"]:
        model = _model(d=3, hidden=(2,), activation=act)
        theta = model.sample_parameters(key=random.PRNGKey(0), n_vars=3)
        x = random.normal(random.PRNGKey(1), (4, 3))
        g = jnp.ones((3, 3)) * (1 - jnp.eye(3))
        assert jnp.isfinite(model.all_node_means(theta, x, g)).all()
    with pytest.raises(KeyError):
        _model(activation="nope")


def test_sample_parameters_x64_parity():
    """The reference sniffs JAX_ENABLE_X64 to sample float64 parameters
    (nonlinearGaussian.py:184-185). Our sampler inherits the same behavior
    from JAX's default-dtype mechanism: under x64, `random.normal` yields
    float64 leaves with no explicit dtype plumbing."""
    import jax

    model = DenseNonlinearGaussian(n_vars=4, hidden_layers=(3,))
    theta32 = model.sample_parameters(key=random.PRNGKey(0), n_vars=4)
    for leaf in jax.tree_util.tree_leaves(theta32):
        assert leaf.dtype == jnp.float32
    with jax.enable_x64(True):
        theta64 = model.sample_parameters(key=random.PRNGKey(0), n_vars=4)
        for leaf in jax.tree_util.tree_leaves(theta64):
            assert leaf.dtype == jnp.float64
