import jax.numpy as jnp
from jax import random

from dibs_tpu.ops import edges


def _z(key, d=5, k=4, batch=()):
    return random.normal(key, (*batch, d, k, 2))


def test_edge_probs_log_probs_consistent():
    z = _z(random.PRNGKey(0))
    alpha = 1.7
    p = edges.edge_probs(z, alpha)
    log_p, log_1p = edges.edge_log_probs(z, alpha)
    off = ~jnp.eye(5, dtype=bool)
    # fp32: log(sigmoid(s)) loses precision vs log_sigmoid for saturated s
    assert jnp.allclose(jnp.log(p)[off], log_p[off], rtol=1e-3, atol=1e-4)
    assert jnp.allclose(jnp.log(1 - p)[off], log_1p[off], rtol=1e-3, atol=1e-4)
    assert jnp.all(p[jnp.eye(5, dtype=bool)] == 0)


def test_edge_ops_batched_leading_dims():
    z = _z(random.PRNGKey(1), batch=(3, 2))
    p = edges.edge_probs(z, 0.5)
    assert p.shape == (3, 2, 5, 5)
    g = edges.particle_to_g_lim(z)
    assert g.shape == (3, 2, 5, 5)
    assert g.dtype == jnp.int32


def test_soft_hard_graph_limits():
    z = _z(random.PRNGKey(2))
    eps = random.logistic(random.PRNGKey(3), (5, 5))
    alpha = 2.0
    soft_hi_tau = edges.particle_to_soft_graph(z, eps, alpha, tau=1e4)
    hard = edges.particle_to_hard_graph(z, eps, alpha)
    # at very high tau, the soft sample approaches the hard Gumbel-max sample
    off = ~jnp.eye(5, dtype=bool)
    assert jnp.allclose(soft_hi_tau[off], hard[off], atol=1e-3)
    assert jnp.all(soft_hi_tau[jnp.eye(5, dtype=bool)] == 0)


def test_sample_g_stats():
    d = 4
    p = jnp.full((d, d), 0.7) * (1 - jnp.eye(d))
    gs = edges.sample_g(p, random.PRNGKey(4), 2000)
    assert gs.shape == (2000, d, d)
    freq = gs.mean(0)
    off = ~jnp.eye(d, dtype=bool)
    assert jnp.all(jnp.abs(freq[off] - 0.7) < 0.05)
    assert jnp.all(freq[jnp.eye(d, dtype=bool)] == 0)


def test_grad_latent_log_prob_closed_form_matches_autodiff():
    """The REINFORCE direction's closed form must equal autodiff exactly."""
    import jax

    z = _z(random.PRNGKey(7), d=6, k=4)
    alpha = 1.3
    gs = edges.sample_g(edges.edge_probs(z, alpha), random.PRNGKey(8), 5)
    closed = edges.grad_latent_log_prob_batch(gs, z, alpha)
    autodiff = jax.vmap(jax.grad(edges.latent_log_prob, 1), (0, None, None))(
        gs, z, alpha
    )
    assert closed.shape == autodiff.shape == (5, 6, 4, 2)
    assert jnp.allclose(closed, autodiff, atol=1e-5), (
        jnp.abs(closed - autodiff).max()
    )


def test_latent_log_prob_matches_manual():
    z = _z(random.PRNGKey(5))
    alpha = 1.3
    g = edges.sample_g(edges.edge_probs(z, alpha), random.PRNGKey(6), 1)[0]
    lp = edges.latent_log_prob(g, z, alpha)
    p = edges.edge_probs(z, alpha)
    off = ~jnp.eye(5, dtype=bool)
    manual = jnp.sum(
        jnp.where(g[off] == 1, jnp.log(p[off]), jnp.log(1 - p[off]))
    )
    assert jnp.allclose(lp, manual, atol=1e-4)
