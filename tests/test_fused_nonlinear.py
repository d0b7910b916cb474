"""Fused nonlinear kernel vs autodiff through the actual model.

With injected uniforms (``debug_noise``) the kernel is deterministic, and
its outputs must equal jax.grad of ``logsumexp_m log p(Θ, D | G_m)``:

  * w.r.t. the edge scores through the *soft* graphs (reparam Z-gradient),
  * w.r.t. Θ with the *hard* graphs as constants (Θ-gradient),

because ``grad logsumexp = softmax-weighted sum of per-sample grads`` —
exactly the self-normalized estimator the kernel accumulates with its
online softmax. Runs in interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import pytest
from jax import random
from jax.scipy.special import logsumexp

from dibs_tpu.inference.fused_nonlinear import (
    _pad_plan_nl,
    fused_nonlinear_estimators,
)
from dibs_tpu.models import DenseNonlinearGaussian

pytestmark = pytest.mark.heavy


def _setup(d, h1, n_obs, p, activation, seed=0):
    key = random.PRNGKey(seed)
    model = DenseNonlinearGaussian(
        n_vars=d, hidden_layers=(h1,), obs_noise=0.3, sig_param=1.2,
        activation=activation)
    k1, k2, k3, k4 = random.split(key, 4)
    thetas = model.sample_parameters(key=k1, n_vars=d, n_particles=p)
    x = random.normal(k2, (n_obs, d))
    interv = (random.uniform(k3, x.shape) < 0.2).astype(jnp.int32)
    zs = 0.7 * random.normal(k4, (p, d, d, 2))
    return model, thetas, x, interv, zs


def _noise_graphs(uniforms, scores_pad, d, dp, bm, m, alpha, tau):
    """Recreates the kernel's per-sample graphs from the injected uniforms."""
    offdiag = 1.0 - jnp.eye(dp)
    softs, hards = [], []
    for mm in range(m):
        grp, mloc = mm // bm, mm % bm
        u0 = uniforms[0, grp * dp:(grp + 1) * dp,
                      mloc * dp:(mloc + 1) * dp]
        u1 = uniforms[1, grp * dp:(grp + 1) * dp,
                      mloc * dp:(mloc + 1) * dp]
        eps = jnp.log(u0) - jnp.log1p(-u0)
        soft = jax.nn.sigmoid(tau * (eps + alpha * scores_pad)) * offdiag
        hard = (u1 < jax.nn.sigmoid(alpha * scores_pad)).astype(
            jnp.float32) * offdiag
        softs.append(soft[:d, :d])
        hards.append(hard[:d, :d])
    return jnp.stack(softs), jnp.stack(hards)


@pytest.mark.parametrize("activation,tau,d,h1", [
    ("relu", 1.0, 6, 3),
    ("tanh", 0.7, 6, 3),
    ("sigmoid", 1.0, 10, 5),   # dp == d+pad exercise: dp=16
])
def test_fused_nonlinear_matches_autodiff(activation, tau, d, h1):
    from dibs_tpu.ops.edges import edge_scores

    n_obs, p, m, alpha = 12, 2, 20, 1.7
    model, thetas, x, interv, zs = _setup(d, h1, n_obs, p, activation)
    dp, bm, m_total = _pad_plan_nl(d, m)
    n_groups = m_total // bm
    wd = bm * dp

    uniforms = random.uniform(
        random.PRNGKey(42), (p, 2, n_groups * dp, wd),
        minval=1e-4, maxval=1.0 - 1e-4)

    dscores, dtheta = fused_nonlinear_estimators(
        zs=zs, thetas=thetas, x=x, interv_mask=interv,
        key=random.PRNGKey(7), alpha=alpha, tau=tau, n_samples=m,
        model=model, interpret=True, debug_noise=uniforms)

    scores = edge_scores(zs)
    for pi in range(p):
        s_pad = jnp.zeros((dp, dp)).at[:d, :d].set(scores[pi])
        theta_p = jax.tree_util.tree_map(lambda a: a[pi], thetas)

        def lp(g, th):
            return model.interventional_log_joint_prob(g, th, x, interv,
                                                       None)

        # --- Z-gradient: grad of lse through the soft graphs ---
        def f_z(s_d):
            sp = jnp.zeros((dp, dp)).at[:d, :d].set(s_d)
            softs, _ = _noise_graphs(uniforms[pi], sp, d, dp, bm, m,
                                     alpha, tau)
            return logsumexp(jax.vmap(lambda g: lp(g, theta_p))(softs))

        want_ds = jax.grad(f_z)(scores[pi])
        got_ds = dscores[pi]
        assert jnp.allclose(got_ds, want_ds, rtol=2e-3, atol=2e-4), (
            activation, float(jnp.abs(got_ds - want_ds).max()))

        # --- Θ-gradient: grad of lse with hard graphs as constants ---
        _, hards = _noise_graphs(uniforms[pi], s_pad, d, dp, bm, m,
                                 alpha, tau)

        def f_t(th):
            return logsumexp(jax.vmap(lambda g: lp(g, th))(hards))

        want_dt = jax.grad(f_t)(theta_p)
        got_dt = jax.tree_util.tree_map(lambda a: a[pi], dtheta)
        for got, want in zip(jax.tree_util.tree_leaves(got_dt),
                             jax.tree_util.tree_leaves(want_dt)):
            assert jnp.allclose(got, want, rtol=2e-3, atol=2e-4), (
                activation, got.shape, float(jnp.abs(got - want).max()))
