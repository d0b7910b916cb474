"""Interventional inference (BASELINE.md config 4 shape, small)."""
import jax.numpy as jnp
from jax import random

from dibs_tpu.inference import JointDiBS
from dibs_tpu.metrics import threshold_metrics
from dibs_tpu.ops.ancestral import interv_to_vectors
from dibs_tpu.target import make_linear_gaussian_model
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy; excluded from `make test-fast`


def test_joint_dibs_with_interventional_data():
    key = random.PRNGKey(0)
    key, subk = random.split(key)
    data, graph_model, lik_model = make_linear_gaussian_model(
        key=subk, n_vars=8, graph_prior_str="er", n_observations=40,
        n_ho_observations=10,
    )

    # stack observational + 3 interventional sets with per-entry masks
    xs = [data.x]
    masks = [jnp.zeros_like(data.x, dtype=jnp.int32)]
    for interv, x_int in data.x_interv[:3]:
        mask_vec, _ = interv_to_vectors(interv, data.n_vars)
        xs.append(x_int)
        masks.append(jnp.broadcast_to(mask_vec.astype(jnp.int32), x_int.shape))
    x_all = jnp.concatenate(xs, axis=0)
    interv_mask = jnp.concatenate(masks, axis=0)
    assert int(interv_mask.sum()) > 0

    dibs = JointDiBS(
        x=x_all, interv_mask=interv_mask, graph_model=graph_model,
        likelihood_model=lik_model, n_grad_mc_samples=8,
        n_acyclicity_mc_samples=4,
    )
    gs, thetas = dibs.sample(key=random.PRNGKey(1), n_particles=4, steps=150)
    assert jnp.isfinite(thetas).all()
    dist = dibs.get_mixture(gs, thetas)
    assert jnp.isfinite(dist.logp).all()
    res = threshold_metrics(dist=dist, g=data.g)
    assert 0.0 <= res["roc_auc"] <= 1.0


def test_interventional_likelihood_closures():
    """The held-out interventional likelihood closure masks clamped entries."""
    key = random.PRNGKey(2)
    key, subk = random.split(key)
    data, graph_model, lik_model = make_linear_gaussian_model(
        key=subk, n_vars=6, graph_prior_str="er", n_observations=20,
        n_ho_observations=10,
    )
    dibs = JointDiBS(
        x=data.x, graph_model=graph_model, likelihood_model=lik_model,
    )
    interv, x_int = data.x_interv[0]
    mask_vec, _ = interv_to_vectors(interv, data.n_vars)
    interv_msk = jnp.broadcast_to(
        mask_vec.astype(jnp.int32), x_int.shape
    )
    gs = jnp.tile(data.g[None], (3, 1, 1))
    thetas = jnp.tile(jnp.asarray(data.theta)[None], (3, 1, 1))

    ll_interv = dibs.eltwise_log_likelihood_interv(gs, thetas, x_int, interv_msk)
    ll_observ = dibs.eltwise_log_likelihood_observ(gs, thetas, x_int)
    assert ll_interv.shape == (3,)
    # masking out clamped entries must change the score
    assert not jnp.allclose(ll_interv, ll_observ)
