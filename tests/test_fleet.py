"""Fleet inference: vmapped multi-dataset runs and their mesh sharding."""
import jax
import jax.numpy as jnp
import pytest
from jax import random

from dibs_tpu.fleet import fleet_sample
from dibs_tpu.inference import JointDiBS, MarginalDiBS
from dibs_tpu.models import BGe
from dibs_tpu.target import (
    make_linear_gaussian_equivalent_model,
    make_linear_gaussian_model,
)


def _make_datasets(n_b, n_vars=6, n_obs=20):
    xs, data0, gm, lm = [], None, None, None
    for b in range(n_b):
        data, gm, lm = make_linear_gaussian_model(
            key=random.PRNGKey(b), n_vars=n_vars, graph_prior_str="er",
            n_observations=n_obs, n_ho_observations=5,
        )
        xs.append(data.x)
        data0 = data0 or data
    return jnp.stack(xs), data0, gm, lm


def test_fleet_matches_per_dataset_runs():
    """The vmapped fleet must equal B independent engine runs given the
    same per-dataset keys (dataset independence is exact, not
    statistical)."""
    n_b, n_particles, steps = 3, 4, 6
    xs, data0, gm, lm = _make_datasets(n_b)
    dibs = JointDiBS(x=data0.x, graph_model=gm, likelihood_model=lm,
                     n_grad_mc_samples=4, n_acyclicity_mc_samples=2)

    key = random.PRNGKey(7)
    gs, thetas = fleet_sample(dibs, xs=xs, key=key,
                              n_particles=n_particles, steps=steps)
    assert gs.shape == (n_b, n_particles, 6, 6)
    assert jnp.isfinite(thetas).all()

    keys = random.split(key, n_b)
    for b in range(n_b):
        dibs_b = JointDiBS(x=xs[b], graph_model=gm, likelihood_model=lm,
                           n_grad_mc_samples=4, n_acyclicity_mc_samples=2)
        # mirror fleet_sample's key use: keys[b] goes straight to init_state
        st = dibs_b.init_state(key=keys[b], n_particles=n_particles)
        step = jax.jit(dibs_b._make_step(dibs_b._resolve_latent_std(
            st.z.shape[2])))
        for _ in range(steps):
            st = step(st, dibs_b.x, dibs_b.interv_mask)
        g_b = dibs_b.particle_to_g_lim(st.z)
        assert jnp.allclose(gs[b], g_b), f"dataset {b} graphs diverged"
        assert jnp.allclose(thetas[b], st.theta, atol=1e-5), (
            f"dataset {b} thetas diverged"
        )


def test_fleet_marginal_engine():
    n_b, n_particles = 2, 3
    xs = []
    data0 = gm = None
    for b in range(n_b):
        data, gm, _ = make_linear_gaussian_equivalent_model(
            key=random.PRNGKey(b), n_vars=8, graph_prior_str="er",
            n_observations=20, n_ho_observations=5,
        )
        xs.append(data.x)
        data0 = data0 or data
    xs = jnp.stack(xs)
    dibs = MarginalDiBS(x=data0.x, graph_model=gm,
                        likelihood_model=BGe(n_vars=8),
                        n_grad_mc_samples=4, n_acyclicity_mc_samples=2)
    gs = fleet_sample(dibs, xs=xs, key=random.PRNGKey(1),
                      n_particles=n_particles, steps=4)
    assert gs.shape == (n_b, n_particles, 8, 8)


def test_fleet_mesh_sharded_bitwise_equal():
    """Dataset sharding over the (virtual) mesh is embarrassingly parallel
    — the sharded fleet must be bitwise equal to the unsharded one."""
    if jax.device_count() < 2:
        pytest.skip("needs the virtual multi-device mesh")
    n_b = jax.device_count()
    xs, data0, gm, lm = _make_datasets(n_b)
    dibs = JointDiBS(x=data0.x, graph_model=gm, likelihood_model=lm,
                     n_grad_mc_samples=4, n_acyclicity_mc_samples=2)
    key = random.PRNGKey(3)
    gs_a, th_a = fleet_sample(dibs, xs=xs, key=key, n_particles=4, steps=5)
    mesh = jax.make_mesh((n_b,), ("datasets",))
    gs_b, th_b = fleet_sample(dibs, xs=xs, key=key, n_particles=4, steps=5,
                              mesh=mesh)
    assert jnp.array_equal(gs_a, gs_b)
    for a, b in zip(jax.tree_util.tree_leaves(th_a),
                    jax.tree_util.tree_leaves(th_b)):
        assert jnp.array_equal(a, b)


def test_fleet_rejects_bad_shapes_and_particle_sharding():
    xs, data0, gm, lm = _make_datasets(2)
    dibs = JointDiBS(x=data0.x, graph_model=gm, likelihood_model=lm)
    with pytest.raises(ValueError, match=r"\[B, N, d\]"):
        fleet_sample(dibs, xs=xs[0], key=random.PRNGKey(0),
                     n_particles=2, steps=1)
    with pytest.raises(ValueError, match="interv_masks"):
        fleet_sample(dibs, xs=xs, key=random.PRNGKey(0), n_particles=2,
                     steps=1, interv_masks=jnp.zeros((1, 2, 3), jnp.int32))
