import jax
import jax.numpy as jnp
from jax import random

from dibs_tpu.checkpoint import load_state, save_state
from dibs_tpu.inference import JointDiBS
from dibs_tpu.target import make_linear_gaussian_model
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy; excluded from `make test-fast`


def test_checkpoint_resume_exact(tmp_path):
    data, graph_model, lik_model = make_linear_gaussian_model(
        key=random.PRNGKey(0), n_vars=6, graph_prior_str="er",
        n_observations=30, n_ho_observations=10,
    )
    mk = lambda: JointDiBS(
        x=data.x, graph_model=graph_model, likelihood_model=lik_model,
        n_grad_mc_samples=4, n_acyclicity_mc_samples=2,
    )

    # continuous 12-step run
    d1 = mk()
    _, _, state_full = d1.sample(
        key=random.PRNGKey(1), n_particles=3, steps=12, return_state=True
    )

    # 6 steps, checkpoint, restore, 6 more
    d2 = mk()
    _, _, state_half = d2.sample(
        key=random.PRNGKey(1), n_particles=3, steps=6, return_state=True
    )
    path = str(tmp_path / "ckpt")
    save_state(state_half, path)
    restored = load_state(path)
    assert int(restored.t) == 6
    _, _, state_resumed = d2.resume(restored, steps=6, return_state=True)

    assert jnp.allclose(state_full.z, state_resumed.z, atol=1e-6)
    assert jnp.allclose(state_full.theta, state_resumed.theta, atol=1e-6)
    assert int(state_resumed.t) == 12


def test_orbax_backend_roundtrip(tmp_path):
    """Orbax (pickle-free) checkpoint backend: save -> restore into a
    template state -> exact resume, for both joint and marginal states."""
    from dibs_tpu.checkpoint import load_state_orbax, save_state_orbax

    data, graph_model, lik_model = make_linear_gaussian_model(
        key=random.PRNGKey(0), n_vars=6, graph_prior_str="er",
        n_observations=30, n_ho_observations=10,
    )
    dibs = JointDiBS(
        x=data.x, graph_model=graph_model, likelihood_model=lik_model,
        n_grad_mc_samples=4, n_acyclicity_mc_samples=2,
    )
    _, _, state = dibs.sample(
        key=random.PRNGKey(1), n_particles=3, steps=4, return_state=True
    )
    path = str(tmp_path / "orbax_ckpt")
    save_state_orbax(state, path)

    template = dibs.init_state(key=random.PRNGKey(99), n_particles=3)
    restored = load_state_orbax(path, like=template)
    assert int(restored.t) == 4
    assert jnp.allclose(restored.z, state.z)
    for a, b in zip(
        jax.tree_util.tree_leaves(restored.theta),
        jax.tree_util.tree_leaves(state.theta),
    ):
        assert jnp.allclose(a, b)
    # restored state drives resume identically to the in-memory state
    _, _, s1 = dibs.resume(restored, steps=3, return_state=True)
    _, _, s2 = dibs.sample(
        key=random.PRNGKey(1), n_particles=3, steps=7, return_state=True
    )
    assert jnp.allclose(s1.z, s2.z, atol=1e-6)
