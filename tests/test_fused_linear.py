"""Fused linear-Gaussian estimator path — CPU-checkable pieces.

The Pallas kernels need TPU hardware (validated by scripts/validate_tpu.py);
here we check the gating logic and that the engine composes correctly when
the fused path is absent.
"""
import jax.numpy as jnp
from jax import random

from dibs_tpu.inference import JointDiBS
from dibs_tpu.inference.fused_linear import fused_linear_available
from dibs_tpu.target import make_linear_gaussian_model


def test_fused_unavailable_on_cpu():
    assert not fused_linear_available(128)
    assert not fused_linear_available(20)


def test_engine_runs_without_fused_path():
    data, gm, lm = make_linear_gaussian_model(
        key=random.PRNGKey(0), n_vars=6, graph_prior_str="er",
        n_observations=20, n_ho_observations=5,
    )
    dibs = JointDiBS(
        x=data.x, graph_model=gm, likelihood_model=lm,
        n_grad_mc_samples=4, n_acyclicity_mc_samples=2,
        fused_sample_sharing=None,
    )
    assert dibs.est.fused_grad_both is None  # CPU: Pallas gate closed
    gs, thetas = dibs.sample(key=random.PRNGKey(1), n_particles=3, steps=5)
    assert jnp.isfinite(thetas).all()

    # default: the generic shared-sample fused estimator serves the joint
    # engine even off-TPU (round-3 'hard' sampling-sharing default)
    dibs2 = JointDiBS(
        x=data.x, graph_model=gm, likelihood_model=lm,
        n_grad_mc_samples=4, n_acyclicity_mc_samples=2,
    )
    assert dibs2.est.fused_grad_both is not None
    gs, thetas = dibs2.sample(key=random.PRNGKey(1), n_particles=3, steps=5)
    assert jnp.isfinite(thetas).all()


def test_fused_gate_requires_reparam():
    """The fused kernel implements the reparam Z-estimator only."""
    data, gm, lm = make_linear_gaussian_model(
        key=random.PRNGKey(0), n_vars=6, graph_prior_str="er",
        n_observations=20, n_ho_observations=5,
    )
    dibs = JointDiBS(
        x=data.x, graph_model=gm, likelihood_model=lm,
        grad_estimator_z="score",
    )
    assert dibs.est.fused_grad_both is None
