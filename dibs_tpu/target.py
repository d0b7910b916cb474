"""Synthetic ground-truth targets and model factories.

Behavioral spec: /root/reference/dibs/target.py. All graph handling is
matrix-native (``sample_G`` returns ``[d, d]`` adjacency matrices; no igraph
objects anywhere).
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
from jax import random

from dibs_tpu.models.graph import (
    ErdosReniDAGDistribution,
    ScaleFreeDAGDistribution,
    UniformDAGDistributionRejection,
)
from dibs_tpu.models.linear_gaussian import BGe, LinearGaussian
from dibs_tpu.models.nonlinear_gaussian import DenseNonlinearGaussian

__all__ = [
    "Data",
    "make_synthetic_bayes_net",
    "make_graph_model",
    "make_linear_gaussian_equivalent_model",
    "make_linear_gaussian_model",
    "make_nonlinear_gaussian_model",
]


class Data(NamedTuple):
    """Simulated synthetic data plus its ground-truth generative model.

    Args:
        passed_key: the PRNG key passed *into* the generating function
            (stored for exact reproducibility)
        n_vars: number of variables
        n_observations: rows in ``x`` (used for inference)
        n_ho_observations: rows in ``x_ho`` (held out for evaluation)
        g: ground-truth DAG adjacency matrix ``[d, d]``
        theta: ground-truth parameters
        x: observational data ``[n_observations, d]``
        x_ho: held-out observational data ``[n_ho_observations, d]``
        x_interv: list of ``(intervention dict, observations)`` pairs
    """

    passed_key: Any
    n_vars: int
    n_observations: int
    n_ho_observations: int
    g: Any
    theta: Any
    x: Any
    x_ho: Any
    x_interv: Any


def make_synthetic_bayes_net(*,
    key,
    n_vars,
    graph_model,
    generative_model,
    n_observations=100,
    n_ho_observations=100,
    n_intervention_sets=10,
    perc_intervened=0.1,
):
    """Samples a ground-truth BN and observational + interventional data.

    Interventions: ``n_intervention_sets`` random clamp-to-zero interventions,
    each touching ``ceil(perc_intervened * d)`` distinct nodes.
    """
    passed_key = key

    key, subk = random.split(key)
    g_gt = jnp.asarray(graph_model.sample_G(subk))

    key, subk = random.split(key)
    theta = generative_model.sample_parameters(key=subk, n_vars=n_vars)

    key, subk = random.split(key)
    x = generative_model.sample_obs(
        key=subk, n_samples=n_observations, g=g_gt, theta=theta
    )

    key, subk = random.split(key)
    x_ho = generative_model.sample_obs(
        key=subk, n_samples=n_ho_observations, g=g_gt, theta=theta
    )

    x_interv = []
    n_interv = int(jnp.ceil(n_vars * perc_intervened))
    for _ in range(n_intervention_sets):
        key, subk = random.split(key)
        interv_targets = random.choice(subk, n_vars, shape=(n_interv,), replace=False)
        interv = {int(k): 0.0 for k in interv_targets}

        key, subk = random.split(key)
        x_interv_ = generative_model.sample_obs(
            key=subk, n_samples=n_observations, g=g_gt, theta=theta, interv=interv
        )
        x_interv.append((interv, x_interv_))

    return Data(
        passed_key=passed_key,
        n_vars=n_vars,
        n_observations=n_observations,
        n_ho_observations=n_ho_observations,
        g=g_gt,
        theta=theta,
        x=x,
        x_ho=x_ho,
        x_interv=x_interv,
    )


def make_graph_model(*, n_vars, graph_prior_str, edges_per_node=2):
    """``'er'`` / ``'sf'`` dispatch; anything else falls back to the uniform
    rejection sampler (feasible only for ``d <= 5``)."""
    if graph_prior_str == "er":
        return ErdosReniDAGDistribution(n_vars=n_vars, n_edges_per_node=edges_per_node)
    if graph_prior_str == "sf":
        return ScaleFreeDAGDistribution(n_vars=n_vars, n_edges_per_node=edges_per_node)
    assert n_vars <= 5, "Naive uniform DAG sampling only possible up to 5 nodes"
    return UniformDAGDistributionRejection(n_vars=n_vars)


def make_linear_gaussian_equivalent_model(*, key, n_vars=20, graph_prior_str="sf",
    bge_mean_obs=None, bge_alpha_mu=None, bge_alpha_lambd=None,
    obs_noise=0.1, mean_edge=0.0, sig_edge=1.0, min_edge=0.5, n_observations=100,
    n_ho_observations=100):
    """Linear-Gaussian ground truth scored with the BGe marginal likelihood
    (weights all DAGs of a Markov equivalence class equally; for MarginalDiBS).

    Returns ``(data, graph_model, likelihood_model)``.
    """
    graph_model = make_graph_model(n_vars=n_vars, graph_prior_str=graph_prior_str)
    generative_model = LinearGaussian(
        n_vars=n_vars, obs_noise=obs_noise, mean_edge=mean_edge,
        sig_edge=sig_edge, min_edge=min_edge,
    )
    likelihood_model = BGe(
        n_vars=n_vars, mean_obs=bge_mean_obs, alpha_mu=bge_alpha_mu,
        alpha_lambd=bge_alpha_lambd,
    )
    key, subk = random.split(key)
    data = make_synthetic_bayes_net(
        key=subk, n_vars=n_vars, graph_model=graph_model,
        generative_model=generative_model, n_observations=n_observations,
        n_ho_observations=n_ho_observations,
    )
    return data, graph_model, likelihood_model


def make_linear_gaussian_model(*, key, n_vars=20, graph_prior_str="sf",
    obs_noise=0.1, mean_edge=0.0, sig_edge=1.0, min_edge=0.5, n_observations=100,
    n_ho_observations=100):
    """Linear-Gaussian ground truth with the same model family as likelihood
    (for JointDiBS). Returns ``(data, graph_model, likelihood_model)``."""
    graph_model = make_graph_model(n_vars=n_vars, graph_prior_str=graph_prior_str)
    generative_model = LinearGaussian(
        n_vars=n_vars, obs_noise=obs_noise, mean_edge=mean_edge,
        sig_edge=sig_edge, min_edge=min_edge,
    )
    likelihood_model = LinearGaussian(
        n_vars=n_vars, obs_noise=obs_noise, mean_edge=mean_edge,
        sig_edge=sig_edge, min_edge=min_edge,
    )
    key, subk = random.split(key)
    data = make_synthetic_bayes_net(
        key=subk, n_vars=n_vars, graph_model=graph_model,
        generative_model=generative_model, n_observations=n_observations,
        n_ho_observations=n_ho_observations,
    )
    return data, graph_model, likelihood_model


def make_nonlinear_gaussian_model(*, key, n_vars=20, graph_prior_str="sf",
    obs_noise=0.1, sig_param=1.0, hidden_layers=(5,), n_observations=100,
    n_ho_observations=100):
    """Nonlinear (per-node MLP mean) Gaussian ground truth (for JointDiBS).
    Returns ``(data, graph_model, likelihood_model)``."""
    graph_model = make_graph_model(n_vars=n_vars, graph_prior_str=graph_prior_str)
    generative_model = DenseNonlinearGaussian(
        n_vars=n_vars, hidden_layers=hidden_layers, obs_noise=obs_noise,
        sig_param=sig_param,
    )
    likelihood_model = DenseNonlinearGaussian(
        n_vars=n_vars, hidden_layers=hidden_layers, obs_noise=obs_noise,
        sig_param=sig_param,
    )
    key, subk = random.split(key)
    data = make_synthetic_bayes_net(
        key=subk, n_vars=n_vars, graph_model=graph_model,
        generative_model=generative_model, n_observations=n_observations,
        n_ho_observations=n_ho_observations,
    )
    return data, graph_model, likelihood_model
