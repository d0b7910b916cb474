"""Posterior evaluation metrics against a ground-truth DAG.

Behavioral spec: /root/reference/dibs/metrics.py, including every cyclic-
particle fallback (E-SHD -> d(d-1)/2, AUROC -> 0.5, PRC/AP -> edge density,
neg. LL -> empty graph). Threshold metrics use the native sort+cumsum
implementations in :mod:`dibs_tpu.ops.rocprc` instead of sklearn.
"""
from __future__ import annotations

from typing import Any, NamedTuple

import jax.numpy as jnp
import numpy as onp
from jax.scipy.special import logsumexp

from dibs_tpu.ops import rocprc
from dibs_tpu.ops.acyclic import elwise_acyclic_constr
from dibs_tpu.utils.tree import tree_mul, tree_select

__all__ = [
    "ParticleDistribution",
    "pairwise_structural_hamming_distance",
    "expected_shd",
    "expected_cpdag_shd",
    "expected_edges",
    "threshold_metrics",
    "neg_ave_log_marginal_likelihood",
    "neg_ave_log_likelihood",
]


class ParticleDistribution(NamedTuple):
    """Sampled particles ``(G[, Θ])`` with their log-weights.

    Args:
        logp: ``[M]`` log-weights
        g: ``[M, d, d]`` adjacency matrices
        theta: optional parameter pytree with leading dim ``M``
    """

    logp: Any
    g: Any
    theta: Any = None


def pairwise_structural_hamming_distance(*, x, y):
    """Pairwise SHD matrix ``[N, M]`` between two graph batches.

    Edge reversals count once; an erroneous undirected edge counts once
    (symmetrize the absolute difference, clip double-counted flips, halve).
    """
    assert x.ndim == 3 and y.ndim == 3
    pw_diff = jnp.abs(jnp.expand_dims(x, 1) - jnp.expand_dims(y, 0))
    pw_diff = pw_diff + pw_diff.transpose((0, 1, 3, 2))
    pw_diff = jnp.where(pw_diff > 1, 1, pw_diff)
    return jnp.sum(pw_diff, axis=(2, 3)) / 2


def _dag_filter(dist: ParticleDistribution, n_vars: int):
    """Boolean mask of acyclic particles (h(G) == 0)."""
    return elwise_acyclic_constr(dist.g.astype(jnp.float32), n_vars) == 0


def expected_shd(*, dist: ParticleDistribution, g):
    """``E_p[SHD(G, G*)]`` over acyclic particles; ``d(d-1)/2`` if none."""
    n_vars = g.shape[0]
    is_dag = _dag_filter(dist, n_vars)
    if is_dag.sum() == 0:
        return n_vars * (n_vars - 1) / 2

    particles = dist.g[is_dag, :, :]
    log_weights = dist.logp[is_dag] - logsumexp(dist.logp[is_dag])
    shds = pairwise_structural_hamming_distance(x=particles, y=g[None]).squeeze(1)
    log_eshd, sign = logsumexp(
        log_weights, b=shds.astype(log_weights.dtype), axis=0, return_sign=True
    )
    return sign * jnp.exp(log_eshd)


def expected_cpdag_shd(*, dist: ParticleDistribution, g):
    """``E_p[SHD(CPDAG(G), CPDAG(G*))]`` — equivalence-class recovery error.

    Beyond-reference metric (see :mod:`dibs_tpu.ops.cpdag`): from
    observational data the (BGe) posterior is identifiable only up to the
    Markov equivalence class, so this scores each acyclic particle's
    *CPDAG* against the ground truth's, charging nothing for orientations
    the class leaves free. Cyclic-particle fallback matches
    :func:`expected_shd` (``d(d-1)/2`` when no particle is a DAG).

    Host-side (numpy) — evaluation path only.
    """
    from dibs_tpu.ops.cpdag import dag_to_cpdag, eltwise_dag_to_cpdag, pdag_shd

    n_vars = g.shape[0]
    is_dag = _dag_filter(dist, n_vars)
    if is_dag.sum() == 0:
        return n_vars * (n_vars - 1) / 2

    particles = onp.asarray(dist.g[is_dag, :, :])
    logp = onp.asarray(dist.logp[is_dag])
    log_weights = logp - logsumexp(logp)
    shds = pdag_shd(eltwise_dag_to_cpdag(particles), dag_to_cpdag(g)[None])
    log_eshd, sign = logsumexp(
        jnp.asarray(log_weights), b=jnp.asarray(shds, dtype=jnp.float32),
        axis=0, return_sign=True,
    )
    return sign * jnp.exp(log_eshd)


def expected_edges(*, dist: ParticleDistribution):
    """``E_p[|edges(G)|]``; falls back to counting cyclic graphs' edges."""
    n_vars = dist.g.shape[-1]
    is_dag = _dag_filter(dist, n_vars)
    if is_dag.sum() == 0:
        n_edges_cyc = dist.g.sum(axis=(-1, -2))
        log_e, sign = logsumexp(
            dist.logp, b=n_edges_cyc.astype(dist.logp.dtype), axis=0,
            return_sign=True,
        )
        return sign * jnp.exp(log_e)

    particles = dist.g[is_dag, :, :]
    log_weights = dist.logp[is_dag] - logsumexp(dist.logp[is_dag])
    n_edges = particles.sum(axis=(-1, -2))
    log_e, sign = logsumexp(
        log_weights, b=n_edges.astype(log_weights.dtype), axis=0, return_sign=True
    )
    return sign * jnp.exp(log_e)


def threshold_metrics(*, dist: ParticleDistribution, g):
    """ROC / precision-recall metrics of the weighted edge-belief matrix."""
    n_vars = g.shape[0]
    g_flat = onp.asarray(g).reshape(-1)

    is_dag = _dag_filter(dist, n_vars)
    if is_dag.sum() == 0:
        # random/junk classifier fallback
        density = float(g.sum() / (n_vars * (n_vars - 1)))
        return {"roc_auc": 0.5, "prc_auc": density, "ave_prec": density}

    particles = dist.g[is_dag, :, :]
    log_weights = dist.logp[is_dag] - logsumexp(dist.logp[is_dag])

    # edge beliefs P(G_ij = 1) = sum_G w_G G_ij, in signed log space
    log_belief, sign = logsumexp(
        log_weights[..., None, None],
        b=particles.astype(log_weights.dtype),
        axis=0,
        return_sign=True,
    )
    p_edge_flat = onp.asarray(sign * jnp.exp(log_belief)).reshape(-1)

    fpr, tpr, _ = rocprc.roc_curve(g_flat, p_edge_flat)
    roc_auc = rocprc.auc(fpr, tpr)
    precision, recall, _ = rocprc.precision_recall_curve(g_flat, p_edge_flat)
    prc_auc = rocprc.auc(recall, precision)
    ave_prec = rocprc.average_precision_score(g_flat, p_edge_flat)

    return {
        "fpr": fpr.tolist(),
        "tpr": tpr.tolist(),
        "roc_auc": roc_auc,
        "precision": precision.tolist(),
        "recall": recall.tolist(),
        "prc_auc": prc_auc,
        "ave_prec": ave_prec,
    }


def neg_ave_log_marginal_likelihood(*, dist: ParticleDistribution,
                                    eltwise_log_marginal_likelihood, x):
    """``- E_{p(G|D)}[log p(D_test | G)]``; empty-graph fallback if all cyclic."""
    _, n_vars = x.shape
    is_dag = _dag_filter(dist, n_vars)
    if is_dag.sum() == 0:
        g = jnp.zeros((1, n_vars, n_vars), dtype=dist.g.dtype)
        log_weights = jnp.array([0.0], dtype=dist.logp.dtype)
    else:
        g = dist.g[is_dag, :, :]
        log_weights = dist.logp[is_dag] - logsumexp(dist.logp[is_dag])

    log_likelihood = eltwise_log_marginal_likelihood(g, x)
    log_score, sign = logsumexp(
        log_weights, b=log_likelihood, axis=0, return_sign=True
    )
    return -sign * jnp.exp(log_score)


def neg_ave_log_likelihood(*, dist: ParticleDistribution, eltwise_log_likelihood, x):
    """``- E_{p(G,Θ|D)}[log p(D_test | G, Θ)]``; empty-graph fallback."""
    assert dist.theta is not None
    _, n_vars = x.shape
    is_dag = _dag_filter(dist, n_vars)
    if is_dag.sum() == 0:
        g = tree_mul(dist.g, 0.0)
        theta = tree_mul(dist.theta, 0.0)
        log_weights = tree_mul(dist.logp, 0.0)
    else:
        g = dist.g[is_dag, :, :]
        theta = tree_select(dist.theta, is_dag)
        log_weights = dist.logp[is_dag] - logsumexp(dist.logp[is_dag])

    log_likelihood = eltwise_log_likelihood(g, theta, x)
    log_score, sign = logsumexp(
        log_weights, b=log_likelihood, axis=0, return_sign=True
    )
    return -sign * jnp.exp(log_score)
