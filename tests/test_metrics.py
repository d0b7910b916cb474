import jax.numpy as jnp
import numpy as onp
import pytest
from jax import random
from sklearn import metrics as sk

from dibs_tpu.metrics import (
    ParticleDistribution,
    expected_edges,
    expected_shd,
    neg_ave_log_marginal_likelihood,
    pairwise_structural_hamming_distance,
    threshold_metrics,
)
from dibs_tpu.ops import rocprc


def test_shd_basic_and_reversal():
    a = jnp.zeros((3, 3)).at[0, 1].set(1)
    b = jnp.zeros((3, 3)).at[1, 0].set(1)  # reversed edge
    c = jnp.zeros((3, 3))
    x = jnp.stack([a])
    y = jnp.stack([a, b, c])
    shd = pairwise_structural_hamming_distance(x=x, y=y)
    assert shd.shape == (1, 3)
    assert shd[0, 0] == 0
    assert shd[0, 1] == 1  # reversal counts once
    assert shd[0, 2] == 1  # deletion counts once


@pytest.mark.parametrize("seed", range(5))
def test_rocprc_matches_sklearn(seed):
    rng = onp.random.default_rng(seed)
    n = 200
    y = rng.integers(0, 2, n)
    # scores with heavy ties to stress tie handling
    score = onp.round(rng.random(n), 1)

    fpr, tpr, _ = rocprc.roc_curve(y, score)
    fpr_sk, tpr_sk, _ = sk.roc_curve(y, score, drop_intermediate=False)
    assert onp.allclose(fpr, fpr_sk)
    assert onp.allclose(tpr, tpr_sk)
    assert abs(rocprc.auc(fpr, tpr) - sk.auc(fpr_sk, tpr_sk)) < 1e-12

    prec, rec, _ = rocprc.precision_recall_curve(y, score)
    prec_sk, rec_sk, _ = sk.precision_recall_curve(y, score)
    assert onp.allclose(prec, prec_sk)
    assert onp.allclose(rec, rec_sk)
    assert abs(rocprc.auc(rec, prec) - sk.auc(rec_sk, prec_sk)) < 1e-12
    assert (
        abs(rocprc.average_precision_score(y, score)
            - sk.average_precision_score(y, score)) < 1e-12
    )


def _dist_with(gs, logp=None):
    gs = jnp.asarray(gs)
    if logp is None:
        logp = -jnp.log(gs.shape[0]) * jnp.ones(gs.shape[0])
    return ParticleDistribution(logp=jnp.asarray(logp), g=gs)


def test_expected_shd_weighted():
    g_gt = jnp.zeros((3, 3)).at[0, 1].set(1)
    g_exact = g_gt
    g_off = jnp.zeros((3, 3)).at[0, 2].set(1)  # shd 2 (one del one ins)
    dist = _dist_with(
        jnp.stack([g_exact, g_off]).astype(jnp.int32),
        logp=jnp.log(jnp.array([0.75, 0.25])),
    )
    eshd = expected_shd(dist=dist, g=g_gt)
    assert abs(float(eshd) - 0.25 * 2) < 1e-5


def test_expected_shd_cyclic_fallback():
    cyc = jnp.zeros((3, 3)).at[0, 1].set(1).at[1, 0].set(1)
    dist = _dist_with(jnp.stack([cyc]).astype(jnp.int32))
    assert expected_shd(dist=dist, g=jnp.zeros((3, 3))) == 3.0  # d(d-1)/2


def test_expected_edges():
    g1 = jnp.zeros((3, 3)).at[0, 1].set(1)
    g2 = jnp.zeros((3, 3)).at[0, 1].set(1).at[1, 2].set(1)
    dist = _dist_with(jnp.stack([g1, g2]).astype(jnp.int32))
    assert abs(float(expected_edges(dist=dist)) - 1.5) < 1e-3


def test_threshold_metrics_perfect_classifier():
    g_gt = jnp.zeros((4, 4)).at[0, 1].set(1).at[2, 3].set(1)
    dist = _dist_with(jnp.stack([g_gt]).astype(jnp.int32))
    res = threshold_metrics(dist=dist, g=g_gt)
    assert res["roc_auc"] == 1.0
    assert res["ave_prec"] == 1.0


def test_threshold_metrics_cyclic_fallback():
    cyc = jnp.zeros((4, 4)).at[0, 1].set(1).at[1, 0].set(1)
    g_gt = jnp.zeros((4, 4)).at[0, 1].set(1)
    res = threshold_metrics(dist=_dist_with(jnp.stack([cyc]).astype(jnp.int32)), g=g_gt)
    assert res["roc_auc"] == 0.5
    assert abs(res["prc_auc"] - 1 / 12) < 1e-6


def test_neg_ave_log_marginal_likelihood():
    g1 = jnp.zeros((3, 3)).at[0, 1].set(1).astype(jnp.int32)
    dist = _dist_with(jnp.stack([g1]))
    x = jnp.ones((5, 3))

    def eltwise_ll(gs, x_ho):
        return -2.0 * jnp.ones(gs.shape[0])

    score = neg_ave_log_marginal_likelihood(
        dist=dist, eltwise_log_marginal_likelihood=eltwise_ll, x=x
    )
    assert abs(float(score) - 2.0) < 1e-5
