"""End-to-end posterior-quality CI (slow-marked).

Runs reduced-size versions of the BASELINE.md quality configs and asserts
E-SHD / AUROC thresholds, so quality regressions fail loudly instead of
silently shipping (VERDICT round-1, item 6). Reference protocol analog:
/root/reference/examples/dibs_{marginal,joint}.ipynb cells 4-10.

Enable with ``DIBS_RUN_SLOW=1`` (each test is a multi-minute CPU run on the
1-core host; on TPU they take seconds). The full-size 2000-step golden runs
against the actual reference live in parity/ (see parity/RESULTS_r2.md).
"""
import os

import pytest
from jax import random

from dibs_tpu.inference import JointDiBS, MarginalDiBS
from dibs_tpu.metrics import expected_shd, threshold_metrics
from dibs_tpu.models import BGe
from dibs_tpu.target import (
    make_linear_gaussian_equivalent_model,
    make_linear_gaussian_model,
)

pytestmark = pytest.mark.skipif(
    os.environ.get("DIBS_RUN_SLOW") != "1",
    reason="slow end-to-end quality run; set DIBS_RUN_SLOW=1",
)


def _metrics(dist, g_gt):
    return (
        float(expected_shd(dist=dist, g=g_gt)),
        float(threshold_metrics(dist=dist, g=g_gt)["roc_auc"]),
    )


@pytest.mark.slow
def test_joint_linear_quality_reduced():
    """Config-2 analog at d=12 / 800 steps: AUROC well above chance and
    E-SHD below the empty graph's SHD. The empirical posterior gets the
    tight bar; the DiBS+ mixture is winner-take-most (weights differ by
    tens of nats) and a single seed's mixture AUROC swings ~0.67-0.82
    under any trajectory perturbation with no real quality change
    (scripts/quality_gate.py joint_linear docstring), so it gets the
    calibrated looser bar the on-device gate uses for its median."""
    key, subk = random.split(random.PRNGKey(123))
    data, gm, lm = make_linear_gaussian_model(
        key=subk, n_vars=12, graph_prior_str="sf"
    )
    dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
    gs, thetas = dibs.sample(key=key, n_particles=12, steps=800)

    n_gt_edges = int(data.g.sum())
    eshd, auroc = _metrics(dibs.get_empirical(gs, thetas), data.g)
    assert auroc > 0.8, (eshd, auroc)
    assert eshd < n_gt_edges, (eshd, n_gt_edges)
    eshd, auroc = _metrics(dibs.get_mixture(gs, thetas), data.g)
    assert auroc > 0.6, (eshd, auroc)
    assert eshd < 1.5 * n_gt_edges, (eshd, n_gt_edges)


@pytest.mark.slow
def test_marginal_bge_quality_reduced():
    """Config-1 analog at d=12 / 800 steps (BGe + score-function path).

    Thresholds calibrated against the ACTUAL reference on identical data
    (parity/reduced_marginal_ab.py, seed 123): reference empirical
    AUROC 0.57 / E-SHD 42.3, mixture 0.63 / 37.9; dibs-tpu 0.69 / 39.3 and
    0.63 / 40.1. The weak marginal posterior at this protocol is inherent
    to DiBS's score-function path, not a dibs-tpu regression — the test
    pins "no worse than the reference" with headroom for seed noise.
    """
    key, subk = random.split(random.PRNGKey(123))
    data, gm, _ = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=12, graph_prior_str="er"
    )
    dibs = MarginalDiBS(
        x=data.x, graph_model=gm, likelihood_model=BGe(n_vars=12)
    )
    gs = dibs.sample(key=key, n_particles=12, steps=800)

    n_gt_edges = int(data.g.sum())
    for dist in (dibs.get_empirical(gs), dibs.get_mixture(gs)):
        eshd, auroc = _metrics(dist, data.g)
        assert auroc > 0.55, (eshd, auroc)
        assert eshd < 2.0 * n_gt_edges, (eshd, n_gt_edges)
