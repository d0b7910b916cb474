"""On-device quality gate: reduced end-to-end thresholds on the default
backend (TPU when present — takes ~1 min; the pytest variant in
tests/test_quality.py is CPU-forced by conftest and needs DIBS_RUN_SLOW=1).

Runs the config-1/2 analogs at d=12 / 800 steps and asserts the calibrated
thresholds (calibration notes: tests/test_quality.py docstrings). Exit code
0 = quality gate passed. Wire into any TPU CI via ``make check``.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax import random

from dibs_tpu.inference import JointDiBS, MarginalDiBS
from dibs_tpu.metrics import expected_shd, threshold_metrics
from dibs_tpu.models import BGe
from dibs_tpu.target import (
    make_linear_gaussian_equivalent_model,
    make_linear_gaussian_model,
)

FAILURES = []


def check(name, cond, detail):
    status = "ok" if cond else "FAIL"
    print(f"[quality-gate] {name}: {status} {detail}", flush=True)
    if not cond:
        FAILURES.append((name, detail))


def metrics(dist, g_gt):
    return (float(expected_shd(dist=dist, g=g_gt)),
            float(threshold_metrics(dist=dist, g=g_gt)["roc_auc"]))


def joint_linear():
    key, subk = random.split(random.PRNGKey(123))
    data, gm, lm = make_linear_gaussian_model(
        key=subk, n_vars=12, graph_prior_str="sf")
    dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
    gs, thetas = dibs.sample(key=key, n_particles=12, steps=800)
    n_gt = int(data.g.sum())
    for nm, dist in (("empirical", dibs.get_empirical(gs, thetas)),
                     ("mixture", dibs.get_mixture(gs, thetas))):
        eshd, auroc = metrics(dist, data.g)
        check(f"joint_linear/{nm}", auroc > 0.8 and eshd < n_gt,
              f"auroc={auroc:.3f} (>0.8) eshd={eshd:.1f} (<{n_gt})")


def marginal_bge():
    key, subk = random.split(random.PRNGKey(123))
    data, gm, _ = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=12, graph_prior_str="er")
    dibs = MarginalDiBS(x=data.x, graph_model=gm,
                        likelihood_model=BGe(n_vars=12))
    gs = dibs.sample(key=key, n_particles=12, steps=800)
    n_gt = int(data.g.sum())
    for nm, dist in (("empirical", dibs.get_empirical(gs)),
                     ("mixture", dibs.get_mixture(gs))):
        eshd, auroc = metrics(dist, data.g)
        check(f"marginal_bge/{nm}", auroc > 0.55 and eshd < 2.0 * n_gt,
              f"auroc={auroc:.3f} (>0.55) eshd={eshd:.1f} (<{2*n_gt})")


def main():
    t0 = time.perf_counter()
    joint_linear()
    marginal_bge()
    dt = time.perf_counter() - t0
    if FAILURES:
        print(f"[quality-gate] FAILED ({len(FAILURES)} checks) in {dt:.0f}s")
        raise SystemExit(1)
    print(f"[quality-gate] all checks passed in {dt:.0f}s")


if __name__ == "__main__":
    main()
