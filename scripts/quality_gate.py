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
    """Median over 3 seeds. The empirical posterior is stable (0.87-0.97
    across seeds/precisions), but the DiBS+ mixture is winner-take-most —
    its weights differ by tens of nats, so one particle dominates and any
    trajectory perturbation (kernel rounding, transport precision) can
    swing a single seed's mixture AUROC between ~0.67 and ~0.82 with no
    real quality change (measured A/B: medians 0.697 vs 0.705 across
    transport precisions while seed 123 alone moved 0.67 <-> 0.82).
    A fixed-seed threshold at 0.8 therefore gated on luck; the median
    with a calibrated bar does not."""
    import statistics

    emp_au, emp_sh, mix_au, mix_sh = [], [], [], []
    n_gt = 0
    for seed in (123, 7, 2026):
        key, subk = random.split(random.PRNGKey(seed))
        data, gm, lm = make_linear_gaussian_model(
            key=subk, n_vars=12, graph_prior_str="sf")
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
        gs, thetas = dibs.sample(key=key, n_particles=12, steps=800)
        n_gt = max(n_gt, int(data.g.sum()))
        eshd, auroc = metrics(dibs.get_empirical(gs, thetas), data.g)
        emp_au.append(auroc), emp_sh.append(eshd)
        eshd, auroc = metrics(dibs.get_mixture(gs, thetas), data.g)
        mix_au.append(auroc), mix_sh.append(eshd)
    med = statistics.median
    check("joint_linear/empirical",
          med(emp_au) > 0.8 and med(emp_sh) < n_gt,
          f"median auroc={med(emp_au):.3f} (>0.8) "
          f"eshd={med(emp_sh):.1f} (<{n_gt})  [3 seeds]")
    check("joint_linear/mixture",
          med(mix_au) > 0.6 and med(mix_sh) < 1.5 * n_gt,
          f"median auroc={med(mix_au):.3f} (>0.6) "
          f"eshd={med(mix_sh):.1f} (<{int(1.5 * n_gt)})  [3 seeds]")


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


def kernel_numerics():
    """Hardware-numerics canary: the Pallas BGe kernel vs the XLA
    elimination on an ill-conditioned, large-scale dataset (collinear
    columns — the regime where bf16-level MXU input truncation once drove
    the bordered-Schur chain NaN; see ops/bge_kernel.py). Interpret-mode
    CPU tests cannot catch Mosaic codegen regressions, this does."""
    import jax
    import jax.numpy as jnp
    from jax import vmap

    from dibs_tpu.ops.bge_kernel import bge_logdet_pairs, bge_pallas_available
    from dibs_tpu.ops.logdet import masked_logdet_pd_pair

    d, b, n = 20, 64, 100
    if not bge_pallas_available(d):
        print("[quality-gate] kernel_numerics: skipped (no TPU Pallas)",
              flush=True)
        return
    k1, k2, k3 = random.split(random.PRNGKey(7), 3)
    base = random.normal(k1, (n, 4))
    mix = random.normal(k2, (4, d))
    x = base @ mix * 8.0 + 0.5 * random.normal(k3, (n, d))
    r_mats, _ = BGe(n_vars=d)._posterior_r_mats(
        x, jnp.zeros_like(x, dtype=jnp.int32))
    gs = (random.uniform(random.PRNGKey(1), (b, d, d)) < 0.5).astype(
        jnp.float32) * (1.0 - jnp.eye(d))
    pa, full = bge_logdet_pairs(r_mats, gs)
    eye = jnp.eye(d)
    ref_pa, ref_full = vmap(lambda g: vmap(
        lambda j: masked_logdet_pd_pair(r_mats[j], g[:, j], eye[:, j])
    )(jnp.arange(d)))(gs)
    err = float(jnp.maximum(jnp.abs(pa - ref_pa).max(),
                            jnp.abs(full - ref_full).max()))
    nan = bool(jnp.isnan(pa).any() or jnp.isnan(full).any())
    check("kernel_numerics/bge_ill_conditioned", (not nan) and err < 2e-2,
          f"max_abs_err={err:.2e} (<2e-2) nan={nan}")


def scale_robustness():
    """Unstandardized-data canary for the fused likelihood kernels: at 10x
    data scale the per-sample log-likelihood spreads grow ~100x, the regime
    where (a) Mosaic's default bf16 MXU truncation once collapsed the
    softmax weights (AUROC -> 0.50) and (b) the u == 1.0 hardware-uniform
    rounding once NaN'd the fast-soft formula mid-run. The XLA estimators
    score ~0.85-0.9 here; 0.75 flags a kernel regression without being
    seed-fragile."""
    import jax

    import statistics

    if jax.default_backend() != "tpu":
        print("[quality-gate] scale_robustness: skipped (no TPU)",
              flush=True)
        return
    aus = []
    for seed in (123, 7, 2026):
        key, subk = random.split(random.PRNGKey(seed))
        data, gm, lm = make_linear_gaussian_model(
            key=subk, n_vars=12, graph_prior_str="sf")
        dibs = JointDiBS(x=data.x * 10.0, graph_model=gm,
                         likelihood_model=lm)
        gs, thetas = dibs.sample(key=key, n_particles=12, steps=800)
        _, auroc = metrics(dibs.get_empirical(gs, thetas), data.g)
        aus.append(auroc)
    med = statistics.median(aus)
    check("scale_robustness/joint_linear_10x", med > 0.75,
          f"median auroc={med:.3f} (>0.75)  [3 seeds]")


def main():
    t0 = time.perf_counter()
    joint_linear()
    marginal_bge()
    kernel_numerics()
    scale_robustness()
    dt = time.perf_counter() - t0
    if FAILURES:
        print(f"[quality-gate] FAILED ({len(FAILURES)} checks) in {dt:.0f}s")
        raise SystemExit(1)
    print(f"[quality-gate] all checks passed in {dt:.0f}s")


if __name__ == "__main__":
    main()
