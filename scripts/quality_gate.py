"""On-device quality gate: reduced end-to-end checks on the default
backend (TPU when present — takes a few minutes; the pytest variant in
tests/test_quality.py is CPU-forced by conftest and needs DIBS_RUN_SLOW=1).

Two layers (VERDICT r3 item 5 made the second one exist):

1. **Collapse canary** — absolute floors (median AUROC > 0.8 empirical /
   0.6 mixture, E-SHD < 1.5x true edges, ...) that catch catastrophic
   breakage (posterior collapse, NaN weights). These floors sit far below
   the advertised parity numbers by design: single-seed mixture metrics
   are winner-take-most volatile (see joint_linear docstring).
2. **Golden regression gate** — per-config *median-over-5-seeds* metrics
   compared against recorded golden medians (``scripts/quality_golden.json``,
   written by ``--record-golden`` at a known-good HEAD). Fails on a
   calibrated relative drop: median AUROC below golden − max(0.04, IQR/2)
   for the stable empirical posterior (0.08 floor for the volatile
   mixture), median E-SHD above golden × 1.25. A ~10-15% quality
   regression that sails through the floors trips this gate — proven by
   ``--inject kernel-bandwidth`` (mis-set SVGD bandwidth h: 5 -> 50, a
   plausible config regression) and ``--inject mc-starve``
   (n_grad_mc_samples 128 -> 8, mimicking a broken sample batch); see
   tests/test_quality_gate_logic.py for the comparator's unit proof and
   benchmarks/RESULTS.md for the on-device injection runs.

Runs the config-1/2 analogs at d=12 / 800 steps, plus (round 5) the same
marginal config under the *recommended* ``score_rb`` estimator — the
documented best marginal path needs its own regression coverage, not just
the parity default's. Exit code 0 = gate passed. Wire into any TPU CI via
``make check``.
"""
import argparse
import json
import os
import statistics
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

GOLDEN_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "quality_golden.json")
SEEDS = (123, 7, 2026, 11, 42)

FAILURES = []

# --inject modes: plausible regressions the golden gate must catch while
# the absolute floors may not. Consumed by the engine constructors below.
INJECT = None
_INJECT_KW = {
    None: {},
    # SVGD repulsion bandwidth mis-set 10x: particles under-repel, the
    # posterior family collapses toward the MAP mode
    "kernel-bandwidth": {"kernel_param": {"h_latent": 50.0, "h_theta": 500.0}},
    # MC sample starvation: 16x fewer likelihood samples per step
    "mc-starve": {"n_grad_mc_samples": 8},
}


def check(name, cond, detail):
    status = "ok" if cond else "FAIL"
    print(f"[quality-gate] {name}: {status} {detail}", flush=True)
    if not cond:
        FAILURES.append((name, detail))


def metrics(dist, g_gt):
    return (float(expected_shd(dist=dist, g=g_gt)),
            float(threshold_metrics(dist=dist, g=g_gt)["roc_auc"]))


def _joint_kwargs():
    kw = dict(_INJECT_KW[INJECT])
    if INJECT == "kernel-bandwidth":
        kw = {"kernel_param": kw["kernel_param"]}
    return kw


def _marginal_kwargs():
    kw = dict(_INJECT_KW[INJECT])
    if INJECT == "kernel-bandwidth":
        kw = {"kernel_param": {"h": 50.0}}
    return kw


def run_joint_linear():
    """Per-seed metrics of the reduced joint config (d=12, 800 steps)."""
    rows = []
    n_gt = 0
    for seed in SEEDS:
        key, subk = random.split(random.PRNGKey(seed))
        data, gm, lm = make_linear_gaussian_model(
            key=subk, n_vars=12, graph_prior_str="sf")
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm,
                         **_joint_kwargs())
        gs, thetas = dibs.sample(key=key, n_particles=12, steps=800)
        n_gt = max(n_gt, int(data.g.sum()))
        e_sh, e_au = metrics(dibs.get_empirical(gs, thetas), data.g)
        m_sh, m_au = metrics(dibs.get_mixture(gs, thetas), data.g)
        rows.append({"seed": seed, "emp_auroc": e_au, "emp_eshd": e_sh,
                     "mix_auroc": m_au, "mix_eshd": m_sh})
    return rows, n_gt


def run_marginal_bge():
    """Per-seed metrics of the reduced marginal config (d=12, 800 steps)."""
    return _run_marginal(grad_estimator_z=None)


def run_marginal_score_rb():
    """Per-seed metrics of the reduced marginal config under the
    ``score_rb`` estimator — the *documented recommendation* for marginal
    inference since round 4 (10-seed study, parity/RESULTS_r3.md): better
    than the parity-default ``score`` on every mixture cell. VERDICT r4
    item 8: the recommended path needs its own regression coverage, not
    just the parity default's."""
    return _run_marginal(grad_estimator_z="score_rb")


def _run_marginal(grad_estimator_z):
    rows = []
    n_gt = 0
    kw = dict(_marginal_kwargs())
    if grad_estimator_z is not None:
        kw["grad_estimator_z"] = grad_estimator_z
    for seed in SEEDS:
        key, subk = random.split(random.PRNGKey(seed))
        data, gm, _ = make_linear_gaussian_equivalent_model(
            key=subk, n_vars=12, graph_prior_str="er")
        dibs = MarginalDiBS(x=data.x, graph_model=gm,
                            likelihood_model=BGe(n_vars=12), **kw)
        gs = dibs.sample(key=key, n_particles=12, steps=800)
        n_gt = max(n_gt, int(data.g.sum()))
        e_sh, e_au = metrics(dibs.get_empirical(gs), data.g)
        m_sh, m_au = metrics(dibs.get_mixture(gs), data.g)
        rows.append({"seed": seed, "emp_auroc": e_au, "emp_eshd": e_sh,
                     "mix_auroc": m_au, "mix_eshd": m_sh})
    return rows, n_gt


def _median(rows, k):
    return statistics.median(r[k] for r in rows)


def _iqr(vals):
    vs = sorted(vals)
    n = len(vs)
    return vs[(3 * n) // 4] - vs[n // 4]


def floors(name, rows, n_gt):
    """Layer 1: the collapse canary (absolute floors, medians over seeds).

    The empirical posterior is stable (0.87-0.97 across seeds/precisions);
    the DiBS+ mixture is winner-take-most — its weights differ by tens of
    nats, so one particle dominates and any trajectory perturbation
    (kernel rounding, transport precision) can swing a single seed's
    mixture AUROC between ~0.67 and ~0.82 with no real quality change
    (measured A/B: medians 0.697 vs 0.705 across transport precisions
    while seed 123 alone moved 0.67 <-> 0.82). Fixed-seed thresholds at
    0.8 therefore gated on luck; medians with calibrated bars do not."""
    if name == "joint_linear":
        check("joint_linear/empirical",
              _median(rows, "emp_auroc") > 0.8
              and _median(rows, "emp_eshd") < n_gt,
              f"median auroc={_median(rows, 'emp_auroc'):.3f} (>0.8) "
              f"eshd={_median(rows, 'emp_eshd'):.1f} (<{n_gt})  "
              f"[{len(rows)} seeds]")
        check("joint_linear/mixture",
              _median(rows, "mix_auroc") > 0.6
              and _median(rows, "mix_eshd") < 1.5 * n_gt,
              f"median auroc={_median(rows, 'mix_auroc'):.3f} (>0.6) "
              f"eshd={_median(rows, 'mix_eshd'):.1f} "
              f"(<{int(1.5 * n_gt)})  [{len(rows)} seeds]")
    else:
        check(f"{name}/floors",
              _median(rows, "emp_auroc") > 0.55
              and _median(rows, "mix_auroc") > 0.55
              and _median(rows, "emp_eshd") < 2.0 * n_gt,
              f"median emp auroc={_median(rows, 'emp_auroc'):.3f} (>0.55) "
              f"mix auroc={_median(rows, 'mix_auroc'):.3f} (>0.55) "
              f"emp eshd={_median(rows, 'emp_eshd'):.1f} (<{2 * n_gt})")


def golden_compare(name, rows, golden):
    """Layer 2: calibrated relative drop vs the recorded golden medians.

    Tolerances: AUROC may drop by max(abs_floor, golden-IQR/2) — abs_floor
    0.04 for the stable empirical posterior, 0.08 for the volatile
    mixture; E-SHD may rise by 25%. Calibration: trajectory-level code
    changes (precision flips, kernel re-orderings) move these 5-seed
    medians by < 0.02 / < 10% (measured across the r3 precision A/Bs),
    while a true ~10-15% quality regression (mis-set bandwidth, MC
    starvation) moves them past the bars — see RESULTS.md."""
    g = golden.get(name)
    if g is None:
        print(f"[quality-gate] golden/{name}: no golden entry — "
              "run --record-golden", flush=True)
        return
    for metric_key, kind in (("emp_auroc", "auroc_stable"),
                             ("mix_auroc", "auroc_volatile"),
                             ("emp_eshd", "eshd"), ("mix_eshd", "eshd")):
        med = _median(rows, metric_key)
        gold_med = g["medians"][metric_key]
        gold_iqr = g["iqr"][metric_key]
        if kind == "eshd":
            ok = med <= gold_med * 1.25 + 1e-9
            detail = (f"median {med:.2f} vs golden {gold_med:.2f} "
                      f"(limit {gold_med * 1.25:.2f})")
        else:
            tol = max(0.04 if kind == "auroc_stable" else 0.08,
                      gold_iqr / 2.0)
            ok = med >= gold_med - tol
            detail = (f"median {med:.3f} vs golden {gold_med:.3f} "
                      f"(tol {tol:.3f})")
        check(f"golden/{name}/{metric_key}", ok, detail)


def run_marginal_bge_d128():
    """cfg6-shaped gate row (VERDICT r4 item 3b): marginal BGe at d=128
    through the lane-batched determinant-pair kernel — the reference's
    hardest numeric path at production d. Reduced batch (P=20, M=16,
    3 seeds) at 1200 steps: shorter runs end with every particle still
    cyclic at d=128 (the beta anneal has not bitten), pinning all
    metrics to the d(d-1)/2 fallback — a golden that cannot move and
    therefore guards nothing. At 1200 steps all seeds end cyclic-free
    (measured, benchmarks/cfg6_quality/ab_kernel_*) and the medians are
    live. Costs ~3 min on TPU with the persistent compile cache; guards
    the d=128 kernel tier + large-d marginal engine end-to-end, which
    the d=12 rows never touch. N=512 observations (N=100
    underdetermines d=128)."""
    rows = []
    n_gt = 0
    kw = dict(_marginal_kwargs())
    kw.setdefault("n_grad_mc_samples", 16)
    for seed in SEEDS[:3]:
        key, subk = random.split(random.PRNGKey(seed))
        data, gm, _ = make_linear_gaussian_equivalent_model(
            key=subk, n_vars=128, graph_prior_str="sf", n_observations=512,
            n_ho_observations=10)
        dibs = MarginalDiBS(x=data.x, graph_model=gm,
                            likelihood_model=BGe(n_vars=128),
                            n_acyclicity_mc_samples=8, **kw)
        gs = dibs.sample(key=key, n_particles=20, steps=1200)
        n_gt = max(n_gt, int(data.g.sum()))
        e_sh, e_au = metrics(dibs.get_empirical(gs), data.g)
        m_sh, m_au = metrics(dibs.get_mixture(gs), data.g)
        rows.append({"seed": seed, "emp_auroc": e_au, "emp_eshd": e_sh,
                     "mix_auroc": m_au, "mix_eshd": m_sh})
    return rows, n_gt


_GOLDEN_RUNNERS = (("joint_linear", run_joint_linear),
                   ("marginal_bge", run_marginal_bge),
                   ("marginal_score_rb", run_marginal_score_rb),
                   ("marginal_bge_d128", run_marginal_bge_d128))


def record_golden(only=None):
    """Runs the reduced protocol and stores golden medians. ``only``
    restricts to a subset of config names, MERGING into the existing
    golden file (so adding a new gated config does not re-baseline the
    others)."""
    golden = {}
    if only and os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)
    for name, runner in _GOLDEN_RUNNERS:
        if only and name not in only:
            continue
        rows, n_gt = runner()
        keys = ("emp_auroc", "emp_eshd", "mix_auroc", "mix_eshd")
        golden[name] = {
            "seeds": list(SEEDS),
            "n_gt_edges": n_gt,
            "rows": rows,
            "medians": {k: _median(rows, k) for k in keys},
            "iqr": {k: _iqr([r[k] for r in rows]) for k in keys},
        }
        print(f"[golden] {name}: medians "
              f"{ {k: round(v, 3) for k, v in golden[name]['medians'].items()} }",
              flush=True)
    import jax

    golden["device"] = str(jax.devices()[0])
    with open(GOLDEN_PATH, "w") as f:
        json.dump(golden, f, indent=2)
    print(f"[golden] wrote {GOLDEN_PATH}", flush=True)


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


# compat shims for callers that imported the old per-config entry points
def joint_linear():
    rows, n_gt = run_joint_linear()
    floors("joint_linear", rows, n_gt)
    return rows


def marginal_bge():
    rows, n_gt = run_marginal_bge()
    floors("marginal_bge", rows, n_gt)
    return rows


def main(argv=None):
    global INJECT

    ap = argparse.ArgumentParser()
    ap.add_argument("--record-golden", action="store_true",
                    help="run the reduced protocol and store the golden "
                         "medians (do this at a known-good HEAD)")
    ap.add_argument("--golden-configs", nargs="+", default=None,
                    help="with --record-golden: record only these configs, "
                         "merging into the existing golden file")
    ap.add_argument("--inject", choices=sorted(k for k in _INJECT_KW if k),
                    default=None,
                    help="inject a known regression — the gate must FAIL")
    ap.add_argument("--skip-canaries", action="store_true",
                    help="skip the kernel-numerics/scale canaries (used by "
                         "the injection proof, which targets the golden "
                         "gate)")
    args = ap.parse_args(argv)

    if args.record_golden:
        record_golden(only=args.golden_configs)
        return

    INJECT = args.inject
    if INJECT:
        print(f"[quality-gate] INJECTED REGRESSION: {INJECT} "
              "(the gate is expected to FAIL)", flush=True)

    t0 = time.perf_counter()
    golden = {}
    if os.path.exists(GOLDEN_PATH):
        with open(GOLDEN_PATH) as f:
            golden = json.load(f)

    rows, n_gt = run_joint_linear()
    floors("joint_linear", rows, n_gt)
    golden_compare("joint_linear", rows, golden)
    rows, n_gt = run_marginal_bge()
    floors("marginal_bge", rows, n_gt)
    golden_compare("marginal_bge", rows, golden)
    rows, n_gt = run_marginal_score_rb()
    floors("marginal_score_rb", rows, n_gt)
    golden_compare("marginal_score_rb", rows, golden)
    # d=128 row: golden-compare only (absolute floors are calibrated for
    # the converged d=12 protocol; this reduced row exists to catch
    # *regressions* in the large-d kernel tier, not to certify absolutes)
    rows, n_gt = run_marginal_bge_d128()
    golden_compare("marginal_bge_d128", rows, golden)
    if not args.skip_canaries:
        kernel_numerics()
        scale_robustness()
    dt = time.perf_counter() - t0
    if FAILURES:
        print(f"[quality-gate] FAILED ({len(FAILURES)} checks) in {dt:.0f}s")
        raise SystemExit(1)
    print(f"[quality-gate] all checks passed in {dt:.0f}s")


if __name__ == "__main__":
    main()
