"""cfg6 quality leg — marginal BGe at d=128 (VERDICT r4 item 3).

cfg6 (marginal BGe, d=128, P=100, M=64) had throughput evidence only: the
819k-determinant-pairs-per-step Pallas elimination kernel is 48x the
chunked-Cholesky XLA path, but nothing showed the approximate determinants
recover structure over thousands of steps. Two resumable legs (cells under
``benchmarks/cfg6_quality/``):

  --full    kernel arm at the full cfg6 shape (P=100, M=64), N=512
            observations (N=100 rows underdetermine d=128 — round-1 note),
            1200 steps, 3 seeds: E-SHD / AUROC / #cyclic vs ground truth.

  --ab      controlled determinant-path pair at a reduced batch (P=20,
            M=16, same d=128/N=512/steps): arm 'kernel' vs arm 'xla', where
            the ONLY difference is ops/bge_kernel._MAX_D forced to 0 so
            ``bge_pallas_available`` routes the determinant batch to the
            exact chunked-Cholesky path (everything else — samplers,
            transport, estimator — identical). The full-batch XLA arm would
            take ~4 h/run (that 48x); the reduced batch keeps the pair
            feasible while exercising the same [128, 128] eliminations.

  --anchor  reference-CPU timing anchor at d=128: steps/s of the actual
            reference implementation (igraph shim, parity/refload.py) on a
            short run — fills the cfg6 baseline column the README table
            left blank. Match: /root/reference/dibs/models/linearGaussian.py:63-144.

  --aggregate  collect to benchmarks/CFG6_QUALITY.json.
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random

CELL_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "cfg6_quality")
OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CFG6_QUALITY.json")
SEEDS = (123, 7, 2026)
D, N_OBS, STEPS = 128, 512, 1200


def _cell(name):
    return os.path.join(CELL_DIR, f"{name}.json")


def _write(name, obj):
    os.makedirs(CELL_DIR, exist_ok=True)
    obj["device"] = str(jax.devices()[0])
    with open(_cell(name), "w") as f:
        json.dump(obj, f, indent=2)
    print(json.dumps({"cell": name, **obj}), flush=True)


def _run_one(seed, n_particles, m, det_path, steps=STEPS, **dibs_kw):
    from dibs_tpu.inference import MarginalDiBS
    from dibs_tpu.metrics import expected_shd, threshold_metrics
    from dibs_tpu.ops.acyclic import elwise_acyclic_constr
    from dibs_tpu.target import make_linear_gaussian_equivalent_model

    import dibs_tpu.ops.bge_kernel as bk

    old_max_d = bk._MAX_D
    bk._MAX_D = 0 if det_path == "xla" else old_max_d
    try:
        key, subk = random.split(random.PRNGKey(seed))
        data, gm, lm = make_linear_gaussian_equivalent_model(
            key=subk, n_vars=D, graph_prior_str="sf", n_observations=N_OBS,
            n_ho_observations=10)
        dibs = MarginalDiBS(x=data.x, graph_model=gm, likelihood_model=lm,
                            n_grad_mc_samples=m, n_acyclicity_mc_samples=8,
                            **dibs_kw)
        t0 = time.perf_counter()
        gs = dibs.sample(key=key, n_particles=n_particles, steps=steps)
        wall = time.perf_counter() - t0
        h = elwise_acyclic_constr(jnp.asarray(gs), D)
        out = {"seed": seed, "det_path": det_path, "steps": steps,
               **{f"dibs_{k}": str(v) for k, v in dibs_kw.items()},
               "n_particles": n_particles, "m": m, "n_obs": N_OBS,
               "n_gt_edges": int(data.g.sum()),
               "n_cyclic": int((h > 0).sum()), "wall_s": round(wall, 1)}
        for dist_name, dist in (("empirical", dibs.get_empirical(gs)),
                                ("mixture", dibs.get_mixture(gs))):
            out[f"{dist_name}_eshd"] = float(
                expected_shd(dist=dist, g=data.g))
            out[f"{dist_name}_auroc"] = float(
                threshold_metrics(dist=dist, g=data.g)["roc_auc"])
        return out
    finally:
        bk._MAX_D = old_max_d


def full():
    for seed in SEEDS:
        name = f"full_seed{seed}"
        if not os.path.exists(_cell(name)):
            _write(name, _run_one(seed, n_particles=100, m=64,
                                  det_path="kernel"))


def full_followups():
    """Two follow-ups to the full leg's findings:

    - ``full2000_seed7``: seed 7 ended 1200 steps with ALL 100 particles
      cyclic (the annealed beta(t) had not yet forced DAG-ness at this
      seed's initialization). Re-run at 2000 steps to measure whether the
      failure is a schedule-length effect (late annealing) or divergence.
    - ``full_rb_seed*``: the same protocol under ``score_rb`` (the
      Rao-Blackwellized estimator the repo documents as recommended for
      marginal inference) — its per-node baselines cut REINFORCE variance
      where it is largest (16k-edge score surface at d=128).
    """
    name = "full2000_seed7"
    if not os.path.exists(_cell(name)):
        _write(name, _run_one(7, n_particles=100, m=64,
                              det_path="kernel", steps=2000))
    for seed in SEEDS:
        name = f"full_rb_seed{seed}"
        if not os.path.exists(_cell(name)):
            _write(name, _run_one(seed, n_particles=100, m=64,
                                  det_path="kernel",
                                  grad_estimator_z="score_rb"))


def ab():
    for seed in SEEDS:
        for det_path in ("kernel", "xla"):
            name = f"ab_{det_path}_seed{seed}"
            if not os.path.exists(_cell(name)):
                _write(name, _run_one(seed, n_particles=20, m=16,
                                      det_path=det_path))


def anchor(n_steps=2, n_particles=10):
    """Times the actual reference at the cfg6 shape on host CPU.

    Runs at a reduced particle count and extrapolates linearly to the
    full P=100: the reference's per-step cost is vmap-linear in particles
    (every estimator maps over the particle axis, dibs.py:321/650; the
    only super-linear term, the [P, P] SVGD kernel over d*k*2 = 32k
    features, is <1e-3 of the P*M*d = 819k [128, 128] slogdets at this
    shape). Measured necessity, not convenience: at P=100 the reference's
    d=128 trace+compile exceeded 103 GB RSS on this 125 GB / 1-core host
    (killed before OOM); P=10 keeps the XLA CPU program tractable.
    """
    name = "reference_anchor"
    if os.path.exists(_cell(name)):
        return
    jax.config.update("jax_platforms", "cpu")  # reference-CPU baseline
    from parity.refload import load_reference

    load_reference()
    from dibs.inference import MarginalDiBS as RefMarginalDiBS
    from dibs.target import (
        make_linear_gaussian_equivalent_model as ref_make_model,
    )

    key = random.PRNGKey(123)
    key, subk = random.split(key)
    data, graph_model, lik_model = ref_make_model(
        key=subk, n_vars=D, n_observations=N_OBS, n_ho_observations=10,
        graph_prior_str="sf")
    dibs = RefMarginalDiBS(x=data.x, graph_model=graph_model,
                           likelihood_model=lik_model,
                           n_grad_mc_samples=64,
                           n_acyclicity_mc_samples=8)
    t0 = time.perf_counter()
    dibs.sample(key=key, n_particles=n_particles, steps=n_steps)
    wall = time.perf_counter() - t0
    # the reference has no compile/run split in its API; charging the
    # one-off trace to these steps makes steps/s a LOWER bound on the
    # reference (i.e. our speedup column derived from it is conservative
    # in the reference's favor)
    sps = n_steps / wall
    _write(name, {"steps": n_steps, "wall_s": round(wall, 1),
                  "n_particles": n_particles, "m": 64, "device": "cpu",
                  "ref_steps_per_sec_lower_bound_at_p": sps,
                  "ref_steps_per_sec_lower_bound_p100_extrapolated":
                      sps * n_particles / 100.0,
                  "note": "wall includes the reference's one-off jit "
                          "trace (lower bound, conservative in the "
                          "reference's favor); P=100 column is the "
                          "linear-in-particles extrapolation from "
                          f"P={n_particles} (see docstring)"})


def _med(rows, k):
    return statistics.median(r[k] for r in rows)


def aggregate():
    cells = {}
    for fn in sorted(os.listdir(CELL_DIR)):
        if fn.endswith(".json"):
            with open(os.path.join(CELL_DIR, fn)) as f:
                cells[fn[:-5]] = json.load(f)
    out = {"seeds": list(SEEDS), "protocol": {
        "d": D, "n_obs": N_OBS, "steps": STEPS}}
    full_rows = [cells[f"full_seed{s}"] for s in SEEDS
                 if f"full_seed{s}" in cells]
    if full_rows:
        out["full_kernel_arm"] = {
            "median": {k: round(_med(full_rows, k), 3) for k in
                       ("empirical_eshd", "empirical_auroc", "mixture_eshd",
                        "mixture_auroc")},
            "n_cyclic": [r["n_cyclic"] for r in full_rows],
            "rows": full_rows,
        }
    rb_rows = [cells[f"full_rb_seed{s}"] for s in SEEDS
               if f"full_rb_seed{s}" in cells]
    if rb_rows:
        out["full_score_rb_arm"] = {
            "median": {k: round(_med(rb_rows, k), 3) for k in
                       ("empirical_eshd", "empirical_auroc", "mixture_eshd",
                        "mixture_auroc")},
            "n_cyclic": [r["n_cyclic"] for r in rb_rows],
            "rows": rb_rows,
        }
    if "full2000_seed7" in cells:
        out["full2000_seed7"] = cells["full2000_seed7"]
    for arm in ("kernel", "xla"):
        rows = [cells[f"ab_{arm}_seed{s}"] for s in SEEDS
                if f"ab_{arm}_seed{s}" in cells]
        if rows:
            out[f"ab_{arm}"] = {
                "median": {k: round(_med(rows, k), 3) for k in
                           ("empirical_eshd", "empirical_auroc",
                            "mixture_eshd", "mixture_auroc")},
                "rows": rows,
            }
    if "reference_anchor" in cells:
        out["reference_anchor"] = cells["reference_anchor"]
    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--full-followups", action="store_true")
    ap.add_argument("--ab", action="store_true")
    ap.add_argument("--anchor", action="store_true")
    ap.add_argument("--aggregate", action="store_true")
    args = ap.parse_args()
    if args.full:
        full()
    if args.full_followups:
        full_followups()
    if args.ab:
        ab()
    if args.anchor:
        anchor()
    if args.aggregate:
        aggregate()


if __name__ == "__main__":
    main()
