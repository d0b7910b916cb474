"""CONSTRAINT_MEAN_AB — the study `estimators.py` cites (VERDICT r4 item 1).

A/B of ``acyclicity_constraint='mean'`` (deterministic mean-field gradient
∇h(E[G]), zero MC samples) vs ``'sampled'`` (reference parity: E[∇h(G_soft)]
over kmc Gumbel-softmax samples, /root/reference/dibs/inference/dibs.py:576-601).

'mean' is a *biased* estimator of the reference's prior score — ∇h(E[G]) is
not E[∇h(G)] (Jensen gap on the nonconvex NOTEARS h) — so throughput wins
only count if quality holds. Three legs, each resumable (per-cell JSON under
``benchmarks/constraint_mean/``, skipped if present):

  --throughput       cfg1 / cfg5 / cfg6 steps/s, both arms, same data
  --quality-reduced  the two d=12 golden-gate configs x 5 seeds x both arms
                     (800 steps; the gate's own calibrated protocol)
  --quality-full     the d=20 cfg1/cfg2 protocol x 5 seeds x both arms
                     (2000 steps, 30 particles — the notebook protocol,
                     /root/reference/examples/dibs_marginal.ipynb cells 4-10)

Quality legs record #cyclic at convergence alongside E-SHD/AUROC because
the constraint estimator's job is exactly to anneal particles into DAGs;
a biased gradient that converges to the wrong place shows up there first.

  --aggregate        collect all cells into benchmarks/CONSTRAINT_MEAN_AB.json
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

from dibs_tpu.inference import JointDiBS, MarginalDiBS
from dibs_tpu.metrics import expected_shd, threshold_metrics
from dibs_tpu.models import BGe
from dibs_tpu.ops.acyclic import elwise_acyclic_constr
from dibs_tpu.target import (
    make_linear_gaussian_equivalent_model,
    make_linear_gaussian_model,
)

from run_benchmarks import time_steps_per_sec  # noqa: E402 (same dir)

CELL_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "constraint_mean")
OUT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "CONSTRAINT_MEAN_AB.json")
SEEDS = (123, 7, 2026, 11, 42)
ARMS = ("sampled", "mean")


def _cell(name):
    return os.path.join(CELL_DIR, f"{name}.json")


def _have(name):
    return os.path.exists(_cell(name))


def _write(name, obj):
    os.makedirs(CELL_DIR, exist_ok=True)
    obj["device"] = str(jax.devices()[0])
    with open(_cell(name), "w") as f:
        json.dump(obj, f, indent=2)
    print(json.dumps({"cell": name, **obj}), flush=True)


# ---------------------------------------------------------------- throughput

def throughput():
    """cfg1 / cfg5 / cfg6 steps/s in both arms on identical data."""
    key = random.PRNGKey(123)
    key, subk = random.split(key)

    # cfg1: marginal BGe d=20 ER, P=30, kmc=32 (run_benchmarks.config_1)
    data1, gm1, lm1 = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=20, graph_prior_str="er")
    # cfg5: joint linear d=128 sf, P=1000, M=32, kmc=8
    key, subk = random.split(random.PRNGKey(123))
    data5, gm5, lm5 = make_linear_gaussian_model(
        key=subk, n_vars=128, graph_prior_str="sf")
    # cfg6: marginal BGe d=128 sf, P=100, M=64, kmc=8
    key, subk = random.split(random.PRNGKey(123))
    data6, gm6, lm6 = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=128, graph_prior_str="sf")

    jobs = {
        "cfg1": lambda arm: (MarginalDiBS(
            x=data1.x, graph_model=gm1, likelihood_model=lm1,
            acyclicity_constraint=arm), 30, dict(chunk=50, repeats=4)),
        "cfg5": lambda arm: (JointDiBS(
            x=data5.x, graph_model=gm5, likelihood_model=lm5,
            n_grad_mc_samples=32, n_acyclicity_mc_samples=8,
            acyclicity_constraint=arm), 1000, dict(chunk=5, repeats=2)),
        "cfg6": lambda arm: (MarginalDiBS(
            x=data6.x, graph_model=gm6, likelihood_model=lm6,
            n_grad_mc_samples=64, n_acyclicity_mc_samples=8,
            acyclicity_constraint=arm), 100, dict(chunk=2, repeats=2)),
    }
    for cfg_name, build in jobs.items():
        for arm in ARMS:
            name = f"tput_{cfg_name}_{arm}"
            if _have(name):
                continue
            dibs, n_particles, kw = build(arm)
            sps, compile_s = time_steps_per_sec(dibs, n_particles, **kw)
            _write(name, {"steps_per_sec": sps, "compile_s": compile_s,
                          "arm": arm, "config": cfg_name})


# ---------------------------------------------------------------- quality

def _metrics(dist, g_gt):
    return (float(expected_shd(dist=dist, g=g_gt)),
            float(threshold_metrics(dist=dist, g=g_gt)["roc_auc"]))


def _n_cyclic(gs):
    h = elwise_acyclic_constr(jnp.asarray(gs), gs.shape[-1])
    return int((h > 0).sum())


def quality_reduced():
    """The quality gate's two d=12 configs (scripts/quality_gate.py),
    800 steps, 5 seeds, both arms."""
    for seed in SEEDS:
        for arm in ARMS:
            name = f"qred_joint_seed{seed}_{arm}"
            if not _have(name):
                key, subk = random.split(random.PRNGKey(seed))
                data, gm, lm = make_linear_gaussian_model(
                    key=subk, n_vars=12, graph_prior_str="sf")
                dibs = JointDiBS(x=data.x, graph_model=gm,
                                 likelihood_model=lm,
                                 acyclicity_constraint=arm)
                t0 = time.perf_counter()
                gs, thetas = dibs.sample(key=key, n_particles=12, steps=800)
                wall = time.perf_counter() - t0
                e_sh, e_au = _metrics(dibs.get_empirical(gs, thetas), data.g)
                m_sh, m_au = _metrics(dibs.get_mixture(gs, thetas), data.g)
                _write(name, {
                    "seed": seed, "arm": arm, "config": "joint_linear_d12",
                    "emp_eshd": e_sh, "emp_auroc": e_au,
                    "mix_eshd": m_sh, "mix_auroc": m_au,
                    "n_cyclic": _n_cyclic(gs), "n_particles": 12,
                    "n_gt_edges": int(data.g.sum()), "wall_s": wall})

            name = f"qred_marg_seed{seed}_{arm}"
            if not _have(name):
                key, subk = random.split(random.PRNGKey(seed))
                data, gm, _ = make_linear_gaussian_equivalent_model(
                    key=subk, n_vars=12, graph_prior_str="er")
                dibs = MarginalDiBS(x=data.x, graph_model=gm,
                                    likelihood_model=BGe(n_vars=12),
                                    acyclicity_constraint=arm)
                t0 = time.perf_counter()
                gs = dibs.sample(key=key, n_particles=12, steps=800)
                wall = time.perf_counter() - t0
                e_sh, e_au = _metrics(dibs.get_empirical(gs), data.g)
                m_sh, m_au = _metrics(dibs.get_mixture(gs), data.g)
                _write(name, {
                    "seed": seed, "arm": arm, "config": "marginal_bge_d12",
                    "emp_eshd": e_sh, "emp_auroc": e_au,
                    "mix_eshd": m_sh, "mix_auroc": m_au,
                    "n_cyclic": _n_cyclic(gs), "n_particles": 12,
                    "n_gt_edges": int(data.g.sum()), "wall_s": wall})


def quality_full():
    """Full d=20 protocol (2000 steps, 30 particles) on the cfg1/cfg2
    shapes, 5 seeds, both arms."""
    for seed in SEEDS:
        for arm in ARMS:
            name = f"qfull_cfg1_seed{seed}_{arm}"
            if not _have(name):
                key, subk = random.split(random.PRNGKey(seed))
                data, gm, lm = make_linear_gaussian_equivalent_model(
                    key=subk, n_vars=20, graph_prior_str="er")
                dibs = MarginalDiBS(x=data.x, graph_model=gm,
                                    likelihood_model=lm,
                                    acyclicity_constraint=arm)
                t0 = time.perf_counter()
                gs = dibs.sample(key=key, n_particles=30, steps=2000)
                wall = time.perf_counter() - t0
                e_sh, e_au = _metrics(dibs.get_empirical(gs), data.g)
                m_sh, m_au = _metrics(dibs.get_mixture(gs), data.g)
                _write(name, {
                    "seed": seed, "arm": arm, "config": "marginal_bge_d20_er",
                    "emp_eshd": e_sh, "emp_auroc": e_au,
                    "mix_eshd": m_sh, "mix_auroc": m_au,
                    "n_cyclic": _n_cyclic(gs), "n_particles": 30,
                    "n_gt_edges": int(data.g.sum()), "wall_s": wall})

            name = f"qfull_cfg2_seed{seed}_{arm}"
            if not _have(name):
                key, subk = random.split(random.PRNGKey(seed))
                data, gm, lm = make_linear_gaussian_model(
                    key=subk, n_vars=20, graph_prior_str="sf")
                dibs = JointDiBS(x=data.x, graph_model=gm,
                                 likelihood_model=lm,
                                 acyclicity_constraint=arm)
                t0 = time.perf_counter()
                gs, thetas = dibs.sample(key=key, n_particles=30, steps=2000)
                wall = time.perf_counter() - t0
                e_sh, e_au = _metrics(dibs.get_empirical(gs, thetas), data.g)
                m_sh, m_au = _metrics(dibs.get_mixture(gs, thetas), data.g)
                _write(name, {
                    "seed": seed, "arm": arm,
                    "config": "joint_lingauss_d20_sf",
                    "emp_eshd": e_sh, "emp_auroc": e_au,
                    "mix_eshd": m_sh, "mix_auroc": m_au,
                    "n_cyclic": _n_cyclic(gs), "n_particles": 30,
                    "n_gt_edges": int(data.g.sum()), "wall_s": wall})


# ---------------------------------------------------------------- aggregate

def _med(rows, k):
    return statistics.median(r[k] for r in rows)


def aggregate():
    cells = {}
    for fn in sorted(os.listdir(CELL_DIR)):
        if fn.endswith(".json"):
            with open(os.path.join(CELL_DIR, fn)) as f:
                cells[fn[:-5]] = json.load(f)

    out = {"throughput": {}, "quality_reduced": {}, "quality_full": {},
           "seeds": list(SEEDS)}
    for cfg in ("cfg1", "cfg5", "cfg6"):
        pair = {}
        for arm in ARMS:
            c = cells.get(f"tput_{cfg}_{arm}")
            if c:
                pair[arm] = round(c["steps_per_sec"], 2)
        if len(pair) == 2:
            pair["speedup"] = round(pair["mean"] / pair["sampled"], 3)
        out["throughput"][cfg] = pair

    for leg, prefix_cfgs in (
            ("quality_reduced", [("qred_joint", "joint_linear_d12"),
                                 ("qred_marg", "marginal_bge_d12")]),
            ("quality_full", [("qfull_cfg1", "marginal_bge_d20_er"),
                              ("qfull_cfg2", "joint_lingauss_d20_sf")])):
        for prefix, cfg_name in prefix_cfgs:
            per_arm = {}
            for arm in ARMS:
                rows = [cells[f"{prefix}_seed{s}_{arm}"] for s in SEEDS
                        if f"{prefix}_seed{s}_{arm}" in cells]
                if not rows:
                    continue
                per_arm[arm] = {
                    "n_seeds": len(rows),
                    "median": {k: round(_med(rows, k), 3) for k in
                               ("emp_eshd", "emp_auroc", "mix_eshd",
                                "mix_auroc")},
                    "n_cyclic": [r["n_cyclic"] for r in rows],
                    "rows": [{k: r[k] for k in
                              ("seed", "emp_eshd", "emp_auroc", "mix_eshd",
                               "mix_auroc", "n_cyclic")} for r in rows],
                }
            out[leg][cfg_name] = per_arm

    with open(OUT_PATH, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--throughput", action="store_true")
    ap.add_argument("--quality-reduced", action="store_true")
    ap.add_argument("--quality-full", action="store_true")
    ap.add_argument("--aggregate", action="store_true")
    args = ap.parse_args()
    if args.throughput:
        throughput()
    if args.quality_reduced:
        quality_reduced()
    if args.quality_full:
        quality_full()
    if args.aggregate:
        aggregate()


if __name__ == "__main__":
    main()
