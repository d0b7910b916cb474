"""dibs-tpu side of the golden end-to-end comparison.

Loads the synthetic data saved by parity/run_reference_quality.py (so both
frameworks infer on *identical* observations and are scored against the same
ground-truth DAG), runs dibs-tpu inference with the reference protocol, and
records the same metric set (E-SHD / AUROC / neg (M)LL, for both the
empirical and the DiBS+ mixture posterior).

Usage:
    python parity/run_ours_quality.py --config 1 --seed 123 --steps 2000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as onp  # noqa: E402
from jax import random  # noqa: E402

from dibs_tpu.inference import JointDiBS, MarginalDiBS  # noqa: E402
from dibs_tpu.metrics import (  # noqa: E402
    expected_shd,
    neg_ave_log_likelihood,
    neg_ave_log_marginal_likelihood,
    threshold_metrics,
)
from dibs_tpu.models import (  # noqa: E402
    BGe,
    DenseNonlinearGaussian,
    LinearGaussian,
)
from dibs_tpu.target import make_graph_model  # noqa: E402

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def build_config(idx, seed, grad_estimator_z=None, n_grad_mc_samples=None):
    """Builds dibs-tpu models on the reference-generated data."""
    path = os.path.join(RESULTS_DIR, f"data_cfg{idx}_seed{seed}.npz")
    if not os.path.exists(path):
        raise SystemExit(
            f"{path} missing — run parity/run_reference_quality.py first")
    payload = onp.load(path)
    x, x_ho, g = payload["x"], payload["x_ho"], payload["g"]
    n_vars = int(payload["n_vars"])

    if idx == 1:
        gm = make_graph_model(n_vars=n_vars, graph_prior_str="er")
        kw = {}
        if grad_estimator_z:
            kw["grad_estimator_z"] = grad_estimator_z
        if n_grad_mc_samples:
            kw["n_grad_mc_samples"] = n_grad_mc_samples
        dibs = MarginalDiBS(x=x, graph_model=gm,
                            likelihood_model=BGe(n_vars=n_vars), **kw)
        return dibs, g, x_ho, 30, {"kind": "marginal"}
    if idx == 2:
        gm = make_graph_model(n_vars=n_vars, graph_prior_str="sf")
        dibs = JointDiBS(x=x, graph_model=gm,
                         likelihood_model=LinearGaussian(n_vars=n_vars))
        return dibs, g, x_ho, 30, {"kind": "joint"}
    if idx == 3:
        gm = make_graph_model(n_vars=n_vars, graph_prior_str="sf")
        dibs = JointDiBS(
            x=x, graph_model=gm,
            likelihood_model=DenseNonlinearGaussian(
                n_vars=n_vars, hidden_layers=(5,)),
        )
        return dibs, g, x_ho, 30, {"kind": "joint"}
    if idx == 4:
        gm = make_graph_model(n_vars=n_vars, graph_prior_str="sf")
        dibs = JointDiBS(
            x=payload["x_all"],
            interv_mask=payload["interv_mask"],
            graph_model=gm,
            likelihood_model=LinearGaussian(n_vars=n_vars),
        )
        return dibs, g, x_ho, 20, {"kind": "joint"}
    raise ValueError(idx)


def metrics_for(dist, g_gt, x_ho, dibs, kind):
    from dibs_tpu.metrics import expected_cpdag_shd

    out = {
        "eshd": float(expected_shd(dist=dist, g=g_gt)),
        "auroc": float(threshold_metrics(dist=dist, g=g_gt)["roc_auc"]),
        # equivalence-class recovery (beyond-reference metric; recorded on
        # both sides of the comparison from round 3 on)
        "cpdag_eshd": float(expected_cpdag_shd(dist=dist, g=g_gt)),
    }
    if kind == "marginal":
        out["neg_mll"] = float(neg_ave_log_marginal_likelihood(
            dist=dist,
            eltwise_log_marginal_likelihood=dibs.eltwise_log_marginal_likelihood_observ,
            x=jnp.asarray(x_ho),
        ))
    else:
        out["neg_ll"] = float(neg_ave_log_likelihood(
            dist=dist,
            eltwise_log_likelihood=dibs.eltwise_log_likelihood_observ,
            x=jnp.asarray(x_ho),
        ))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, required=True)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--out-suffix", type=str, default="",
                   help="suffix for the result file (e.g. _r3)")
    p.add_argument("--grad-estimator-z", type=str, default=None,
                   help="override the Z gradient estimator "
                        "(config 1 only; e.g. score_rb)")
    args = p.parse_args()

    dibs, g_gt, x_ho, n_particles, extras = build_config(
        args.config, args.seed, args.grad_estimator_z)
    kind = extras["kind"]

    # same key protocol as the reference-side script: PRNGKey(seed), one
    # split consumed by data generation (already done), sample with the rest
    key = random.PRNGKey(args.seed)
    key, _ = random.split(key)
    key, k_timing = random.split(key)

    t0 = time.perf_counter()
    if kind == "marginal":
        gs = dibs.sample(key=key, n_particles=n_particles, steps=args.steps)
        dists = {"empirical": dibs.get_empirical(gs),
                 "mixture": dibs.get_mixture(gs)}
    else:
        gs, thetas = dibs.sample(key=key, n_particles=n_particles,
                                 steps=args.steps)
        dists = {"empirical": dibs.get_empirical(gs, thetas),
                 "mixture": dibs.get_mixture(gs, thetas)}
    wall = time.perf_counter() - t0

    result = {
        "config": args.config,
        "seed": args.seed,
        "steps": args.steps,
        "n_particles": n_particles,
        "side": "dibs_tpu",
        "wall_s": wall,
        "device": str(jax.devices()[0]),
    }
    for name, dist in dists.items():
        result[name] = metrics_for(dist, g_gt, x_ho, dibs, kind)

    # per-particle diagnostics (outlier root-cause support, VERDICT r2
    # weak-item 2): held-out log-lik, SHD, and acyclicity per particle
    from dibs_tpu.metrics import pairwise_structural_hamming_distance
    from dibs_tpu.ops.acyclic import elwise_acyclic_constr

    if kind == "marginal":
        per_ll = dibs.eltwise_log_marginal_likelihood_observ(
            jnp.asarray(gs), jnp.asarray(x_ho))
    else:
        per_ll = dibs.eltwise_log_likelihood_observ(
            jnp.asarray(gs), thetas, jnp.asarray(x_ho))
    shd = pairwise_structural_hamming_distance(
        x=jnp.asarray(gs), y=jnp.asarray(g_gt)[None])[:, 0]
    h = elwise_acyclic_constr(jnp.asarray(gs), gs.shape[-1])
    result["per_particle"] = {
        "holdout_ll": [float(v) for v in per_ll],
        "shd": [float(v) for v in shd],
        "cyclic": [bool(v) for v in (h > 0)],
    }

    out_path = os.path.join(
        RESULTS_DIR,
        f"ours_cfg{args.config}_seed{args.seed}{args.out_suffix}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
