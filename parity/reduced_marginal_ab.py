"""A/B the marginal-BGe score path at a reduced config: actual reference vs
dibs-tpu on IDENTICAL data (d=12, P=12, 800 steps — the tests/test_quality.py
setup that scored AUROC 0.63). Answers: is the weak marginal posterior
inherent to DiBS's score-function estimator, or a dibs-tpu bug?

Runs on CPU (reference via the igraph shim). Usage:
    python parity/reduced_marginal_ab.py [--steps 800] [--seed 123]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from parity.refload import load_reference  # noqa: E402

load_reference()

import numpy as onp  # noqa: E402
from jax import random  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--n-vars", type=int, default=12)
    p.add_argument("--n-particles", type=int, default=12)
    args = p.parse_args()

    key, subk = random.split(random.PRNGKey(args.seed))

    # --- generate ONE dataset with dibs-tpu's generator ---
    from dibs_tpu.target import make_linear_gaussian_equivalent_model

    data, _, _ = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=args.n_vars, graph_prior_str="er"
    )
    x, g_gt = onp.asarray(data.x), onp.asarray(data.g)

    results = {}
    for side in ("reference", "dibs_tpu"):
        if side == "reference":
            from dibs.inference import MarginalDiBS as M
            from dibs.metrics import expected_shd, threshold_metrics
            from dibs.models import BGe, ErdosReniDAGDistribution
        else:
            from dibs_tpu.inference import MarginalDiBS as M
            from dibs_tpu.metrics import expected_shd, threshold_metrics
            from dibs_tpu.models import BGe, ErdosReniDAGDistribution

        gm = ErdosReniDAGDistribution(args.n_vars, n_edges_per_node=2)
        dibs = M(x=x, graph_model=gm,
                 likelihood_model=BGe(n_vars=args.n_vars))
        gs = dibs.sample(key=key, n_particles=args.n_particles,
                         steps=args.steps)
        out = {}
        for name, dist in (("empirical", dibs.get_empirical(gs)),
                           ("mixture", dibs.get_mixture(gs))):
            out[name] = {
                "eshd": float(expected_shd(dist=dist, g=g_gt)),
                "auroc": float(
                    threshold_metrics(dist=dist, g=g_gt)["roc_auc"]),
            }
        results[side] = out
        print(side, json.dumps(out), flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
