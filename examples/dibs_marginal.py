"""Marginal DiBS example — mirrors /root/reference/examples/dibs_marginal.ipynb.

Infers the marginal posterior p(G | D) with the BGe score on a d=20
scale-free linear-Gaussian ground truth, then evaluates E-SHD / AUROC /
negative marginal log-likelihood for both the empirical (DiBS) and mixture
(DiBS+) particle distributions.

Run: python examples/dibs_marginal.py [--n_vars 20] [--steps 2000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax import random

# honor JAX_PLATFORMS even when a site plugin force-registers another
# backend after env parsing (e.g. tunneled-TPU images)
if os.environ.get("JAX_PLATFORMS"):
    try:
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

from dibs_tpu.inference import MarginalDiBS
from dibs_tpu.metrics import (
    expected_cpdag_shd,
    expected_shd,
    neg_ave_log_marginal_likelihood,
    threshold_metrics,
)
from dibs_tpu.target import make_linear_gaussian_equivalent_model


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_vars", type=int, default=20)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--n_particles", type=int, default=20)
    parser.add_argument("--graph_prior", default="sf", choices=["er", "sf"])
    parser.add_argument("--seed", type=int, default=123)
    args = parser.parse_args()

    key = random.PRNGKey(args.seed)
    key, subk = random.split(key)
    data, graph_model, likelihood_model = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=args.n_vars, graph_prior_str=args.graph_prior
    )
    print(f"ground truth: d={args.n_vars}, {int(data.g.sum())} edges")

    dibs = MarginalDiBS(
        x=data.x, graph_model=graph_model, likelihood_model=likelihood_model
    )
    key, subk = random.split(key)
    t0 = time.time()
    gs = dibs.sample(key=subk, n_particles=args.n_particles, steps=args.steps)
    print(f"SVGD: {args.steps} steps in {time.time() - t0:.1f}s")

    for name, dist in [("DiBS ", dibs.get_empirical(gs)),
                       ("DiBS+", dibs.get_mixture(gs))]:
        eshd = expected_shd(dist=dist, g=data.g)
        # observational BGe is identifiable only up to the Markov
        # equivalence class; the CPDAG-SHD does not charge orientations
        # the class leaves free
        cshd = expected_cpdag_shd(dist=dist, g=data.g)
        auroc = threshold_metrics(dist=dist, g=data.g)["roc_auc"]
        negll = neg_ave_log_marginal_likelihood(
            dist=dist,
            eltwise_log_marginal_likelihood=dibs.eltwise_log_marginal_likelihood_observ,
            x=data.x_ho,
        )
        print(f"{name} |  E-SHD: {float(eshd):5.1f}   "
              f"E-CPDAG-SHD: {float(cshd):5.1f}   AUROC: {auroc:4.2f}  "
              f"neg. MLL {float(negll):7.2f}")


if __name__ == "__main__":
    main()
