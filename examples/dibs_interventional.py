"""Interventional DiBS example — BASELINE.md config 4.

Joint inference from a mix of observational and hard-interventional data:
the interventional sets from the synthetic target are stacked into one data
matrix with a per-entry intervention mask, which the likelihood excludes
from the score (clamped nodes carry no information about their mechanisms).

Run: python examples/dibs_interventional.py [--n_vars 30] [--steps 2000]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp

# honor JAX_PLATFORMS even when a site plugin force-registers another
# backend after env parsing (e.g. tunneled-TPU images)
if os.environ.get("JAX_PLATFORMS"):
    try:
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass
from jax import random

from dibs_tpu.inference import JointDiBS
from dibs_tpu.metrics import expected_shd, threshold_metrics
from dibs_tpu.ops.ancestral import interv_to_vectors
from dibs_tpu.target import make_linear_gaussian_model


def stack_interventional(data, n_sets=5):
    """Stacks observational + first ``n_sets`` interventional sets into
    ``(x, interv_mask)``."""
    xs = [data.x]
    masks = [jnp.zeros_like(data.x, dtype=jnp.int32)]
    for interv, x_int in data.x_interv[:n_sets]:
        mask_vec, _ = interv_to_vectors(interv, data.n_vars)
        xs.append(x_int)
        masks.append(
            jnp.broadcast_to(mask_vec.astype(jnp.int32), x_int.shape)
        )
    return jnp.concatenate(xs, axis=0), jnp.concatenate(masks, axis=0)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n_vars", type=int, default=30)
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--n_particles", type=int, default=20)
    parser.add_argument("--seed", type=int, default=123)
    args = parser.parse_args()

    key = random.PRNGKey(args.seed)
    key, subk = random.split(key)
    data, graph_model, likelihood_model = make_linear_gaussian_model(
        key=subk, n_vars=args.n_vars, graph_prior_str="sf"
    )
    x_all, interv_mask = stack_interventional(data)
    print(f"d={args.n_vars}, {int(data.g.sum())} edges, "
          f"{x_all.shape[0]} rows ({int(interv_mask.sum())} intervened entries)")

    dibs = JointDiBS(
        x=x_all, interv_mask=interv_mask, graph_model=graph_model,
        likelihood_model=likelihood_model,
    )
    key, subk = random.split(key)
    t0 = time.time()
    gs, thetas = dibs.sample(
        key=subk, n_particles=args.n_particles, steps=args.steps
    )
    print(f"SVGD: {args.steps} steps in {time.time() - t0:.1f}s")

    dist = dibs.get_mixture(gs, thetas)
    print(f"E-SHD {float(expected_shd(dist=dist, g=data.g)):.1f}  "
          f"AUROC {threshold_metrics(dist=dist, g=data.g)['roc_auc']:.3f}")


if __name__ == "__main__":
    main()
