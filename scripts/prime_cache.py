"""Pre-compile the fused TPU kernels for a list of shapes.

Usage:
    python scripts/prime_cache.py --d 20 30 --models joint_linear marginal_bge
    python scripts/prime_cache.py --d 20          # all three engines

Compiled programs land in the persistent XLA compilation cache, so a
first interactive run at these shapes starts instantly.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dibs_tpu.warmup import MODELS, warmup


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--d", type=int, nargs="+", required=True)
    ap.add_argument("--n-obs", type=int, default=100)
    ap.add_argument("--n-particles", type=int, default=30)
    ap.add_argument("--n-grad-mc-samples", type=int, default=128)
    ap.add_argument("--models", nargs="+", default=list(MODELS),
                    choices=list(MODELS))
    ap.add_argument("--hidden-layers", type=int, nargs="+", default=[5])
    args = ap.parse_args()
    warmup(args.d, n_obs=args.n_obs, n_particles=args.n_particles,
           n_grad_mc_samples=args.n_grad_mc_samples, models=args.models,
           hidden_layers=tuple(args.hidden_layers))


if __name__ == "__main__":
    main()
