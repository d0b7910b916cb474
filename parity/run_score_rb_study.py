"""score_rb study extension (VERDICT r3 item 6): 10 seeds + M-sweep.

Runs the beyond-reference Rao-Blackwellized marginal estimator
(``grad_estimator_z='score_rb'``) on the config-1 golden data at the full
2000-step protocol:

  * seeds 4-8 at M=128 (completing the 10-seed footing; seeds 0-3/123
    exist as ``_rb3`` files from round 3);
  * an M-sweep (n_grad_mc_samples 64 and 32, all 10 seeds) probing the
    variance-vs-M tradeoff — if M=64 matches M=128 quality, config-1
    throughput gains ~2x at equal quality (the determinant batch is the
    step's dominant cost and scales linearly in M).

ONE process (tunnel admits one client); skip-if-exists so it resumes.

Usage: python parity/run_score_rb_study.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
from jax import random

from run_ours_quality import RESULTS_DIR, build_config, metrics_for

SEEDS = (0, 1, 2, 3, 123, 4, 5, 6, 7, 8)
STEPS = 2000


def run_one(seed, m, suffix):
    out_path = os.path.join(RESULTS_DIR,
                            f"ours_cfg1_seed{seed}{suffix}.json")
    if os.path.exists(out_path):
        print(f"skip (exists): {out_path}", flush=True)
        return
    dibs, g_gt, x_ho, n_particles, extras = build_config(
        1, seed, grad_estimator_z="score_rb", n_grad_mc_samples=m)
    key = random.PRNGKey(seed)
    key, _ = random.split(key)
    key, _ = random.split(key)
    t0 = time.perf_counter()
    gs = dibs.sample(key=key, n_particles=n_particles, steps=STEPS)
    dists = {"empirical": dibs.get_empirical(gs),
             "mixture": dibs.get_mixture(gs)}
    wall = time.perf_counter() - t0
    result = {"config": 1, "seed": seed, "steps": STEPS,
              "n_particles": n_particles, "side": "dibs_tpu",
              "estimator": "score_rb", "n_grad_mc_samples": m,
              "wall_s": wall, "device": str(jax.devices()[0])}
    for name, dist in dists.items():
        result[name] = metrics_for(dist, g_gt, jnp.asarray(x_ho), dibs,
                                   "marginal")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(f"seed {seed} M={m}: mix auroc="
          f"{result['mixture']['auroc']:.3f} "
          f"eshd={result['mixture']['eshd']:.1f} wall={wall:.0f}s",
          flush=True)


def main():
    # complete the M=128 10-seed footing (suffix matches the r3 files)
    for seed in SEEDS:
        run_one(seed, 128, "_rb3")
    # M-sweep
    for m, suffix in ((64, "_rb3m64"), (32, "_rb3m32")):
        for seed in SEEDS:
            run_one(seed, m, suffix)
    print("score_rb study complete", flush=True)


if __name__ == "__main__":
    main()
