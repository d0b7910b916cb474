"""Centered-scoring validation on TPU — ONE process.

1. Scale-robustness sweep: joint linear d=12 reduced protocol at data
   scales {1, 10, 100, 1000}, 3 seeds each — with the centered (delta)
   scoring scheme the fused kernel's quality should hold at every scale
   (the pre-centered split-3 chain measured AUROC ~0.85 at 10x and the
   single-pass chain collapsed to 0.50; DESIGN.md §11f).
2. Throughput: configs 2, 4, 5 steps/s at HEAD (centered scoring replaces
   the 3-pass split that cfg4/cfg5's data scale forced pre-centering).

Results -> benchmarks/CENTERED_AB.json
"""
import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
from jax import random

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CENTERED_AB.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def metrics(dist, g_gt):
    from dibs_tpu.metrics import expected_shd, threshold_metrics

    eshd = float(expected_shd(dist=dist, g=g_gt))
    auroc = float(threshold_metrics(dist=dist, g=g_gt)["roc_auc"])
    return eshd, auroc


def scale_sweep(out):
    from dibs_tpu.inference import JointDiBS
    from dibs_tpu.target import make_linear_gaussian_model

    rows = []
    for scale in (1.0, 10.0, 100.0, 1000.0):
        for seed in (123, 7, 2026):
            key, subk = random.split(random.PRNGKey(seed))
            data, gm, lm = make_linear_gaussian_model(
                key=subk, n_vars=12, graph_prior_str="sf")
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                dibs = JointDiBS(x=data.x * scale, graph_model=gm,
                                 likelihood_model=lm)
            t0 = time.perf_counter()
            gs, thetas = dibs.sample(key=key, n_particles=12, steps=800)
            dt = time.perf_counter() - t0
            eshd, auroc = metrics(dibs.get_empirical(gs, thetas), data.g)
            rows.append({"scale": scale, "seed": seed, "eshd": eshd,
                         "auroc": auroc, "wall_s": round(dt, 1)})
            log(f"scale={scale:g} seed={seed}: auroc={auroc:.3f} "
                f"eshd={eshd:.1f} ({dt:.0f}s)")
    out["scale_sweep"] = rows


def throughput(out):
    from benchmarks.run_benchmarks import (
        config_2,
        config_4,
        config_5,
    )

    for name, fn in (("config_2", config_2), ("config_4", config_4),
                     ("config_5", config_5)):
        r = fn(quality=False)
        out[name] = {"steps_per_sec": r["steps_per_sec"]}
        log(f"{name}: {r['steps_per_sec']:.1f} steps/s")


def main():
    out = {"what": "centered-scoring scale sweep + throughput", "rows": {}}
    throughput(out)
    scale_sweep(out)
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    log(f"DONE -> {OUT}")


if __name__ == "__main__":
    main()
