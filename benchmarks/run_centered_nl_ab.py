"""Centered-scoring scale sweep for the NONLINEAR fused kernel — ONE
process, both arms.

Mirrors run_centered_ab/run_centered_control for DenseNonlinearGaussian:
joint nonlinear d=12 reduced protocol at data scales {1, 10, 100},
3 seeds each, fused kernel vs exact XLA estimators on identical data.
Decides whether the nonlinear first-layer centering (round 3c) retires
the extreme-scale advisory the way the linear centering did.

Also records config-3 steps/s at HEAD (regression check for the centered
forward's extra reference tiles).

Results -> benchmarks/CENTERED_NL_AB.json
"""
import json
import os
import sys
import time
import warnings

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax import random

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CENTERED_NL_AB.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def run_arm(fused: bool, rows):
    import dibs_tpu.config as config
    from dibs_tpu.inference import JointDiBS
    from dibs_tpu.metrics import expected_shd, threshold_metrics
    from dibs_tpu.target import make_nonlinear_gaussian_model

    config.set_pallas_enabled(None if fused else False)
    arm = "fused" if fused else "xla"
    try:
        for scale in (1.0, 10.0, 100.0):
            for seed in (123, 7, 2026):
                key, subk = random.split(random.PRNGKey(seed))
                data, gm, lm = make_nonlinear_gaussian_model(
                    key=subk, n_vars=12, graph_prior_str="sf",
                    hidden_layers=(5,))
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore")
                    dibs = JointDiBS(x=data.x * scale, graph_model=gm,
                                     likelihood_model=lm)
                t0 = time.perf_counter()
                gs, thetas = dibs.sample(key=key, n_particles=12, steps=800)
                dt = time.perf_counter() - t0
                dist = dibs.get_empirical(gs, thetas)
                eshd = float(expected_shd(dist=dist, g=data.g))
                auroc = float(
                    threshold_metrics(dist=dist, g=data.g)["roc_auc"])
                rows.append({"arm": arm, "scale": scale, "seed": seed,
                             "eshd": eshd, "auroc": auroc,
                             "wall_s": round(dt, 1)})
                log(f"{arm} scale={scale:g} seed={seed}: auroc={auroc:.3f} "
                    f"eshd={eshd:.1f} ({dt:.0f}s)")
    finally:
        config.set_pallas_enabled(None)


def main():
    out = {"what": "nonlinear centered-scoring scale sweep", "rows": []}

    from benchmarks.run_benchmarks import config_3

    r = config_3(quality=False)
    out["config_3_steps_per_sec"] = r["steps_per_sec"]
    log(f"config_3: {r['steps_per_sec']:.1f} steps/s")

    run_arm(True, out["rows"])
    run_arm(False, out["rows"])
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
    log(f"DONE -> {OUT}")


if __name__ == "__main__":
    main()
