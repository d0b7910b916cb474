"""XLA-estimator control arm for the centered-scoring scale sweep.

Same protocol as run_centered_ab.scale_sweep but with the fused Pallas
paths disabled (exact XLA estimators) — the apples-to-apples control that
separates 'fused kernel loses fidelity at scale' from 'the inference
problem itself changes with scale' (obs_noise misspecification).

Results -> benchmarks/CENTERED_CONTROL.json
"""
import json
import os
import sys
import time
import warnings

os.environ["DIBS_DISABLE_PALLAS"] = "1"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax import random

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "CENTERED_CONTROL.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    from dibs_tpu.inference import JointDiBS
    from dibs_tpu.metrics import expected_shd, threshold_metrics
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
            dist = dibs.get_empirical(gs, thetas)
            eshd = float(expected_shd(dist=dist, g=data.g))
            auroc = float(threshold_metrics(dist=dist, g=data.g)["roc_auc"])
            rows.append({"scale": scale, "seed": seed, "eshd": eshd,
                         "auroc": auroc, "wall_s": round(dt, 1)})
            log(f"XLA scale={scale:g} seed={seed}: auroc={auroc:.3f} "
                f"eshd={eshd:.1f} ({dt:.0f}s)")
    with open(OUT, "w") as f:
        json.dump({"what": "XLA control for centered sweep", "rows": rows},
                  f, indent=1)
    log(f"DONE -> {OUT}")


if __name__ == "__main__":
    main()
