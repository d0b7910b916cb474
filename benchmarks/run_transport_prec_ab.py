"""Transport-precision A/B on TPU — one process, three arms.

The SVGD transport's ``[P, P] @ [P, n]`` driver/repulsion matmuls run at
HIGHEST by default (6 MXU passes). At production scale (config 5: d=128,
P=1000) they are ~a quarter of the step; the knob
``dibs_tpu.config.set_transport_matmul_precision`` offers ``'high'``
(bf16x3, 3 passes, ~2^-17 relative) and ``'default'`` (bf16, 1 pass,
~2^-9). This suite measures, in ONE tunnel acquisition:

  1. config-5 steps/s at each precision  (the throughput question)
  2. the reduced d=20 quality protocol (800 steps, 3 seeds, joint linear)
     at 'high' and 'default' vs 'highest'  (the quality question)

Verdict rule for flipping the default: an arm must match 'highest' quality
(median AUROC within noise) to be recommended; otherwise it stays an
opt-in knob documented with these numbers.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jax import random

import dibs_tpu.config as config
from dibs_tpu.inference import JointDiBS
from dibs_tpu.metrics import expected_shd, threshold_metrics
from dibs_tpu.target import make_linear_gaussian_model
from run_benchmarks import config_5

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "TRANSPORT_PREC_AB.json")
ARMS = ("highest", "high", "default")
SEEDS = (9, 3, 17)


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    out = {"arms": {}, "note": "config-5 steps/s + reduced d=20 quality "
                               "per transport matmul precision"}

    k1, _ = random.split(random.PRNGKey(0))
    data, gm, lm = make_linear_gaussian_model(key=k1, n_vars=20,
                                              graph_prior_str="sf")

    for arm in ARMS:
        config.set_transport_matmul_precision(arm)
        try:
            res5 = config_5(False)
            log(f"[{arm}] config5 {res5['steps_per_sec']:.2f} steps/s "
                f"(compile {res5['compile_s']:.1f}s)")
            rows = []
            for seed in SEEDS:
                dibs = JointDiBS(x=data.x, graph_model=gm,
                                 likelihood_model=lm)
                gs, thetas = dibs.sample(key=random.PRNGKey(seed),
                                         n_particles=30, steps=800)
                dist = dibs.get_empirical(gs, thetas)
                auroc = float(threshold_metrics(dist=dist,
                                                g=data.g)["roc_auc"])
                eshd = float(expected_shd(dist=dist, g=data.g))
                rows.append({"seed": seed, "auroc": auroc, "eshd": eshd})
                log(f"  [{arm} seed={seed}] auroc={auroc:.3f} "
                    f"eshd={eshd:.1f}")
            out["arms"][arm] = {"config5": res5, "quality_d20": rows}
        finally:
            config.set_transport_matmul_precision("highest")
        with open(OUT, "w") as f:
            json.dump(out, f, indent=1)

    log(f"DONE -> {OUT}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
