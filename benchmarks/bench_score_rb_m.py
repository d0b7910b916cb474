"""Throughput side of the score_rb M-sweep (VERDICT r3 item 6).

The quality study (parity/run_score_rb_study.py) shows M=64 matches
M=128 quality within noise on the 10-seed config-1 protocol. This bench
prices the lever: config-1-shape steps/s for the parity-default `score`
estimator (M=128) and `score_rb` at M in {128, 64, 32}. The marginal
step's dominant cost is the BGe determinant batch, which scales
linearly in n_grad_mc_samples (reference knob:
/root/reference/dibs/inference/dibs.py:325-391).

Usage: python benchmarks/bench_score_rb_m.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jax import random

from dibs_tpu import MarginalDiBS, BGe
from dibs_tpu.target import make_linear_gaussian_equivalent_model
from run_benchmarks import time_steps_per_sec


def main():
    key = random.PRNGKey(123)
    key, subk = random.split(key)
    data, gm, lm = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=20, graph_prior_str="er")

    arms = [("score", 128), ("score_rb", 128), ("score_rb", 64),
            ("score_rb", 32)]
    rows = []
    for est, m in arms:
        dibs = MarginalDiBS(x=data.x, graph_model=gm, likelihood_model=lm,
                            grad_estimator_z=est, n_grad_mc_samples=m)
        sps, compile_s = time_steps_per_sec(dibs, 30)
        row = {"estimator": est, "m": m, "steps_per_sec": sps,
               "compile_s": compile_s}
        rows.append(row)
        print(json.dumps(row), flush=True)

    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SCORE_RB_M_SWEEP.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0]), "rows": rows}, f,
                  indent=2)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
