"""A/B benchmark for the cfg3 (nonlinear d=20) round-3 changes.

Measures steps/sec for: (a) separate estimators (round-2 behavior, new
all_node_means layout), (b) shared-sample fused 'hard' mode.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from jax import random

from dibs_tpu.inference import JointDiBS
from dibs_tpu.target import make_nonlinear_gaussian_model
from benchmarks.run_benchmarks import time_steps_per_sec


def main():
    key = random.PRNGKey(123)
    key, subk = random.split(key)
    data, gm, lm = make_nonlinear_gaussian_model(
        key=subk, n_vars=20, graph_prior_str="sf", hidden_layers=(5,)
    )
    for label, sharing in [("separate", None), ("fused_hard", "hard")]:
        t0 = time.perf_counter()
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm,
                         fused_sample_sharing=sharing)
        sps, compile_s = time_steps_per_sec(dibs, 30, chunk=20)
        print(f"{label}: {sps:.1f} steps/s (compile+first {compile_s:.1f}s, "
              f"total {time.perf_counter()-t0:.1f}s)", flush=True)


if __name__ == "__main__":
    main()
