"""In-step phase attribution for cfg1 / cfg3 by component toggling.

The dependent-chain profiler pays one tunnel round trip per chain, which
in this session's degraded-tunnel phases reaches ms-scale per step and
swamps sub-ms phases (scripts/profile_step.py now measures and subtracts
it, but the residual noise is still comparable to cfg1's 0.8 ms step).
This harness instead attributes time *in the real fori_loop step* by
toggling one component at a time and differencing the steps/s — the same
subtraction-closed `time_steps_per_sec` protocol as the headline numbers,
immune to dispatch latency by construction.

Toggles (all leave the rest of the step identical):
  cfg1: det-path XLA (ops/bge_kernel._MAX_D=0), constraint 'mean'
        (removes the K-chain from the prior score), M=64 (halves the
        sample batch: sampling + scoring + REINFORCE ratio), kmc=16
        (halves the constraint chain batch).
  cfg3: fused nonlinear kernel off (XLA estimator fallback), constraint
        'mean', M=64.

Each toggle's delta-ms/step is a LOWER bound on the toggled component's
in-step cost when the toggle removes work (XLA fallbacks instead *add*
work, bounding the component's saving). Writes PHASE_TOGGLE_r5.json.
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from jax import random

from dibs_tpu.inference import JointDiBS, MarginalDiBS
from dibs_tpu.target import (
    make_linear_gaussian_equivalent_model,
    make_nonlinear_gaussian_model,
)
from run_benchmarks import time_steps_per_sec

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "PHASE_TOGGLE_r5.json")


def measure(build, n_particles, **kw):
    dibs = build()
    sps, _ = time_steps_per_sec(dibs, n_particles, **kw)
    return sps


def main():
    out = {"cfg1": {}, "cfg3": {}}
    key = random.PRNGKey(123)
    key, subk = random.split(key)

    # ------------------------------------------------------------- cfg1
    data, gm, lm = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=20, graph_prior_str="er")

    def cfg1(**kw):
        return lambda: MarginalDiBS(x=data.x, graph_model=gm,
                                    likelihood_model=lm, **kw)

    import dibs_tpu.ops.bge_kernel as bk

    runs = {}
    runs["baseline"] = measure(cfg1(), 30, chunk=50, repeats=6)
    old = bk._MAX_D
    bk._MAX_D = 0
    try:
        runs["det_xla"] = measure(cfg1(), 30, chunk=50, repeats=6)
    finally:
        bk._MAX_D = old
    runs["constraint_mean"] = measure(
        cfg1(acyclicity_constraint="mean"), 30, chunk=50, repeats=6)
    runs["m64"] = measure(cfg1(n_grad_mc_samples=64), 30, chunk=50,
                          repeats=6)
    runs["kmc16"] = measure(cfg1(n_acyclicity_mc_samples=16), 30,
                            chunk=50, repeats=6)
    out["cfg1"] = {k: round(v, 1) for k, v in runs.items()}
    base_ms = 1e3 / runs["baseline"]
    out["cfg1_delta_ms"] = {
        k: round(1e3 / v - base_ms, 4) for k, v in runs.items()
        if k != "baseline"}
    print(json.dumps(out["cfg1"]), flush=True)
    print(json.dumps(out["cfg1_delta_ms"]), flush=True)

    # ------------------------------------------------------------- cfg3
    key2, subk2 = random.split(random.PRNGKey(123))
    data3, gm3, lm3 = make_nonlinear_gaussian_model(
        key=subk2, n_vars=20, graph_prior_str="sf", hidden_layers=(5,))

    def cfg3(**kw):
        return lambda: JointDiBS(x=data3.x, graph_model=gm3,
                                 likelihood_model=lm3, **kw)

    import dibs_tpu.inference.svgd as svgd_mod

    runs = {}
    runs["baseline"] = measure(cfg3(), 30, chunk=20, repeats=6)
    old_cls = svgd_mod.DenseNonlinearGaussian
    svgd_mod.DenseNonlinearGaussian = ()  # isinstance(...) -> False
    try:
        runs["fused_off"] = measure(cfg3(), 30, chunk=20, repeats=6)
    finally:
        svgd_mod.DenseNonlinearGaussian = old_cls
    runs["constraint_mean"] = measure(
        cfg3(acyclicity_constraint="mean"), 30, chunk=20, repeats=6)
    runs["m64"] = measure(cfg3(n_grad_mc_samples=64), 30, chunk=20,
                          repeats=6)
    out["cfg3"] = {k: round(v, 1) for k, v in runs.items()}
    base_ms = 1e3 / runs["baseline"]
    out["cfg3_delta_ms"] = {
        k: round(1e3 / v - base_ms, 4) for k, v in runs.items()
        if k != "baseline"}
    print(json.dumps(out["cfg3"]), flush=True)
    print(json.dumps(out["cfg3_delta_ms"]), flush=True)

    import jax

    out["device"] = str(jax.devices()[0])
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
