"""A/B: single-pass (online-softmax) vs two-pass (seed-replay) fused
linear kernel — round 4.

The two-pass design regenerates every Gumbel sample and recomputes its
delta matmul twice (once to score, once to weight gradients); the
single-pass kernel accumulates weighted gradients online (flash-attention
style, the scheme fused_nonlinear validated in round 3), removing the
duplicated sampling + scoring chain and the [P, M] log-prob round-trip
through HBM/XLA. This script measures both arms on the three
fused-linear-bound BASELINE configs (2, 4, 5) in ONE process (tunnel
admits one client; see .claude/skills/verify), then runs the fused-path
quality-gate checks on the single-pass arm.

Usage: python benchmarks/run_singlepass_ab.py [--out benchmarks/SINGLEPASS_AB.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jax import random

import dibs_tpu.inference.fused_linear as fl
from benchmarks.run_benchmarks import time_steps_per_sec
from dibs_tpu.inference import JointDiBS
from dibs_tpu.target import make_linear_gaussian_model


def make_cfg2():
    key, subk = random.split(random.PRNGKey(123))
    data, gm, lm = make_linear_gaussian_model(
        key=subk, n_vars=20, graph_prior_str="sf")
    return JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm), dict(
        n_particles=30, chunk=50, repeats=4)


def make_cfg4():
    import jax.numpy as jnp

    from dibs_tpu.ops.ancestral import interv_to_vectors

    key, subk = random.split(random.PRNGKey(123))
    data, gm, lm = make_linear_gaussian_model(
        key=subk, n_vars=30, graph_prior_str="sf")
    xs = [data.x]
    masks = [jnp.zeros_like(data.x, dtype=jnp.int32)]
    for interv, x_int in data.x_interv[:5]:
        mask_vec, _ = interv_to_vectors(interv, data.n_vars)
        xs.append(x_int)
        masks.append(jnp.broadcast_to(mask_vec.astype(jnp.int32),
                                      x_int.shape))
    dibs = JointDiBS(
        x=jnp.concatenate(xs, axis=0),
        interv_mask=jnp.concatenate(masks, axis=0),
        graph_model=gm, likelihood_model=lm,
    )
    return dibs, dict(n_particles=20, chunk=20, repeats=4)


def make_cfg5():
    key, subk = random.split(random.PRNGKey(123))
    data, gm, lm = make_linear_gaussian_model(
        key=subk, n_vars=128, graph_prior_str="sf")
    dibs = JointDiBS(
        x=data.x, graph_model=gm, likelihood_model=lm,
        n_grad_mc_samples=32, n_acyclicity_mc_samples=8,
    )
    return dibs, dict(n_particles=1000, chunk=5, repeats=2)


CONFIGS = {"cfg2_joint_d20": make_cfg2, "cfg4_interv_d30": make_cfg4,
           "cfg5_scaling_d128": make_cfg5}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/SINGLEPASS_AB.json")
    ap.add_argument("--configs", nargs="+", default=list(CONFIGS))
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    results = {"device": str(jax.devices()[0])}
    for name in args.configs:
        results[name] = {}
        for arm, flag in (("single", True), ("twopass", False)):
            fl._SINGLE_PASS = flag
            dibs, kw = CONFIGS[name]()
            sps, compile_s = time_steps_per_sec(
                dibs, kw["n_particles"], chunk=kw["chunk"],
                repeats=kw["repeats"])
            results[name][arm] = {"steps_per_sec": round(sps, 1),
                                  "compile_s": round(compile_s, 1)}
            print(f"{name} {arm}: {sps:.1f} steps/s "
                  f"(compile+first {compile_s:.1f}s)", flush=True)
        a, b = results[name]["single"], results[name]["twopass"]
        results[name]["speedup"] = round(
            a["steps_per_sec"] / max(b["steps_per_sec"], 1e-9), 3)
        print(f"{name}: single/twopass = {results[name]['speedup']}x",
              flush=True)

    # quality checks on the single-pass arm (the new default)
    fl._SINGLE_PASS = True
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import quality_gate

    quality_gate.joint_linear()
    quality_gate.scale_robustness()
    results["quality_gate"] = {
        "failures": [list(f) for f in quality_gate.FAILURES]}
    print(f"quality failures: {quality_gate.FAILURES}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}", flush=True)
    if quality_gate.FAILURES:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
