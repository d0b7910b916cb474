"""Fused-nonlinear boundary measurement (VERDICT r3 item 7).

The single-pass online-softmax nonlinear kernel serves SINGLE-hidden-layer
MLP conditionals only (the reference default ``hidden_layers=(5,)``,
nonlinearGaussian.py:105); deeper stacks fall back to the exact XLA
shared-sample estimators. The VMEM argument against a 2-layer kernel: the
per-group live state is already h1-multiplied ((6*h1+10) [N, wd] tiles) —
the round-3e wide-NL experiment measured the schedule collapsing when the
working set grows (385 vs 1294-1450 steps/s at merely 2x lane width), and
a second hidden layer multiplies the live activations again while making
the delta trick (first layer is linear in the parent mask) inapplicable
past layer 1.

This measures the boundary at the cfg3 protocol: (5,) fused vs (5,)
XLA-fallback vs (5, 5) XLA-fallback, one process.

Usage: python benchmarks/run_nl_depth_ab.py [--out benchmarks/NL_DEPTH_AB.json]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
from jax import random

import dibs_tpu.config as config
from benchmarks.run_benchmarks import time_steps_per_sec
from dibs_tpu.inference import JointDiBS
from dibs_tpu.target import make_nonlinear_gaussian_model


def bench(hidden_layers, force_xla):
    key, subk = random.split(random.PRNGKey(123))
    data, gm, lm = make_nonlinear_gaussian_model(
        key=subk, n_vars=20, graph_prior_str="sf",
        hidden_layers=hidden_layers)
    if force_xla:
        config.set_pallas_enabled(False)
    try:
        from dibs_tpu.inference.fused_nonlinear import (
            fused_nonlinear_available,
        )

        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
        # the single-pass Pallas NL kernel serves single-hidden-layer MLPs
        # only; deeper stacks run the generic shared-sample XLA estimators
        # (est.fused_grad_both is non-None for those too — it is the
        # sample-sharing wrapper, not the Pallas kernel)
        pallas_kernel = (not force_xla
                         and fused_nonlinear_available(lm, data.x.shape[0]))
        sps, compile_s = time_steps_per_sec(dibs, 30, chunk=20)
    finally:
        config.set_pallas_enabled(None)
    return {"hidden_layers": list(hidden_layers),
            "pallas_kernel": pallas_kernel,
            "steps_per_sec": round(sps, 1), "compile_s": round(compile_s, 1)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="benchmarks/NL_DEPTH_AB.json")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    results = {"device": str(jax.devices()[0]), "protocol": "cfg3 d=20 P=30"}
    for name, hl, force in (("fused_h5", (5,), False),
                            ("xla_h5", (5,), True),
                            ("xla_h5x5", (5, 5), False)):
        # (5, 5) is outside the kernel's support — the gate itself routes
        # it to the XLA estimators; force only for the (5,) control arm
        r = bench(hl, force)
        results[name] = r
        print(f"{name}: {r}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
