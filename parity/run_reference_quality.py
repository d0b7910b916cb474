"""Run the ACTUAL reference implementation end-to-end on CPU and record
quality metrics + throughput — the golden baseline for BASELINE_MEASURED.json
and docs/PARITY.md.

Mirrors the four quality configs of benchmarks/run_benchmarks.py. Saves the
generated synthetic data to ``parity/results/data_cfg{N}_seed{S}.npz`` so the
dibs-tpu side (parity/run_ours_quality.py) can run inference on *identical*
data, isolating inference parity from data-generation differences.

Usage:
    JAX_PLATFORMS=cpu python parity/run_reference_quality.py --config 1 \
        --seed 123 --steps 2000
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Device selection must precede backend init. The axon TPU integration
# registers itself from a sitecustomize hook and forces jax_platforms, so a
# plain JAX_PLATFORMS env var is not enough (see tests/conftest.py) — the
# config must be overridden after importing jax, before first device use.
_DEVICE = os.environ.get("DIBS_REF_DEVICE", "cpu")

import jax  # noqa: E402

if _DEVICE == "cpu":
    jax.config.update("jax_platforms", "cpu")

from parity.refload import load_reference  # noqa: E402

load_reference()

import jax.numpy as jnp  # noqa: E402
import numpy as onp  # noqa: E402
from jax import random  # noqa: E402

from dibs.inference import JointDiBS, MarginalDiBS  # noqa: E402
from dibs.metrics import (  # noqa: E402
    expected_shd,
    neg_ave_log_likelihood,
    neg_ave_log_marginal_likelihood,
    threshold_metrics,
)
from dibs.target import (  # noqa: E402
    make_linear_gaussian_equivalent_model,
    make_linear_gaussian_model,
    make_nonlinear_gaussian_model,
)

RESULTS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "results")


def build_config(idx, seed):
    """Returns (data, dibs instance, n_particles, extras dict)."""
    key = random.PRNGKey(seed)
    key, subk = random.split(key)
    if idx == 1:
        data, gm, lm = make_linear_gaussian_equivalent_model(
            key=subk, n_vars=20, graph_prior_str="er"
        )
        dibs = MarginalDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
        return data, dibs, 30, key, {"kind": "marginal"}
    if idx == 2:
        data, gm, lm = make_linear_gaussian_model(
            key=subk, n_vars=20, graph_prior_str="sf"
        )
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
        return data, dibs, 30, key, {"kind": "joint"}
    if idx == 3:
        data, gm, lm = make_nonlinear_gaussian_model(
            key=subk, n_vars=20, graph_prior_str="sf", hidden_layers=(5,)
        )
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
        return data, dibs, 30, key, {"kind": "joint", "nonlinear": True}
    if idx == 4:
        data, gm, lm = make_linear_gaussian_model(
            key=subk, n_vars=30, graph_prior_str="sf"
        )
        xs = [data.x]
        masks = [jnp.zeros_like(data.x, dtype=jnp.int32)]
        for interv, x_int in data.x_interv[:5]:
            mask_vec = onp.zeros(data.n_vars, dtype=onp.int32)
            for node in interv:
                mask_vec[int(node)] = 1
            xs.append(x_int)
            masks.append(
                jnp.broadcast_to(jnp.asarray(mask_vec), x_int.shape)
            )
        x_all = jnp.concatenate(xs, axis=0)
        interv_mask = jnp.concatenate(masks, axis=0)
        dibs = JointDiBS(
            x=x_all, interv_mask=interv_mask, graph_model=gm,
            likelihood_model=lm,
        )
        return data, dibs, 20, key, {
            "kind": "joint", "x_all": x_all, "interv_mask": interv_mask,
        }
    raise ValueError(idx)


def save_data(idx, seed, data, extras):
    os.makedirs(RESULTS_DIR, exist_ok=True)
    payload = {
        "x": onp.asarray(data.x),
        "x_ho": onp.asarray(data.x_ho),
        "g": onp.asarray(data.g),
        "n_vars": data.n_vars,
    }
    if "x_all" in extras:
        payload["x_all"] = onp.asarray(extras["x_all"])
        payload["interv_mask"] = onp.asarray(extras["interv_mask"])
    onp.savez(os.path.join(RESULTS_DIR, f"data_cfg{idx}_seed{seed}.npz"),
              **payload)


def metrics_for(dist, data, dibs, kind):
    # dibs_tpu's equivalence-class metric applied to the REFERENCE posterior
    # (duck-typed: it reads only dist.logp / dist.g) so both sides of the
    # comparison report cpdag_eshd from round 3 on
    from dibs_tpu.metrics import expected_cpdag_shd

    out = {
        "eshd": float(expected_shd(dist=dist, g=data.g)),
        "auroc": float(threshold_metrics(dist=dist, g=data.g)["roc_auc"]),
        "cpdag_eshd": float(expected_cpdag_shd(dist=dist, g=jnp.asarray(data.g))),
    }
    if kind == "marginal":
        out["neg_mll"] = float(neg_ave_log_marginal_likelihood(
            dist=dist,
            eltwise_log_marginal_likelihood=dibs.eltwise_log_marginal_likelihood_observ,
            x=data.x_ho,
        ))
    else:
        out["neg_ll"] = float(neg_ave_log_likelihood(
            dist=dist,
            eltwise_log_likelihood=dibs.eltwise_log_likelihood_observ,
            x=data.x_ho,
        ))
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, required=True)
    p.add_argument("--seed", type=int, default=123)
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--timing-only", action="store_true")
    p.add_argument("--quality-only", action="store_true",
                   help="skip the throughput phase (key schedule unchanged)")
    args = p.parse_args()

    data, dibs, n_particles, key, extras = build_config(args.config, args.seed)
    save_data(args.config, args.seed, data, extras)
    kind = extras["kind"]

    # k_timing is split off even in --quality-only so the sampling key below
    # is identical across modes (and matches parity/run_ours_quality.py).
    key, k_timing = random.split(key)
    result = {
        "config": args.config,
        "seed": args.seed,
        "steps": args.steps,
        "n_particles": n_particles,
        "side": "reference",
        "device": str(jax.devices()[0]),
    }

    if not args.quality_only:
        # --- throughput: one-chunk runs so the static-start jit compiles
        # exactly once per call; subtracting the short run cancels compile ---
        t0 = time.perf_counter()
        dibs.sample(key=k_timing, n_particles=n_particles, steps=10,
                    callback_every=10)
        wall_short = time.perf_counter() - t0
        t0 = time.perf_counter()
        dibs.sample(key=k_timing, n_particles=n_particles, steps=110,
                    callback_every=110)
        wall_long = time.perf_counter() - t0
        result["steps_per_sec"] = 100.0 / max(wall_long - wall_short, 1e-9)
        result["compile_s"] = wall_short

    if not args.timing_only:
        # Chunk the device loop for the marginal-BGe config: its 2000-step
        # single XLA execution reliably crashes the tunneled TPU worker
        # (watchdog); chunking is numerically identical (the PRNG key and
        # optimizer state thread through the carry, and `start` is a traced
        # argument of the reference's _svgd_loop so there is no recompile).
        chunk = args.steps
        if args.config == 1 and _DEVICE != "cpu":
            chunk = min(50, args.steps)
        t0 = time.perf_counter()
        if kind == "marginal":
            gs = dibs.sample(key=key, n_particles=n_particles,
                             steps=args.steps, callback_every=chunk)
            result["empirical"] = metrics_for(
                dibs.get_empirical(gs), data, dibs, kind)
            result["mixture"] = metrics_for(
                dibs.get_mixture(gs), data, dibs, kind)
        else:
            gs, thetas = dibs.sample(key=key, n_particles=n_particles,
                                     steps=args.steps,
                                     callback_every=args.steps)
            result["empirical"] = metrics_for(
                dibs.get_empirical(gs, thetas), data, dibs, kind)
            result["mixture"] = metrics_for(
                dibs.get_mixture(gs, thetas), data, dibs, kind)
        result["wall_s"] = time.perf_counter() - t0

    os.makedirs(RESULTS_DIR, exist_ok=True)
    suffix = "" if _DEVICE == "cpu" else f"_{_DEVICE}"
    out_path = os.path.join(
        RESULTS_DIR, f"ref_cfg{args.config}_seed{args.seed}{suffix}.json")
    with open(out_path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
