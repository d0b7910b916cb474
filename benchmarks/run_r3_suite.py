"""Round-3 consolidated TPU benchmark suite — ONE process for everything
(each fresh process on this host pays a multi-minute tunnel acquisition, so
stages are batched; per-stage prints flush immediately).

Stages:
  1. BGe Pallas kernel: TPU correctness spot-check + kernel-only timing
  2. config 1 (marginal BGe)    steps/s
  3. config 3 (joint nonlinear) steps/s
  4. config 2 (joint linear)    steps/s  [regression check]
  5. config 4 (interventional)  steps/s  [regression check]
  6. config 5 (d=128 scaling)   steps/s  [regression check]
  7. per-config roofline rows (accounting.py) -> benchmarks/RESULTS_r3.json
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random, vmap

from benchmarks.run_benchmarks import (
    config_1,
    config_2,
    config_3,
    config_4,
    config_5,
    time_steps_per_sec,
)
from dibs_tpu.accounting import (
    bge_step_cost,
    linear_step_cost,
    nonlinear_step_cost,
    xla_cost_analysis,
)
from dibs_tpu.models.linear_gaussian import BGe
from dibs_tpu.ops.bge_kernel import bge_logdet_pairs
from dibs_tpu.ops.logdet import masked_logdet_pd_pair

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "RESULTS_r3.json")


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def stage_kernel_check():
    d, b = 20, 3840
    key = random.PRNGKey(0)
    x = random.normal(key, (100, d))
    model = BGe(n_vars=d)
    r_mats, _ = model._posterior_r_mats(x, jnp.zeros_like(x, dtype=jnp.int32))
    gs = (random.uniform(random.PRNGKey(1), (b, d, d)) < 0.25).astype(
        jnp.float32) * (1.0 - jnp.eye(d))

    t0 = time.perf_counter()
    pa, full = jax.device_get(bge_logdet_pairs(r_mats, gs))
    log(f"bge kernel compile+first: {time.perf_counter()-t0:.1f}s")
    eye = jnp.eye(d)
    sub = jnp.arange(0, b, 97)
    ref_pa, ref_full = jax.device_get(vmap(
        lambda g: vmap(
            lambda j: masked_logdet_pd_pair(r_mats[j], g[:, j], eye[:, j])
        )(jnp.arange(d)),
        0,
    )(gs[sub]))
    err = max(abs(pa[sub] - ref_pa).max(), abs(full[sub] - ref_full).max())
    scale = max(abs(ref_pa).max(), abs(ref_full).max(), 1.0)
    rel = float(err / scale)
    log(f"bge kernel TPU max err {err:.2e} (rel {rel:.2e})")
    assert rel < 5e-4, (err, scale)

    f = jax.jit(lambda r, g: bge_logdet_pairs(r, g))
    jax.device_get(f(r_mats, gs)[0][0, 0])
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(r_mats, gs)
    jax.device_get(out[0][0, 0])
    dt = (time.perf_counter() - t0) / reps
    log(f"bge kernel-only: {dt*1e3:.2f} ms / {b*d} det-pairs")
    return {"kernel_rel_err": rel, "kernel_ms": dt * 1e3}


def main():
    results = {"round": 3}
    log("=== stage 1: BGe kernel check ===")
    results["bge_kernel"] = stage_kernel_check()

    for name, fn in [("config_1", config_1), ("config_3", config_3),
                     ("config_2", config_2), ("config_4", config_4),
                     ("config_5", config_5)]:
        log(f"=== {name} ===")
        t0 = time.perf_counter()
        out = fn(False)
        out["stage_wall_s"] = round(time.perf_counter() - t0, 1)
        results[name] = out
        log(f"{name}: {out['steps_per_sec']:.1f} steps/s "
            f"(compile {out.get('compile_s', 0):.1f}s)")
        # write incrementally so a crash keeps earlier stages
        with open(OUT, "w") as f:
            json.dump(results, f, indent=2)

    log("=== stage 7: rooflines ===")
    # kmc MUST match each config's actual n_acyclicity_mc_samples (config 5
    # runs 8, not the engine default 32 — a round-3 review caught the
    # mismatch inflating its modeled FLOPs 2x); config 3's cost model must
    # match the code path actually measured (fused kernel on TPU).
    from dibs_tpu.inference.fused_nonlinear import fused_nonlinear_available
    from dibs_tpu.models import DenseNonlinearGaussian

    nl_fused = fused_nonlinear_available(
        DenseNonlinearGaussian(n_vars=20, hidden_layers=(5,)))
    cost_map = {
        "config_1": bge_step_cost(d=20, n_obs=100, p=30, m=128, kmc=32),
        "config_2": linear_step_cost(d=20, n_obs=100, p=30, m=128, kmc=32),
        "config_3": nonlinear_step_cost(d=20, n_obs=100, p=30, m=128,
                                        kmc=32, fused_kernel=nl_fused),
        "config_4": linear_step_cost(d=30, n_obs=600, p=20, m=128, kmc=32),
        "config_5": linear_step_cost(d=128, n_obs=100, p=1000, m=32, kmc=8),
    }
    for name, cost in cost_map.items():
        sps = results[name]["steps_per_sec"]
        row = cost.total_row(1.0 / sps)
        row["flops_per_step"] = cost.flops
        row["bytes_min_per_step"] = cost.bytes_min
        row["phases_gflops"] = {k: round(v / 1e9, 3)
                                for k, v in cost.phases.items()}
        results[name]["roofline"] = row
        log(f"{name}: {row['tflops_achieved']:.2f} TF/s "
            f"({row['mfu_pct']:.1f}% MFU), {row['hbm_gbps_achieved']:.0f} GB/s "
            f"({row['hbm_pct']:.1f}%), bound={row['binding_ceiling']}")

    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)
    log(f"DONE -> {OUT}")


if __name__ == "__main__":
    main()
