"""Transport matmul precision A/B at the scaling config (cfg5).

Two questions, one TPU process:

1. MICROSTUDY — how much rounding error do the bf16-pass precisions put
   on the repulsion term ``factor * (K^T V − colsum(K) ⊙ V)`` at cfg5
   shapes ([1000, 32768]), and does centering ``V`` by its particle mean
   (exact algebra — the repulsion is shift-invariant) fix the clustered
   regime where the uncentered difference cancels catastrophically?
2. END-TO-END — cfg5 steps/s at transport precision HIGHEST / HIGH
   (current default) / DEFAULT, interleaved repeats in one process.

Writes benchmarks/TRANSPORT_PREC.json.
"""
import functools
import json
import time

import jax
import jax.numpy as jnp
from jax import random

from dibs_tpu import config as dcfg


def p(msg):
    print(msg, flush=True)


# --------------------------------------------------------------------------
# 1. microstudy
# --------------------------------------------------------------------------

def repulsion(k_mat, vf, prec, center):
    if center:
        vf = vf - vf.mean(axis=0, keepdims=True)
    colsum = k_mat.sum(axis=0)
    return jnp.matmul(k_mat.T, vf, precision=prec) - colsum[:, None] * vf


def driver(k_mat, gf, prec):
    return jnp.matmul(k_mat.T, gf, precision=prec)


def rel_err(a, truth):
    scale = jnp.abs(truth).max()
    return float(jnp.abs(a - truth).max() / scale)


def microstudy():
    P, n, h = 1000, 32768, 5.0
    key = random.PRNGKey(0)
    out = {}
    for regime in ("init", "clustered"):
        k1, k2, k3 = random.split(random.fold_in(key, hash(regime) % 997), 3)
        if regime == "init":
            v = random.normal(k1, (P, n))
        else:
            base = random.normal(k1, (1, n))
            v = base + 0.02 * random.normal(k2, (P, n))
        sq = ((v[:, None, :16] - v[None, :, :16]) ** 2).sum(-1)  # proxy dist
        # realistic K: full-feature distances, computed well-conditioned
        d2 = (
            (v * v).sum(1)[:, None] + (v * v).sum(1)[None, :]
            - 2.0 * jnp.matmul(v, v.T, precision=jax.lax.Precision.HIGHEST)
        )
        k_mat = jnp.exp(-jnp.maximum(d2, 0.0) / h)
        g = random.normal(k3, (P, n)) * 30.0  # gradient-scale driver input

        truth_rep = repulsion(k_mat, v, jax.lax.Precision.HIGHEST, True)
        truth_drv = driver(k_mat, g, jax.lax.Precision.HIGHEST)
        row = {}
        for prec_name, prec in (("default", jax.lax.Precision.DEFAULT),
                                ("high", jax.lax.Precision.HIGH),
                                ("highest", jax.lax.Precision.HIGHEST)):
            for center in (False, True):
                e = rel_err(repulsion(k_mat, v, prec, center), truth_rep)
                row[f"rep_{prec_name}_{'c' if center else 'u'}"] = e
            row[f"drv_{prec_name}"] = rel_err(driver(k_mat, g, prec),
                                              truth_drv)
        out[regime] = jax.device_get(row)
        p(f"[micro] {regime}: " + ", ".join(
            f"{k}={v:.2e}" for k, v in sorted(out[regime].items())))
    return out


# --------------------------------------------------------------------------
# 2. end-to-end cfg5
# --------------------------------------------------------------------------

def end_to_end():
    import sys
    sys.path.insert(0, "benchmarks")
    from run_benchmarks import config_5

    arms = ["high", "default", "highest"]
    results = {a: [] for a in arms}
    for rep in range(2):
        for arm in arms:
            dcfg.set_transport_matmul_precision(arm)
            t0 = time.perf_counter()
            r = config_5(False)
            results[arm].append(r["steps_per_sec"])
            p(f"[e2e rep{rep}] {arm}: {r['steps_per_sec']:.2f} steps/s "
              f"(compile {r['compile_s']:.1f}s, total {time.perf_counter()-t0:.0f}s)")
    dcfg.set_transport_matmul_precision("high")
    return results


if __name__ == "__main__":
    micro = microstudy()
    e2e = end_to_end()
    with open("benchmarks/TRANSPORT_PREC.json", "w") as f:
        json.dump({"micro": micro, "e2e": e2e}, f, indent=1)
    p("done -> benchmarks/TRANSPORT_PREC.json")
