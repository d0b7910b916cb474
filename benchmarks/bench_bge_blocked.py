"""Microbenchmark: register-blocked BGe elimination kernel (round 5).

The round-4 fleet sweep measured the cfg1 determinant batch at 0.85 ms vs a
0.27 ms peak-VPU fma floor and named "vector dependency latency / traffic in
the GE recurrence" as the binding resource (benchmarks/RESULTS.md). The
round-5 blocked sweep (ops/bge_kernel._BLOCK_K) amortizes the [d, TILE]
VMEM round-trip over K pivots. This bench times the determinant-pair batch
standalone at the cfg1 (d=20, B=3840 graphs) and cfg6 (d=128, B=6400)
shapes across K, checking bitwise agreement with K=1 (the old unblocked
form — the blocked sweep reorders no per-element arithmetic).

Usage: python benchmarks/bench_bge_blocked.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random

import dibs_tpu.ops.bge_kernel as bk
from dibs_tpu.models import BGe


def det_batch(d, n_graphs, seed=0):
    k1, k2 = random.split(random.PRNGKey(seed))
    x = random.normal(k1, (100, d))
    r_mats, _ = BGe(n_vars=d)._posterior_r_mats(
        x, jnp.zeros_like(x, dtype=jnp.int32))
    gs = (random.uniform(k2, (n_graphs, d, d)) < 0.3).astype(
        jnp.float32) * (1.0 - jnp.eye(d))
    return r_mats, gs


def timeit_chained(r_mats, gs, n=20):
    """Time the kernel as an n-deep dependent chain inside ONE dispatch —
    per-dispatch tunnel latency on this host is ~7 ms, an order of
    magnitude above the d=20 kernel itself, so per-call timing reads pure
    overhead. The runtime-zero eps makes each iteration depend on the
    previous output without changing values, so XLA cannot hoist the call
    out of the loop."""
    import functools

    @functools.partial(jax.jit, static_argnames="steps")
    def chain(r, g, eps, steps):
        def body(_, carry):
            r_c, acc = carry
            pa, full = bk.bge_logdet_pairs(r_c, g)
            return r_c + eps * pa[0, 0], acc + pa[0, 0] + full[0, 0]

        return jax.lax.fori_loop(0, steps, body, (r, jnp.float32(0.0)))[1]

    eps = jnp.float32(0.0)
    # warm BOTH step-count variants (distinct static args = distinct
    # compiles) before any timing
    jax.device_get(chain(r_mats, gs, eps, 1))
    jax.device_get(chain(r_mats, gs, eps, n + 1))
    t0 = time.perf_counter()
    jax.device_get(chain(r_mats, gs, eps, 1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    jax.device_get(chain(r_mats, gs, eps, n + 1))
    tn = time.perf_counter() - t0
    return (tn - t1) / n


def main():
    results = {}
    for name, d, b, reps in (("cfg1_shape", 20, 3840, 30),
                             ("cfg6_shape", 128, 6400, 5)):
        r_mats, gs = det_batch(d, b)
        base = None
        results[name] = {}
        for kb in (1, 4, 8, 16):
            bk._BLOCK_K = kb
            bk._bge_pairs_padded.clear_cache()
            t = timeit_chained(r_mats, gs, n=reps)
            pa, full = bk.bge_logdet_pairs(r_mats, gs)
            if base is None:
                base = (pa, full)
            else:
                err = float(jnp.maximum(jnp.abs(pa - base[0]).max(),
                                        jnp.abs(full - base[1]).max()))
                assert err == 0.0, f"K={kb}: max abs diff {err} (want bitwise)"
            dets = b * d
            print(f"{name} K={kb:2d}: {t*1e3:7.3f} ms "
                  f"({dets/t/1e6:6.1f} M dets/s)", flush=True)
            results[name][f"K{kb}"] = {"ms": round(t * 1e3, 3),
                                       "mdets_per_s": round(dets / t / 1e6, 1)}
    bk._BLOCK_K = 8
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "BGE_BLOCKED_AB.json")
    with open(out, "w") as f:
        json.dump({"results": results, "device": str(jax.devices()[0])}, f,
                  indent=2)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
