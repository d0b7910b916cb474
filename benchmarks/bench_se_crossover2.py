"""Crossover study 2: fused Pallas SE kernel vs XLA HIGHEST Gram, IN-JIT.

The standalone study (bench_se_crossover.py) is dispatch-floor-blinded at
small shapes: a [30, 800] kernel matrix costs microseconds in-step but the
per-call tunnel floor is ~0.3 ms, so both backends tie there while an
end-to-end A/B shows Pallas ahead by 3-16% of the WHOLE step. This bench
measures the in-program cost by chaining ``iters`` dependent evaluations
inside one jitted scan (each iteration perturbs x by carry*1e-20 so XLA
cannot hoist or CSE the evaluation), closing the timed region with
``jax.device_get`` per the repo timing rules.

Cells: all product shapes plus the (P, n) boundary region, to place the
auto-dispatch threshold in dibs_tpu/kernel.py.

Usage: python benchmarks/bench_se_crossover2.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

from dibs_tpu.ops.pallas_kernels import fused_se_matrix


def xla_gram(x, y, h):
    a_sq = jnp.sum(x * x, axis=-1)
    b_sq = jnp.sum(y * y, axis=-1)
    cross = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    sq = jnp.maximum(a_sq[:, None] + b_sq[None, :] - 2.0 * cross, 0.0)
    return jnp.exp(-sq / h)


def pallas_se(x, y, h):
    return fused_se_matrix(x, y, h, 1.0)


def chained(fn, h, iters):
    @jax.jit
    def run(x, y):
        def body(carry, _):
            k = fn(x + carry * 1e-20, y, h)
            return k[0, 0], None
        c, _ = lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    return run


def timeit_chain(fn, h, iters, x, y, outer=3):
    run = chained(fn, h, iters)
    jax.device_get(run(x, y))  # compile + warm
    best = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        jax.device_get(run(x, y))
        best = min(best, time.perf_counter() - t0)
    # subtract a 1-iter run to cancel dispatch+transfer overhead
    run1 = chained(fn, h, 1)
    jax.device_get(run1(x, y))
    t1 = float("inf")
    for _ in range(outer):
        t0 = time.perf_counter()
        jax.device_get(run1(x, y))
        t1 = min(t1, time.perf_counter() - t0)
    return max(best - t1, 1e-9) / (iters - 1)


def main():
    cells = [
        # product shapes
        ("cfg4 theta", 20, 900), ("cfg4 z", 20, 1800),
        ("cfg1/2 theta", 30, 400), ("cfg1/2 z", 30, 800),
        ("scaling d=20", 1000, 800),
        ("cfg6 z", 100, 32768),
        ("cfg5 theta", 1000, 16384), ("cfg5 z", 1000, 32768),
        # boundary region
        ("b1", 64, 2048), ("b2", 64, 8192),
        ("b3", 128, 2048), ("b4", 128, 8192),
        ("b5", 100, 800), ("b6", 256, 800), ("b7", 256, 8192),
    ]
    rows = []
    for name, p, n in cells:
        x = random.normal(random.PRNGKey(p * 131 + n), (p, n))
        # pick iters for ~0.3-2 s chains, under the 10 s watchdog
        iters = 200 if p * n <= 1 << 21 else 50
        t_x = timeit_chain(xla_gram, 5.0, iters, x, x)
        t_p = timeit_chain(pallas_se, 5.0, iters, x, x)
        rows.append({"cell": name, "p": p, "n": n, "xla_us": t_x * 1e6,
                     "pallas_us": t_p * 1e6, "pallas_over_xla": t_p / t_x})
        print(f"{name:13s} P={p:5d} n={n:6d}  xla {t_x*1e6:9.1f} us  "
              f"pallas {t_p*1e6:9.1f} us  ratio {t_p/t_x:5.2f}", flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SE_CROSSOVER2.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0].device_kind),
                   "method": "chained-scan in-jit, 1-iter overhead subtracted",
                   "rows": rows}, f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
