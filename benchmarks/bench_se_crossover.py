"""Crossover study: fused Pallas SE kernel vs XLA HIGHEST Gram.

Round-4 transport bench (bench_transport.py) found the XLA Gram form
(cross-term pinned to HIGHEST, utils/func.py) BEATS the fused Pallas SE
kernel at cfg5 shapes (13.8 vs 16.6 ms full transport). This bench maps
the crossover across every product shape so `_se_matrix`'s auto dispatch
can pick the winner per shape instead of always choosing Pallas on TPU.

Product shapes (A = B = P particles, n = flattened feature count):
  cfg1/2:  P=30,   n in {400, 800}
  cfg4:    P=20,   n in {900, 1800}
  cfg6:    P=100,  n=32768
  cfg5:    P=1000, n in {16384, 32768}
  d=20 particle-scaling: P=1000, n=800

Usage: python benchmarks/bench_se_crossover.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random

from dibs_tpu.ops.pallas_kernels import fused_se_matrix


@functools.partial(jax.jit, static_argnames=("h",))
def xla_gram(x, y, h):
    a_sq = jnp.sum(x * x, axis=-1)
    b_sq = jnp.sum(y * y, axis=-1)
    cross = jnp.matmul(x, y.T, precision=jax.lax.Precision.HIGHEST)
    sq = a_sq[:, None] + b_sq[None, :] - 2.0 * cross
    return jnp.exp(-sq / h)


@functools.partial(jax.jit, static_argnames=("h",))
def pallas_se(x, y, h):
    return fused_se_matrix(x, y, h, 1.0)


def timeit(fn, *args, n=50):
    out = fn(*args)
    jax.device_get(out.ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(out.ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    shapes = [
        ("cfg4 theta", 20, 900),
        ("cfg4 z", 20, 1800),
        ("cfg1/2 theta", 30, 400),
        ("cfg1/2 z", 30, 800),
        ("scaling d=20", 1000, 800),
        ("cfg6 z", 100, 32768),
        ("cfg5 theta", 1000, 16384),
        ("cfg5 z", 1000, 32768),
    ]
    rows = []
    for name, p, n in shapes:
        kx, ky = random.split(random.PRNGKey(hash(name) % 2**31))
        x = random.normal(kx, (p, n))
        y = x  # SVGD always evaluates K(particles, particles)
        reps = 200 if p <= 100 and n <= 2048 else 30
        t_x = timeit(xla_gram, x, y, 5.0, n=reps)
        t_p = timeit(pallas_se, x, y, 5.0, n=reps)
        err = float(jnp.abs(xla_gram(x, y, 5.0) - pallas_se(x, y, 5.0)).max())
        rows.append({"shape": name, "p": p, "n": n,
                     "xla_ms": t_x * 1e3, "pallas_ms": t_p * 1e3,
                     "pallas_over_xla": t_p / t_x, "max_abs_err": err})
        print(f"{name:14s} P={p:5d} n={n:6d}  xla {t_x*1e3:8.3f} ms  "
              f"pallas {t_p*1e3:8.3f} ms  ratio {t_p/t_x:5.2f}  "
              f"err {err:.2e}", flush=True)
    out = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "SE_CROSSOVER.json")
    with open(out, "w") as f:
        json.dump({"device": str(jax.devices()[0].device_kind), "rows": rows},
                  f, indent=1)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
