"""Config-1 (marginal BGe) round-3 benchmark: Pallas determinant kernel.

Sequence: (1) kernel-vs-XLA correctness on the real TPU, (2) kernel-only
timing at the benchmark batch, (3) full config-1 steps/sec.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random, vmap

from benchmarks.run_benchmarks import time_steps_per_sec
from dibs_tpu.inference import MarginalDiBS
from dibs_tpu.models.linear_gaussian import BGe
from dibs_tpu.ops.bge_kernel import bge_logdet_pairs
from dibs_tpu.ops.logdet import masked_logdet_pd_pair
from dibs_tpu.target import make_linear_gaussian_equivalent_model


def main():
    d, b = 20, 3840  # cfg1: P=30 x M=128 samples, d nodes via grid
    key = random.PRNGKey(0)
    x = random.normal(key, (100, d))
    model = BGe(n_vars=d)
    r_mats, _ = model._posterior_r_mats(x, jnp.zeros_like(x, dtype=jnp.int32))
    gs = (random.uniform(random.PRNGKey(1), (b, d, d)) < 0.25).astype(
        jnp.float32) * (1.0 - jnp.eye(d))

    # (1) correctness on TPU (compiles the Mosaic kernel; may take minutes)
    t0 = time.perf_counter()
    pa, full = jax.device_get(bge_logdet_pairs(r_mats, gs))
    print(f"kernel compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
    eye = jnp.eye(d)
    sub = jnp.arange(0, b, 97)  # spot-check rows
    ref_pa, ref_full = jax.device_get(vmap(
        lambda g: vmap(
            lambda j: masked_logdet_pd_pair(r_mats[j], g[:, j], eye[:, j])
        )(jnp.arange(d)),
        0,
    )(gs[sub]))
    err = max(abs(pa[sub] - ref_pa).max(), abs(full[sub] - ref_full).max())
    scale = max(abs(ref_pa).max(), abs(ref_full).max(), 1.0)
    print(f"max |pallas - xla| on TPU: {err:.2e} (rel {err/scale:.2e})",
          flush=True)
    # different elimination orderings (bordered vs permuted-last) reassociate
    # fp32 sums; ~1e-4 relative is the expected noise floor
    assert err / scale < 5e-4, (err, scale)

    # (2) kernel-only timing
    f = jax.jit(lambda r, g: bge_logdet_pairs(r, g))
    jax.device_get(f(r_mats, gs))
    t0 = time.perf_counter()
    reps = 20
    for _ in range(reps):
        out = f(r_mats, gs)
    jax.device_get(out[0][0, 0])
    dt = (time.perf_counter() - t0) / reps
    print(f"kernel-only: {dt*1e3:.2f} ms / {b*d} det-pairs", flush=True)

    # (3) full config-1 benchmark
    key = random.PRNGKey(123)
    key, subk = random.split(key)
    data, gm, lm = make_linear_gaussian_equivalent_model(
        key=subk, n_vars=20, graph_prior_str="er"
    )
    dibs = MarginalDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
    sps, compile_s = time_steps_per_sec(dibs, 30)
    print(f"config1: {sps:.1f} steps/s (compile+first {compile_s:.1f}s)",
          flush=True)


if __name__ == "__main__":
    main()
