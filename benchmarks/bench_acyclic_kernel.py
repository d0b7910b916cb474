"""Microbenchmark: fused in-VMEM acyclicity power chain vs the XLA path.

The cfg5 per-phase roofline (round 4) shows the acyclicity prior at
28.2 ms — 13 materialized [8000, 128, 128] chain intermediates (~14 GB
HBM round-trips) layered on a tiny-matmul MXU floor (104k independent
[128,128] matmuls; a single such matmul cannot tile across the
TensorCore's MXUs). This measures whether keeping the whole chain
VMEM-resident in one Pallas kernel (samples generated in-kernel from the
hardware PRNG, 13 dots back-to-back per sample) beats XLA before any
engine integration.

Usage: python benchmarks/bench_acyclic_kernel.py [--d 128] [--p 1000] [--kmc 8]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dibs_tpu.inference.fused_linear import _gen_uniform
from dibs_tpu.ops.acyclic import acyclic_constr
from dibs_tpu.ops.soft_graphs import sample_soft_graphs


def make_kernel(n_vars, dp, kmc, tau):
    """Grid (P,): per particle, kmc soft samples -> mean d h/d scores."""
    inv_d = 1.0 / n_vars
    n_exp = n_vars - 1

    def kernel(seed_ref, alpha_ref, scores_ref, out_ref):
        p_idx = pl.program_id(0)
        pltpu.prng_seed(seed_ref[0, 0] + p_idx * jnp.int32(1000003))
        alpha = alpha_ref[0, 0]
        s = scores_ref[0]
        row = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (dp, dp), 1)
        mask = ((row != col) & (row < n_vars) & (col < n_vars)).astype(
            jnp.float32)
        eye = (row == col).astype(jnp.float32)
        exp_neg = jnp.exp(-alpha * s)

        def dot(a, b):
            return jax.lax.dot_general(
                a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)

        def body(_, acc):
            u = _gen_uniform((dp, dp))
            g = mask / (1.0 + (1.0 / u - 1.0) * exp_neg)  # tau == 1 fast path
            m = eye + inv_d * g
            result = eye
            base = m
            n = n_exp
            while n > 0:
                if n & 1:
                    result = dot(result, base)
                n >>= 1
                if n:
                    base = dot(base, base)
            w = (tau * alpha) * g * (1.0 - g)
            return acc + result.T * w

        acc = lax.fori_loop(0, kmc, body, jnp.zeros((dp, dp), jnp.float32))
        out_ref[0] = acc * (1.0 / kmc)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_vars", "kmc", "tau"))
def fused_grad(scores, seed, alpha, *, n_vars, kmc, tau=1.0):
    p, d, _ = scores.shape
    dp = ((d + 7) // 8) * 8
    if dp != d:
        scores = jnp.zeros((p, dp, dp), scores.dtype).at[:, :d, :d].set(scores)
    out = pl.pallas_call(
        make_kernel(n_vars, dp, kmc, tau),
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, dp, dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, dp, dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, dp, dp), jnp.float32),
    )(jnp.asarray(seed, jnp.int32).reshape(1, 1),
      jnp.asarray(alpha, jnp.float32).reshape(1, 1), scores)
    return out[:, :d, :d]


@functools.partial(jax.jit, static_argnames=("n_vars", "kmc"))
def xla_grad(scores, key, alpha, *, n_vars, kmc):
    """The current engine path: Pallas sampler (graphs in HBM) + batched
    power chain with closed-form VJP."""
    def h_one(g):
        return acyclic_constr(g, n_vars, jax.lax.Precision.DEFAULT)

    def batched_h(s):
        gs = sample_soft_graphs(s, key, alpha, 1.0, kmc)
        return jax.vmap(jax.vmap(h_one))(gs)

    h_vals, vjp_fn = jax.vjp(batched_h, scores)
    (grad,) = vjp_fn(jnp.full_like(h_vals, 1.0 / kmc))
    return grad


def timeit(fn, *args, n=20):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--p", type=int, default=1000)
    ap.add_argument("--kmc", type=int, default=8)
    args = ap.parse_args()

    key = random.PRNGKey(0)
    scores = 0.5 * random.normal(key, (args.p, args.d, args.d))
    alpha = 0.2

    t_fused = timeit(lambda: fused_grad(scores, 7, alpha, n_vars=args.d,
                                        kmc=args.kmc))
    print(f"fused in-VMEM chain: {t_fused*1e3:8.3f} ms", flush=True)
    t_xla = timeit(lambda: xla_grad(scores, random.PRNGKey(7), alpha,
                                    n_vars=args.d, kmc=args.kmc))
    print(f"XLA sampled chain:   {t_xla*1e3:8.3f} ms", flush=True)
    print(f"speedup: {t_xla / t_fused:.2f}x", flush=True)

    # statistical sanity: both are MC estimates of the same expectation
    # with different noise streams — means should agree loosely
    a = fused_grad(scores[:64], 7, alpha, n_vars=args.d, kmc=64)
    b = xla_grad(scores[:64], random.PRNGKey(9), alpha, n_vars=args.d,
                 kmc=64)
    num = float(jnp.abs(a - b).mean())
    den = float(jnp.abs(b).mean())
    print(f"mean |diff| / mean |xla| over 64-sample MC: {num/den:.3f}",
          flush=True)


if __name__ == "__main__":
    main()
