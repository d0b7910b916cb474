"""Microbenchmark: cfg5 SVGD transport (kernel + phi) variants.

The round-4 per-phase roofline put "kernel + transport" at 20.2 ms by the
dependent-chain method vs a ~6-7 ms matmul floor. The chain method carries
~1.6x inflation at this scale (measured on the acyclicity phase), so this
bench measures the phase STANDALONE with real completion timing, plus two
restructured candidates:

  * ``merged``   — fold each target's driver and repulsion matmuls into ONE
                   matmul with doubled reduction depth:
                   ``phi_z ∝ [K | c_z K_z] @ [dz; z] − c_z colsum(K_z) ⊙ z``
                   (2 big matmuls per step instead of 4).
  * ``xla_gram`` — squared-norm Gram matrices via XLA (HIGHEST) instead of
                   the fused Pallas SE kernel, to price the Pallas path.

Shapes: cfg5 (joint linear d=128, P=1000): z [P, d, d, 2] (32768 features),
theta [P, d, d] (16384 features).

Usage: python benchmarks/bench_transport.py [--p 1000] [--d 128]
"""
import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random

from dibs_tpu.inference.transport import joint_transport
from dibs_tpu.kernel import JointAdditiveFrobeniusSEKernel


def make_current(use_pallas):
    kernel = JointAdditiveFrobeniusSEKernel(use_pallas=use_pallas)

    @jax.jit
    def f(z, theta, dz, dtheta):
        return joint_transport(kernel, z, theta, dz, dtheta)

    return f


def make_merged(use_pallas):
    kernel = JointAdditiveFrobeniusSEKernel(use_pallas=use_pallas)

    @jax.jit
    def f(z, theta, dz, dtheta):
        from dibs_tpu.config import transport_matmul_precision

        p = z.shape[0]
        k_z, k_t, c_z, c_t = kernel.component_matrices_and_factors(
            z, theta, z, theta)
        k_mat = k_z + k_t
        prec = transport_matmul_precision()

        def phi(k_rep, c, values, grads):
            vf = values.reshape(p, -1)
            gf = grads.reshape(p, -1)
            # [2P, n] stacked rhs; [P, 2P] stacked lhs — one matmul covers
            # driver + repulsion cross terms
            rhs = jnp.concatenate([gf, vf], axis=0)
            lhs = jnp.concatenate([k_mat.T, c * k_rep.T], axis=1)
            out = jnp.matmul(lhs, rhs, precision=prec)
            out = out - (c * k_rep.sum(axis=0))[:, None] * vf
            return (-out / p).reshape(values.shape)

        return phi(k_z, c_z, z, dz), phi(k_t, c_t, theta, dtheta)

    return f


def make_fused_xla():
    """Round-5 candidate: centered-once operands shared between Gram and
    repulsion + driver/repulsion folded per family by the SE identity

        k_mat^T @ dz + c_z (K_z^T @ zc - colsum_z ⊙ zc)
      = K_z^T @ (dz + c_z zc) + K_t^T @ dz - c_z colsum_z ⊙ zc

    so each family is two [P,P]@[P,n] matmuls over rhs's that reuse the
    SAME centered flat operand the Grams consumed (one f32->hi/lo split
    instead of one per matmul), with the whole epilogue one fusion."""
    from dibs_tpu.config import transport_matmul_precision

    h_z, h_t = 5.0, 500.0

    @jax.jit
    def f(z, theta, dz, dtheta):
        p = z.shape[0]
        prec = transport_matmul_precision()
        hi = jax.lax.Precision.HIGHEST

        def prep(values):
            vf = values.reshape(p, -1)
            vf = vf - vf.mean(axis=0, keepdims=True)
            sq = jnp.sum(vf * vf, axis=-1)
            cross = jnp.matmul(vf, vf.T, precision=hi)
            sqd = jnp.maximum(sq[:, None] + sq[None, :] - 2.0 * cross, 0.0)
            sqd = sqd * (1.0 - jnp.eye(p, dtype=sqd.dtype))
            return vf, sqd

        zf, sq_z = prep(z)
        tf, sq_t = prep(theta)
        k_z = jnp.exp(-sq_z / h_z)
        k_t = jnp.exp(-sq_t / h_t)
        c_z, c_t = -2.0 / h_z, -2.0 / h_t

        def phi(k_own, k_other, c, vf, grads, shape):
            gf = grads.reshape(p, -1)
            out = (jnp.matmul(k_own.T, gf + c * vf, precision=prec)
                   + jnp.matmul(k_other.T, gf, precision=prec)
                   - (c * k_own.sum(axis=0))[:, None] * vf)
            return (-out / p).reshape(shape)

        return (phi(k_z, k_t, c_z, zf, dz, z.shape),
                phi(k_t, k_z, c_t, tf, dtheta, theta.shape))

    return f


def make_pallas_phi():
    """Round-5 integrated path: XLA Grams (auto dispatch) + the fused
    Pallas phi kernel with in-kernel centering (ops/transport_kernel.py) —
    no [P, n] intermediate (centered copy, rhs combine, epilogue)
    round-trips HBM in the phi family. This is exactly what
    joint_transport now selects at this shape."""
    kernel = JointAdditiveFrobeniusSEKernel()

    @jax.jit
    def f(z, theta, dz, dtheta):
        from dibs_tpu.inference.transport import _fused_phi_or_none

        k_z, k_t, c_z, c_t = kernel.component_matrices_and_factors(
            z, theta, z, theta)
        phi_z = _fused_phi_or_none(k_z, k_t, c_z, z, dz, kernel)
        phi_t = _fused_phi_or_none(k_t, k_z, c_t, theta, dtheta, kernel)
        assert phi_z is not None and phi_t is not None
        return phi_z, phi_t

    return f


def timeit(fn, *args, n=30):
    out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--p", type=int, default=1000)
    ap.add_argument("--d", type=int, default=128)
    args = ap.parse_args()
    p, d = args.p, args.d

    ks = random.split(random.PRNGKey(0), 4)
    z = random.normal(ks[0], (p, d, d, 2))
    theta = random.normal(ks[1], (p, d, d))
    dz = random.normal(ks[2], (p, d, d, 2))
    dtheta = random.normal(ks[3], (p, d, d))

    n_z, n_t = d * d * 2, d * d
    gflop = 2 * p * p * (2 * n_z + 2 * n_t + n_z + n_t) / 1e9
    print(f"total matmul GFLOP/step: {gflop:.1f} "
          f"(grams HIGHEST, phi HIGH)", flush=True)

    arms = {
        "current (pallas gram)": make_current(None),
        "current (xla gram)": make_current(False),
        "merged (pallas gram)": make_merged(None),
        "merged (xla gram)": make_merged(False),
        "fused_xla (r5)": make_fused_xla(),
        "pallas_phi (r5)": make_pallas_phi(),
    }
    base = None
    results = {}
    outs = {}
    for name, fn in arms.items():
        t = timeit(fn, z, theta, dz, dtheta)
        results[name] = t
        out = fn(z, theta, dz, dtheta)
        outs[name] = out
        if base is None:
            base = out
        else:
            # Same-gram arms must agree to matmul rounding. Across gram
            # backends the tolerance is loose BY DESIGN: at this input
            # scale (N(0,1), n=32768 features, h=5) the Gram diagonal is
            # pure f32 cancellation noise (~0.3 absolute in sq, ~6% in
            # exp(-sq/h)); pallas and XLA round it differently. The
            # repulsion cancels exactly for K=diag, so only the driver's
            # per-particle k_ii scaling differs — irrelevant to pricing.
            ref = outs.get(name.replace("merged", "current"), base)
            tol = 3e-3 if name.startswith("merged") else 5e-2
            err = max(float(jnp.abs(a - b).max() / (jnp.abs(a).max() + 1e-9))
                      for a, b in zip(jax.tree_util.tree_leaves(ref),
                                      jax.tree_util.tree_leaves(out)))
            assert err < tol, f"{name}: rel err {err}"
        print(f"{name:24s} {t*1e3:8.3f} ms  "
              f"({gflop/t/1e3:6.1f} TF/s achieved)", flush=True)

    best = min(results, key=results.get)
    cur = results["current (pallas gram)"]
    print(f"best: {best} — {cur/results[best]:.2f}x vs current", flush=True)


if __name__ == "__main__":
    main()
