"""Fleet B-scaling sweep (VERDICT r3 item 1).

Measures fleet inference (dibs_tpu.fleet: one engine's SVGD vmapped over B
independent same-shaped datasets) at B = 1..32 for the two small-d configs
whose r3 roofline verdicts said "op/latency-bound" at 2-5% MFU — a label
the measured fleet result (B=8 only 1.2x aggregate) contradicts: if ~95%
of the chip were idle, batching 8 datasets should be nearly free.

This sweep settles it: per-B fleet step times (device_get-closed, 1-chunk
subtraction — the only honest timing on this tunnel), a linear fit
t(B) = t_fixed + B * t_work separating fixed per-step overhead from
throughput-bound work, and per-phase attribution at B=1 / B=8 naming
which phase carries the B-scaling. Results land in FLEET_SCALING.json and
benchmarks/RESULTS.md; accounting.py's multichip projection consumes the
fitted t_fixed.

Usage: python benchmarks/run_fleet_sweep.py [--engines cfg1 cfg2]
       [--bs 1 2 4 8 16 32] [--out benchmarks/FLEET_SCALING.json]
"""
import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax, random, vmap

from dibs_tpu.inference import JointDiBS, MarginalDiBS
from dibs_tpu.target import (
    make_linear_gaussian_equivalent_model,
    make_linear_gaussian_model,
)

P_PARTICLES = 30


def make_engine(name):
    """Returns (dibs, datasets_fn): engine + a [B, N, d] dataset factory
    (B independent synthetic problems from distinct seeds)."""
    key, subk = random.split(random.PRNGKey(123))
    if name == "cfg1":
        data, gm, lm = make_linear_gaussian_equivalent_model(
            key=subk, n_vars=20, graph_prior_str="er")
        dibs = MarginalDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
        maker = functools.partial(make_linear_gaussian_equivalent_model,
                                  n_vars=20, graph_prior_str="er")
    else:
        data, gm, lm = make_linear_gaussian_model(
            key=subk, n_vars=20, graph_prior_str="sf")
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
        maker = functools.partial(make_linear_gaussian_model,
                                  n_vars=20, graph_prior_str="sf")

    def datasets(b):
        xs = []
        for i in range(b):
            d_i, _, _ = maker(key=random.PRNGKey(1000 + i))
            xs.append(d_i.x)
        return jnp.stack(xs)

    return dibs, datasets


def time_fleet_steps(dibs, xs, chunk, repeats=4):
    """Per-fleet-step seconds (all B datasets advance one SVGD step),
    device_get-closed with 1-chunk subtraction (RESULTS.md timing note)."""
    n_b = xs.shape[0]
    masks = jnp.zeros_like(xs, dtype=jnp.int32)
    keys = random.split(random.PRNGKey(0), n_b)
    states = vmap(
        lambda k: dibs.init_state(key=k, n_particles=P_PARTICLES))(keys)
    step_fn = dibs._make_step(dibs._resolve_latent_std(states.z.shape[3]))
    bstep = vmap(step_fn, in_axes=(0, 0, 0))

    @functools.partial(jax.jit, static_argnames="n")
    def run(st, n):
        return lax.fori_loop(0, n, lambda _, s: bstep(s, xs, masks), st)

    def probe(st):
        return jax.device_get(st.z[0, 0, 0, 0, 0])

    t0 = time.perf_counter()
    states = run(states, chunk)
    probe(states)
    compile_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    states = run(states, chunk)
    probe(states)
    t_one = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(repeats):
        states = run(states, chunk)
    probe(states)
    t_many = time.perf_counter() - t0
    sec_per_step = max(t_many - t_one, 1e-9) / ((repeats - 1) * chunk)
    return sec_per_step, compile_s


def chain_time(fn, arg, n=20):
    """Dependent-chain phase timing (scripts/profile_step.py)."""

    @jax.jit
    def chained(a):
        for _ in range(n):
            a = fn(a)
        return a

    def sync(o):
        leaf = jax.tree_util.tree_leaves(o)[0]
        return jax.device_get(leaf.ravel()[0])

    out = chained(arg)
    sync(out)
    t0 = time.perf_counter()
    out = chained(arg)
    sync(out)
    return (time.perf_counter() - t0) / n


def phase_attribution(dibs, xs, joint):
    """Per-phase dependent-chain times of the B-vmapped step components."""
    n_b = xs.shape[0]
    masks = jnp.zeros_like(xs, dtype=jnp.int32)
    keys = random.split(random.PRNGKey(0), n_b)
    states = vmap(
        lambda k: dibs.init_state(key=k, n_particles=P_PARTICLES))(keys)
    z_b, th_b = states.z, states.theta
    t = jnp.array(100.0)
    est = dibs.est
    pkeys = random.split(random.PRNGKey(1), n_b * P_PARTICLES).reshape(
        (n_b, P_PARTICLES) + random.PRNGKey(0).shape)
    k_one = random.split(random.PRNGKey(2), n_b)
    out = {}

    if joint:
        def kern(z_):
            dz, dth = vmap(
                lambda z1, th1, x1, iv1, k1: est.fused_grad_both(
                    z1, th1, t, k1, x=x1, interv_mask=iv1),
            )(z_, th_b, xs, masks, k_one)
            return z_ + dz * 1e-20
        out["fused_kernels"] = chain_time(kern, z_b)
    else:
        def zlik(z_):
            dz, _ = vmap(
                lambda z1, sfb, x1, iv1, ks: est.eltwise_grad_z_likelihood(
                    z1, None, sfb, t, ks, x=x1, interv_mask=iv1),
            )(z_, states.sf_baseline, xs, masks, pkeys)
            return z_ + dz * 1e-20
        out["z_likelihood"] = chain_time(zlik, z_b)

    def prior(z_):
        dz = vmap(
            lambda z1, ks: est.eltwise_grad_latent_prior(
                z1, ks, t, dibs._resolve_latent_std(z_b.shape[3])),
        )(z_, pkeys)
        return z_ + dz * 1e-20
    out["prior_acyclicity"] = chain_time(prior, z_b)

    if joint:
        from dibs_tpu.inference.transport import joint_transport

        def trans(z_):
            phi_z, _ = vmap(
                lambda z1, th1: joint_transport(dibs.kernel, z1, th1, z1,
                                                th1),
            )(z_, th_b)
            return z_ + phi_z * 1e-20
    else:
        from dibs_tpu.inference.transport import marginal_transport

        def trans(z_):
            return z_ + vmap(
                lambda z1: marginal_transport(dibs.kernel, z1, z1))(z_) \
                * 1e-20
    out["transport"] = chain_time(trans, z_b)

    step_fn = dibs._make_step(dibs._resolve_latent_std(z_b.shape[3]))
    bstep = vmap(step_fn, in_axes=(0, 0, 0))
    out["full_step"] = chain_time(lambda s: bstep(s, xs, masks), states)
    return {k: round(v * 1e3, 3) for k, v in out.items()}  # ms


def fit_linear(bs, ts):
    """Least-squares t(B) = a + b*B."""
    import numpy as np

    bs = np.asarray(bs, float)
    ts = np.asarray(ts, float)
    A = np.stack([np.ones_like(bs), bs], axis=1)
    (a, b), *_ = np.linalg.lstsq(A, ts, rcond=None)
    resid = ts - (a + b * bs)
    r2 = 1.0 - float((resid**2).sum()) / float(
        ((ts - ts.mean())**2).sum() + 1e-30)
    return float(a), float(b), r2


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engines", nargs="+", default=["cfg2", "cfg1"])
    ap.add_argument("--bs", type=int, nargs="+", default=[1, 2, 4, 8, 16, 32])
    ap.add_argument("--out", default="benchmarks/FLEET_SCALING.json")
    ap.add_argument("--skip-phases", action="store_true")
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}", flush=True)
    results = {"device": str(jax.devices()[0]), "n_particles": P_PARTICLES}
    for name in args.engines:
        dibs, datasets = make_engine(name)
        rows = []
        for b in args.bs:
            xs = datasets(b)
            # keep each timed dispatch ~0.1-3 s of device work
            chunk = max(5, min(50, 400 // b))
            sec, compile_s = time_fleet_steps(dibs, xs, chunk)
            row = {"B": b, "ms_per_step": round(sec * 1e3, 3),
                   "steps_per_sec": round(1.0 / sec, 1),
                   "aggregate_dataset_steps_per_sec": round(b / sec, 1),
                   "compile_s": round(compile_s, 1)}
            rows.append(row)
            print(f"{name} B={b}: {row['ms_per_step']} ms/step, "
                  f"aggregate {row['aggregate_dataset_steps_per_sec']} "
                  f"dataset-steps/s (compile {compile_s:.0f}s)", flush=True)
        a, bcoef, r2 = fit_linear([r["B"] for r in rows],
                                  [r["ms_per_step"] for r in rows])
        base = rows[0]["aggregate_dataset_steps_per_sec"]
        results[name] = {
            "sweep": rows,
            "fit_ms": {"t_fixed": round(a, 3), "t_per_dataset": round(
                bcoef, 4), "r2": round(r2, 4)},
            "aggregate_speedup_at_B8": round(
                next(r["aggregate_dataset_steps_per_sec"] for r in rows
                     if r["B"] == 8) / base, 2) if any(
                r["B"] == 8 for r in rows) else None,
        }
        print(f"{name} fit: t(B) = {a:.3f} + {bcoef:.4f}*B ms (r2={r2:.4f})",
              flush=True)
        if not args.skip_phases:
            for b in (1, 8):
                ph = phase_attribution(dibs, datasets(b),
                                       joint=name != "cfg1")
                results[name][f"phases_ms_B{b}"] = ph
                print(f"{name} phases at B={b}: {ph}", flush=True)

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(f"wrote {args.out}", flush=True)


if __name__ == "__main__":
    main()
