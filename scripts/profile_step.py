#!/usr/bin/env python
"""Per-component timing of the SVGD step for the BASELINE configs.

Times, post-compilation with dependent-chain execution (see
benchmarks/RESULTS.md measurement note), each piece of the step:

  * graph sampling (hard / soft)
  * likelihood scoring of the MC sample batch (BGe determinants / MLP)
  * the full Z-likelihood estimator
  * prior + acyclicity score
  * kernel matrix + transport
  * the complete step

Usage: python scripts/profile_step.py --config 1
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

from dibs_tpu.inference import JointDiBS, MarginalDiBS
from dibs_tpu.models import BGe
from dibs_tpu.target import (
    make_linear_gaussian_equivalent_model,
    make_nonlinear_gaussian_model,
)


def chain_time(fn, arg, n=20):
    """Times a dependent chain of ``n`` applications of ``fn`` (the output
    feeds the next call, forcing real completion on the axon tunnel)."""

    @jax.jit
    def chained(a):
        for _ in range(n):
            a = fn(a)
        return a

    def sync(o):
        # device_get of one scalar: forces real remote completion (the
        # axon tunnel acks dispatch on block_until_ready — RESULTS.md note)
        leaf = jax.tree_util.tree_leaves(o)[0]
        return jax.device_get(leaf.ravel()[0])

    out = chained(arg)
    sync(out)
    t0 = time.perf_counter()
    out = chained(arg)
    sync(out)
    return (time.perf_counter() - t0) / n


def chain_overhead(arg, n=20):
    """Per-step overhead of the chain harness itself: a chained no-op
    costs one dispatch + one scalar device_get (≈ a tunnel round trip)
    for the whole chain, i.e. RTT/n per step. On a healthy tunnel this is
    ~0.1 ms/20 ≈ 5 µs; in degraded phases it can reach ms-scale and
    silently dominate sub-ms phases — measure it and subtract."""
    return chain_time(lambda a: a + 1e-30, arg, n=n)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", type=int, default=1)
    args = p.parse_args()

    key = random.PRNGKey(123)
    key, subk = random.split(key)
    n_particles = 30

    if args.config == 1:
        data, gm, lm = make_linear_gaussian_equivalent_model(
            key=subk, n_vars=20, graph_prior_str="er")
        dibs = MarginalDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
    elif args.config == 2:
        from dibs_tpu.target import make_linear_gaussian_model

        data, gm, lm = make_linear_gaussian_model(
            key=subk, n_vars=20, graph_prior_str="sf")
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
    elif args.config == 3:
        data, gm, lm = make_nonlinear_gaussian_model(
            key=subk, n_vars=20, graph_prior_str="sf", hidden_layers=(5,))
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm)
    elif args.config == 5:
        from dibs_tpu.target import make_linear_gaussian_model

        n_particles = 1000
        data, gm, lm = make_linear_gaussian_model(
            key=subk, n_vars=128, graph_prior_str="sf")
        dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm,
                         n_grad_mc_samples=32, n_acyclicity_mc_samples=8)
    else:
        raise SystemExit("configs 1, 2, 3 and 5 only")

    state = dibs.init_state(key=random.PRNGKey(0), n_particles=n_particles)
    z, theta = state.z, state.theta
    t = jnp.array(100.0)
    keys = random.split(random.PRNGKey(1), n_particles)
    est = dibs.est
    cfg = dibs.cfg
    d = dibs.n_vars

    from dibs_tpu.ops.edges import edge_probs, edge_scores, sample_g
    from dibs_tpu.ops.soft_graphs import sample_hard_graphs

    alpha = cfg.alpha(t)
    # config 5 materializes [P, M, d, d] (~2 GB) in the component views;
    # shorter chains keep each timed execution under the worker watchdog
    n_chain = 5 if args.config == 5 else 20

    phase_ms = {}

    # --- harness overhead calibration ---
    over_ms = chain_overhead(z, n=n_chain) * 1e3
    print(f"chain-harness overhead (subtracted below): {over_ms:8.3f} ms/step")

    def corrected(ms):
        return max(ms * 1e3 - over_ms, 0.0)

    # --- sampling ---
    def samp(z_):
        g_all = sample_hard_graphs(edge_scores(z_), keys[0], alpha,
                                   cfg.n_grad_mc_samples)
        return z_ + g_all.mean() * 1e-20
    ms = chain_time(samp, z, n=n_chain)
    print(f"hard sampling (pallas/xla auto): {corrected(ms):8.3f} ms")

    # --- likelihood scoring of the sampled batch ---
    gs = sample_hard_graphs(edge_scores(z), keys[0], alpha,
                            cfg.n_grad_mc_samples)
    gs = jax.block_until_ready(gs)

    if args.config == 1:
        # route through the same batched scorer the estimator uses (the
        # naive per-graph vmap falls back to masked slogdets and reads
        # ~50x the in-step cost — it is NOT what the hot loop runs)
        def score_batch(g_all):
            p_, m_ = g_all.shape[:2]
            lp = dibs.likelihood_model.batched_node_log_marginal_likelihoods(
                gs=g_all.reshape(p_ * m_, d, d), x=dibs.x,
                interv_targets=dibs.interv_mask)
            # feed back a dependency so the chain is sequential
            return g_all + lp.mean() * 1e-20
    else:
        def score_batch(g_all):
            lp = jax.vmap(
                lambda g_p, th_p: jax.vmap(
                    lambda g: dibs.log_joint_prob(g, th_p, dibs.x,
                                                  dibs.interv_mask, None)
                )(g_p),
                (0, 0),
            )(g_all, theta)
            return g_all + lp.mean() * 1e-20
    ms = chain_time(score_batch, gs, n=n_chain)
    print(f"likelihood scoring [P,M] batch:  {corrected(ms):8.3f} ms")

    # --- full Z-likelihood estimator ---
    def zlik(z_):
        dz, _ = est.eltwise_grad_z_likelihood(
            z_, theta, state.sf_baseline, t, keys)
        return z_ + dz * 1e-20
    ms = chain_time(zlik, z, n=n_chain)
    print(f"Z-likelihood estimator:          {corrected(ms):8.3f} ms")

    if theta is not None:
        def tlik(z_):
            if est.fused_grad_both is not None:
                dz, dth = est.fused_grad_both(z_, theta, t, keys[0])
            else:
                dth = est.eltwise_grad_theta_likelihood(z_, theta, t, keys)
            leaf = jax.tree_util.tree_leaves(dth)[0]
            return z_ + leaf.mean() * 1e-20
        ms = chain_time(tlik, z, n=n_chain)
        print(f"theta estimator (or fused both): {corrected(ms):8.3f} ms")
        if est.fused_grad_both is not None:
            phase_ms["fused_kernel"] = (
                corrected(ms),
                ("fused_forward", "fused_backward", "sampling_in_kernel"),
            )

    # --- prior score ---
    def prior(z_):
        dz = est.eltwise_grad_latent_prior(
            z_, keys, t, dibs._resolve_latent_std(z.shape[2]))
        return z_ + dz * 1e-20
    ms = chain_time(prior, z, n=n_chain)
    print(f"prior + acyclicity score:        {corrected(ms):8.3f} ms")
    phase_ms["prior_acyclicity"] = (corrected(ms), ("acyclicity_prior",))

    # --- transport ---
    from dibs_tpu.inference.transport import joint_transport, marginal_transport

    if theta is None:
        def trans(z_):
            return z_ + marginal_transport(dibs.kernel, z_, z_) * 1e-20
    else:
        def trans(z_):
            phi_z, _ = joint_transport(dibs.kernel, z_, theta, z_, theta)
            return z_ + phi_z * 1e-20
    ms = chain_time(trans, z, n=n_chain)
    print(f"kernel matrix + transport:       {corrected(ms):8.3f} ms")
    phase_ms["transport"] = (corrected(ms), ("kernel_transport",))

    # --- full step ---
    step = dibs._make_step(dibs._resolve_latent_std(z.shape[2]))
    ms = chain_time(step, state, n=n_chain)
    step_ms = corrected(ms)
    print(f"FULL STEP:                       {step_ms:8.3f} ms "
          f"({1e3 / step_ms:.1f} steps/s)")

    # --- roofline accounting (VERDICT r2 item 1) ---
    from dibs_tpu.accounting import (
        bge_step_cost,
        linear_step_cost,
        nonlinear_step_cost,
    )

    if args.config == 1:
        cost = bge_step_cost(d=d, n_obs=dibs.x.shape[0], p=n_particles,
                             m=cfg.n_grad_mc_samples,
                             kmc=cfg.n_acyclicity_mc_samples)
    elif args.config in (2, 5):
        cost = linear_step_cost(d=d, n_obs=dibs.x.shape[0], p=n_particles,
                                m=cfg.n_grad_mc_samples,
                                kmc=cfg.n_acyclicity_mc_samples)
    else:
        cost = nonlinear_step_cost(d=d, n_obs=dibs.x.shape[0],
                                   p=n_particles, m=cfg.n_grad_mc_samples,
                                   kmc=cfg.n_acyclicity_mc_samples)
    row = cost.total_row(step_ms / 1e3)
    print(f"model: {cost.flops/1e9:.2f} GFLOP/step, "
          f"{cost.bytes_min/1e6:.0f} MB/step compulsory, "
          f"{cost.transcendentals/1e6:.0f}M transcendentals")
    print(f"achieved: {row['tflops_achieved']:.2f} TF/s "
          f"({row['mfu_pct']:.1f}% of fp32 peak), "
          f"{row['hbm_gbps_achieved']:.0f} GB/s ({row['hbm_pct']:.1f}% HBM), "
          f"binding ceiling: {row['binding_ceiling']} "
          f"(headroom {row['headroom_x']}x)")
    print("phase GFLOPs:", {k: round(v / 1e9, 2)
                            for k, v in cost.phases.items()})

    # --- per-phase roofline (VERDICT r3 item 3) ---
    # Measured phase times come from the dependent-chain method, which
    # pays per-call dispatch the fori_loop step amortizes — treat the
    # pct-of-ceiling as a lower bound at small configs; at config 5 the
    # phases are ms-scale and the chain overhead is a small fraction.
    # the RTT subtraction carries call-to-call variance of the same order
    # as the RTT itself (tunnel stalls); phases whose corrected time is
    # below that noise floor would divide to absurd TF/s — drop them and
    # defer to the in-step toggle attribution (benchmarks/
    # run_phase_toggle.py), which is dispatch-immune by construction
    noise_floor_ms = max(0.05, 0.15 * over_ms)
    phase_ms = {k: v for k, v in phase_ms.items() if v[0] > noise_floor_ms}
    if phase_ms:
        from dibs_tpu.accounting import phase_roofline

        print("\nper-phase roofline (achieved vs the phase's own "
              "precision/shape ceiling; phases under the "
              f"{noise_floor_ms:.2f} ms harness noise floor omitted):")
        for row in phase_roofline(cost, phase_ms, d=d):
            print(f"  {row['phase']:<18} {row['ms']:8.3f} ms "
                  f"{row['gflop']:9.2f} GF  {row['achieved_tfs']:7.2f} TF/s "
                  f"/ ceil {row['ceiling_tfs']:6.1f}  "
                  f"({row['pct_of_ceiling']:5.1f}%, gap "
                  f"{row['gap_x']}x)")


if __name__ == "__main__":
    main()
