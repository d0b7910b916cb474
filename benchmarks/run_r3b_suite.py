"""Round-3 follow-up TPU suite (run after the parity job frees the chip).

Stages:
  1. fused nonlinear kernel: TPU exactness vs autodiff (debug noise) +
     config-3 benchmark with the kernel engaged
  2. per-component profiles (config 1, config 3) via scripts/profile_step
  3. particle-scaling curve incl. a P=2000 transport-vs-estimator split
  4. on-device quality gate
"""
import json
import os

import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import random

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "RESULTS_r3b.json")
results = {}


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save():
    with open(OUT, "w") as f:
        json.dump(results, f, indent=2)


def stage_fused_nl():
    from jax.scipy.special import logsumexp

    from dibs_tpu.inference.fused_nonlinear import (
        _pad_plan_nl,
        fused_nonlinear_estimators,
    )
    from dibs_tpu.models import DenseNonlinearGaussian
    from dibs_tpu.ops.edges import edge_scores
    from tests.test_fused_nonlinear import _noise_graphs, _setup

    d, h1, n_obs, p, m, alpha, tau = 6, 3, 12, 2, 20, 1.7, 1.0
    model, thetas, x, interv, zs = _setup(d, h1, n_obs, p, "relu")
    dp, bm, m_total = _pad_plan_nl(d, m)
    uniforms = random.uniform(random.PRNGKey(42),
                              (p, 2, (m_total // bm) * dp, bm * dp),
                              minval=1e-4, maxval=1.0 - 1e-4)
    t0 = time.perf_counter()
    dscores, dtheta = fused_nonlinear_estimators(
        zs=zs, thetas=thetas, x=x, interv_mask=interv,
        key=random.PRNGKey(7), alpha=alpha, tau=tau, n_samples=m,
        model=model, debug_noise=uniforms)
    dscores = jax.device_get(dscores)
    log(f"fused-nl TPU compile+first (debug): {time.perf_counter()-t0:.1f}s")

    scores = edge_scores(zs)
    s_pad = jnp.zeros((dp, dp)).at[:d, :d].set(scores[0])
    theta_p = jax.tree_util.tree_map(lambda a: a[0], thetas)

    def f_z(s_d):
        sp = jnp.zeros((dp, dp)).at[:d, :d].set(s_d)
        softs, _ = _noise_graphs(uniforms[0], sp, d, dp, bm, m, alpha, tau)
        return logsumexp(jax.vmap(
            lambda g: model.interventional_log_joint_prob(g, theta_p, x,
                                                          interv, None)
        )(softs))

    want = jax.device_get(jax.grad(f_z)(scores[0]))
    err = float(abs(dscores[0] - want).max() / (abs(want).max() + 1e-9))
    log(f"fused-nl TPU exactness rel err: {err:.2e}")
    assert err < 5e-3, err
    results["fused_nl_tpu_rel_err"] = err
    save()

    # sharded (1-device mesh) fused-nl path: shard_map ∘ pallas plumbing +
    # global-index seeding must reproduce the unsharded call bitwise
    from dibs_tpu.parallel import make_particle_mesh, particle_sharding
    from dibs_tpu.parallel.shard_ops import sharded_fused_nonlinear

    mesh = make_particle_mesh(jax.devices()[:1])
    sharding = particle_sharding(mesh)
    kw = dict(zs=zs, thetas=thetas, x=x, interv_mask=interv,
              key=random.PRNGKey(7), alpha=alpha, tau=tau, n_samples=m,
              model=model)
    ds_plain, dt_plain = fused_nonlinear_estimators(**kw)
    ds_shard, dt_shard = sharded_fused_nonlinear(sharding=sharding, **kw)
    assert jnp.allclose(ds_plain, ds_shard), "sharded fused-nl != unsharded"
    for a, b in zip(jax.tree_util.tree_leaves(dt_plain),
                    jax.tree_util.tree_leaves(dt_shard)):
        assert jnp.allclose(a, b)
    log("sharded fused-nl (1-device mesh) == unsharded: ok")
    results["fused_nl_sharded_ok"] = True
    save()

    # config-3 benchmark with the kernel engaged (first compile at d=20
    # may take minutes — dp=24 ragged Mosaic layout; persistent-cached)
    from benchmarks.run_benchmarks import config_3
    t0 = time.perf_counter()
    out = config_3(False)
    out["stage_wall_s"] = round(time.perf_counter() - t0, 1)
    results["config_3_fused_nl"] = out
    log(f"config_3 (fused-nl kernel): {out['steps_per_sec']:.1f} steps/s "
        f"(compile {out.get('compile_s', 0):.1f}s)")
    save()


def stage_profiles():
    # in-process (NOT a subprocess): the parent holds the single-client
    # TPU tunnel, and a child process would block in acquisition
    import contextlib
    import io

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import profile_step

    for cfg in (1, 3):
        log(f"--- profile_step config {cfg} ---")
        buf = io.StringIO()
        argv_save = sys.argv
        try:
            sys.argv = ["profile_step.py", "--config", str(cfg)]
            with contextlib.redirect_stdout(buf):
                profile_step.main()
        except Exception as e:  # keep later stages alive
            buf.write(f"\nPROFILE FAILED: {e!r}\n")
        finally:
            sys.argv = argv_save
        print(buf.getvalue(), flush=True)
        results[f"profile_cfg{cfg}"] = buf.getvalue()
        save()


def stage_scaling():
    from benchmarks.run_benchmarks import scaling_curve, time_steps_per_sec
    from dibs_tpu.inference import JointDiBS
    from dibs_tpu.inference.transport import joint_transport
    from dibs_tpu.target import make_linear_gaussian_model

    rows = scaling_curve()
    results["scaling_r3"] = rows
    save()

    # transport share at P=2000 (weak-item 6: verify the [P,P]-coupling
    # attribution with a real measurement)
    key = random.PRNGKey(123)
    key, subk = random.split(key)
    data, gm, lm = make_linear_gaussian_model(
        key=subk, n_vars=128, graph_prior_str="sf")
    dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm,
                     n_grad_mc_samples=32, n_acyclicity_mc_samples=8)
    st = dibs.init_state(key=random.PRNGKey(0), n_particles=2000)

    import functools

    @functools.partial(jax.jit, static_argnames="n")
    def run_transport(z, theta, n):
        def body(_, zz):
            phi_z, _ = joint_transport(dibs.kernel, zz, theta, zz, theta)
            return zz + 1e-20 * phi_z
        return jax.lax.fori_loop(0, n, body, z)

    # warm with the SAME static n so the timed call is compile-free
    z = run_transport(st.z, st.theta, 13)
    jax.device_get(z[0, 0, 0, 0])
    t0 = time.perf_counter()
    z = run_transport(st.z, st.theta, 13)
    jax.device_get(z[0, 0, 0, 0])
    transport_ms = (time.perf_counter() - t0) / 13 * 1e3
    log(f"P=2000 transport-only: {transport_ms:.1f} ms/iter")
    results["p2000_transport_ms"] = transport_ms
    save()


def stage_spectral_cfg5():
    """Config-5 with acyclicity='spectral': the NOTEARS power chain is ~33%
    of the config's FLOPs; measure the steps/s delta of the O(K d^2)
    spectral-radius penalty (beyond-reference option)."""
    from benchmarks.run_benchmarks import time_steps_per_sec
    from dibs_tpu.inference import JointDiBS
    from dibs_tpu.target import make_linear_gaussian_model

    key = random.PRNGKey(123)
    key, subk = random.split(key)
    data, gm, lm = make_linear_gaussian_model(
        key=subk, n_vars=128, graph_prior_str="sf")
    dibs = JointDiBS(
        x=data.x, graph_model=gm, likelihood_model=lm,
        n_grad_mc_samples=32, n_acyclicity_mc_samples=8,
        acyclicity="spectral",
    )
    sps, compile_s = time_steps_per_sec(dibs, 1000, chunk=5, repeats=2)
    log(f"config_5 spectral: {sps:.2f} steps/s (compile {compile_s:.1f}s)")
    results["config_5_spectral"] = {"steps_per_sec": sps,
                                    "compile_s": compile_s}
    save()

    # quality check at the reduced protocol (same thresholds as the gate)
    from dibs_tpu.metrics import expected_shd, threshold_metrics

    key, subk = random.split(random.PRNGKey(123))
    data12, gm12, lm12 = make_linear_gaussian_model(
        key=subk, n_vars=12, graph_prior_str="sf")
    d12 = JointDiBS(x=data12.x, graph_model=gm12, likelihood_model=lm12,
                    acyclicity="spectral")
    gs, thetas = d12.sample(key=key, n_particles=12, steps=800)
    dist = d12.get_mixture(gs, thetas)
    auroc = float(threshold_metrics(dist=dist, g=data12.g)["roc_auc"])
    eshd = float(expected_shd(dist=dist, g=data12.g))
    log(f"spectral quality (d=12/800): AUROC {auroc:.3f} E-SHD {eshd:.1f}")
    results["spectral_quality_d12"] = {"auroc": auroc, "eshd": eshd}
    save()


def stage_quality_gate():
    # in-process for the same tunnel-exclusivity reason as stage_profiles
    import contextlib
    import io

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts"))
    import quality_gate

    buf = io.StringIO()
    rc = 0
    try:
        with contextlib.redirect_stdout(buf):
            quality_gate.main()
    except SystemExit as e:
        rc = int(e.code or 0)
    except Exception as e:
        rc = 1
        buf.write(f"\nGATE CRASHED: {e!r}\n")
    print(buf.getvalue(), flush=True)
    results["quality_gate_rc"] = rc
    results["quality_gate_out"] = buf.getvalue()
    save()


def main():
    log("=== stage 1: fused nonlinear on TPU ===")
    stage_fused_nl()
    log("=== stage 2: profiles ===")
    stage_profiles()
    log("=== stage 3: scaling ===")
    stage_scaling()
    log("=== stage 4: spectral acyclicity at config 5 ===")
    stage_spectral_cfg5()
    log("=== stage 5: quality gate ===")
    stage_quality_gate()
    log(f"DONE -> {OUT}")


if __name__ == "__main__":
    main()
