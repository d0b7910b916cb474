"""BGe determinant-pair Pallas kernel vs the XLA elimination path.

Runs in interpret mode on CPU (same kernel code path the TPU executes,
minus Mosaic codegen), against the tested ``masked_logdet_pd_pair``.
"""
import jax
import jax.numpy as jnp
import pytest
from jax import random, vmap

from dibs_tpu.models.linear_gaussian import BGe
from dibs_tpu.ops.bge_kernel import bge_logdet_pairs
from dibs_tpu.ops.logdet import masked_logdet_pd_pair

pytestmark = pytest.mark.heavy  # compile-heavy; excluded from `make test-fast`


def _random_case(key, d, b, interventional=False):
    k1, k2, k3 = random.split(key, 3)
    x = random.normal(k1, (3 * d, d))
    interv = (
        (random.uniform(k2, x.shape) < 0.2).astype(jnp.int32)
        if interventional
        else jnp.zeros_like(x, dtype=jnp.int32)
    )
    model = BGe(n_vars=d)
    r_mats, _ = model._posterior_r_mats(x, interv)
    # hard DAG-ish graphs: random binary with zero diagonal
    gs = (random.uniform(k3, (b, d, d)) < 0.3).astype(jnp.float32)
    gs = gs * (1.0 - jnp.eye(d))
    return r_mats, gs


@pytest.mark.parametrize("d,b,interventional", [
    (5, 7, False),         # unaligned batch -> padding path
    (20, 256, False),      # benchmark shape, one full tile
    (20, 300, True),       # interventional R_j, padded tile
])
def test_bge_pairs_matches_xla_elimination(d, b, interventional):
    r_mats, gs = _random_case(random.PRNGKey(d + b), d, b, interventional)
    pa, full = bge_logdet_pairs(r_mats, gs, interpret=True)
    assert pa.shape == (b, d) and full.shape == (b, d)

    eye = jnp.eye(d)
    ref_pa, ref_full = vmap(
        lambda g: vmap(
            lambda j: masked_logdet_pd_pair(r_mats[j], g[:, j], eye[:, j])
        )(jnp.arange(d)),
        0,
    )(gs)
    assert jnp.allclose(pa, ref_pa, rtol=1e-4, atol=1e-4), (
        jnp.abs(pa - ref_pa).max()
    )
    assert jnp.allclose(full, ref_full, rtol=1e-4, atol=1e-4), (
        jnp.abs(full - ref_full).max()
    )


def test_bge_batched_node_scores_match_single_graph_path():
    """BGe.batched_node_log_marginal_likelihoods == vmapped per-graph scores
    (the estimator-facing contract)."""
    d, b = 8, 12
    key = random.PRNGKey(0)
    r_key, g_key, x_key, i_key = random.split(key, 4)
    x = random.normal(x_key, (30, d))
    interv = (random.uniform(i_key, x.shape) < 0.15).astype(jnp.int32)
    model = BGe(n_vars=d)
    gs = (random.uniform(g_key, (b, d, d)) < 0.3).astype(jnp.float32)
    gs = gs * (1.0 - jnp.eye(d))

    batched = model.batched_interventional_node_log_marginal_probs(
        gs, None, x, interv, None
    )
    single = vmap(
        lambda g: model.node_log_marginal_likelihoods(
            g=g, x=x, interv_targets=interv
        )
    )(gs)
    assert batched.shape == (b, d)
    assert jnp.allclose(batched, single, rtol=1e-4, atol=1e-4), (
        jnp.abs(batched - single).max()
    )


@pytest.mark.heavy  # the unrolled d=72 elimination compiles ~3-4 min on CPU
def test_bge_kernel_large_d_tile128_tier():
    """Round 4: the lane-batched kernel's d > 64 tier (TILE halves to 128
    so the [d, d, TILE] scratch fits VMEM). The d <= 64 cap came from the
    XLA elimination's HBM-rewrite crossover, which never applied to the
    VMEM-resident kernel; at d=128 on hardware it measures 280 ms vs the
    chunked-Cholesky path's 12,014 ms for the cfg6 determinant batch
    (max abs err 1.8e-4). Interpret mode pins the math here."""
    from dibs_tpu.ops.bge_kernel import _tile_for, bge_logdet_pairs

    d, b = 72, 12
    assert _tile_for(d) == 128 and _tile_for(64) == 256
    k1, k2 = random.split(random.PRNGKey(0))
    a = random.normal(k1, (d, d))
    base = a @ a.T + d * jnp.eye(d)
    r_mats = jnp.stack([base + 0.1 * i * jnp.eye(d) for i in range(d)])
    gs = (random.uniform(k2, (b, d, d)) < 0.3).astype(jnp.float32) \
        * (1 - jnp.eye(d))
    pa, full = bge_logdet_pairs(r_mats, gs, interpret=True)
    eye = jnp.eye(d)
    ref_pa, ref_full = vmap(lambda g: vmap(
        lambda j: masked_logdet_pd_pair(r_mats[j], g[:, j], eye[:, j])
    )(jnp.arange(d)))(gs)
    assert jnp.allclose(pa, ref_pa, atol=1e-3), jnp.abs(pa - ref_pa).max()
    assert jnp.allclose(full, ref_full, atol=1e-3), (
        jnp.abs(full - ref_full).max()
    )


def test_bge_batched_chunked_large_d_equals_unchunked(monkeypatch):
    """The large-d XLA fallback chunks the graph batch with lax.map (the
    full masked-matrix batch is ~107 GB at d=128, P=100, M=128 — it cannot
    materialize); the chunked scores must equal the unchunked vmap path,
    including the zero-padded tail chunk."""
    import dibs_tpu.models.linear_gaussian as lg

    d, b = 72, 11  # d > _GE_MAX_D -> Cholesky tier; odd b forces padding
    key = random.PRNGKey(3)
    g_key, x_key = random.split(key)
    x = random.normal(x_key, (40, d))
    interv = jnp.zeros_like(x, dtype=jnp.int32)
    model = BGe(n_vars=d)
    gs = (random.uniform(g_key, (b, d, d)) < 0.2).astype(jnp.float32)
    gs = gs * (1.0 - jnp.eye(d))

    ref = model.batched_node_log_marginal_likelihoods(
        gs=gs, x=x, interv_targets=interv)
    # force chunking (4 graphs per chunk -> 3 chunks, 1 padded graph)
    monkeypatch.setattr(lg, "_BGE_CHUNK_ELEMS", 4 * d * d * d)
    chunked = model.batched_node_log_marginal_likelihoods(
        gs=gs, x=x, interv_targets=interv)
    assert chunked.shape == (b, d)
    assert jnp.allclose(chunked, ref, rtol=1e-5, atol=1e-5), (
        jnp.abs(chunked - ref).max()
    )


def test_bge_pairs_ill_conditioned_collinear_data():
    """Regression: bf16 MXU truncation of the bordered row/column.

    The kernel once extracted the border (R[:, j], R[j, j]) with MXU
    ``dot_general`` matvecs, which truncate f32 operands to bf16 at default
    precision.  The Schur chain cancels catastrophically on collinear data
    (large R entries, tiny complements), so bf16-level input error drove
    ``logdet R[Pa u j]`` to NaN on real datasets (parity cfg1 seeds 7-8 and
    the d=12 quality gate collapsed to empty graphs: AUROC 0.500).  The
    border is now an exact VPU multiply+lane-reduce.  Interpret mode cannot
    reproduce the Mosaic bf16 truncation, but this pins the scenario — on
    TPU (e.g. ``make check``/benchmarks) the same case runs the real
    kernel.
    """
    d, b, n = 20, 64, 100
    key = random.PRNGKey(7)
    k1, k2, k3 = random.split(key, 3)
    # deep-chain SEM analog: x columns are near-collinear with large scale,
    # like the d=20 ER graphs with 40+ edges that triggered the collapse
    base = random.normal(k1, (n, 4))
    mix = random.normal(k2, (4, d))
    x = base @ mix * 8.0 + 0.5 * random.normal(k3, (n, d))
    model = BGe(n_vars=d)
    r_mats, _ = model._posterior_r_mats(x, jnp.zeros_like(x, dtype=jnp.int32))
    assert float(jnp.abs(r_mats).max()) > 1e4  # the regime that broke

    gs = (random.uniform(random.PRNGKey(1), (b, d, d)) < 0.5).astype(
        jnp.float32) * (1.0 - jnp.eye(d))
    interpret = jax.default_backend() != "tpu"
    pa, full = bge_logdet_pairs(r_mats, gs, interpret=interpret)
    assert not bool(jnp.isnan(pa).any())
    assert not bool(jnp.isnan(full).any())

    eye = jnp.eye(d)
    ref_pa, ref_full = vmap(
        lambda g: vmap(
            lambda j: masked_logdet_pd_pair(r_mats[j], g[:, j], eye[:, j])
        )(jnp.arange(d)),
        0,
    )(gs)
    assert jnp.allclose(pa, ref_pa, rtol=1e-4, atol=2e-2), (
        jnp.abs(pa - ref_pa).max()
    )
    assert jnp.allclose(full, ref_full, rtol=1e-4, atol=2e-2), (
        jnp.abs(full - ref_full).max()
    )
