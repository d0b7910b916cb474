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
