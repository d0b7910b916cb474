import jax.numpy as jnp
import numpy as onp
import pytest
from jax import random

from dibs_tpu.models.graph import (
    ErdosReniDAGDistribution,
    ScaleFreeDAGDistribution,
    UniformDAGDistributionRejection,
)
from dibs_tpu.native import graph as native_graph


@pytest.mark.parametrize("dist_cls", [ErdosReniDAGDistribution, ScaleFreeDAGDistribution])
def test_samples_are_dags(dist_cls):
    d = 10
    model = dist_cls(d)
    for seed in range(5):
        g = onp.asarray(model.sample_G(random.PRNGKey(seed)))
        assert g.shape == (d, d)
        assert native_graph.is_dag(g), f"{dist_cls.__name__} produced a cycle"
        assert onp.all(onp.diag(g) == 0)


def test_er_edge_count_expectation():
    d, epn = 12, 2
    model = ErdosReniDAGDistribution(d, n_edges_per_node=epn)
    counts = [
        int(onp.asarray(model.sample_G(random.PRNGKey(s))).sum()) for s in range(40)
    ]
    mean_edges = onp.mean(counts)
    assert abs(mean_edges - epn * d) < 6.0


def test_sf_edge_count_and_hubs():
    d, m = 15, 2
    model = ScaleFreeDAGDistribution(d, n_edges_per_node=m)
    g = onp.asarray(model.sample_G(random.PRNGKey(0)))
    # BA adds min(m, v) edges for vertex v
    expected_edges = sum(min(m, v) for v in range(d))
    assert g.sum() == expected_edges


def test_soft_log_prob_agrees_with_hard_on_binary():
    d = 8
    er = ErdosReniDAGDistribution(d)
    sf = ScaleFreeDAGDistribution(d)
    g = er.sample_G(random.PRNGKey(1)).astype(jnp.float32)
    assert jnp.allclose(
        er.unnormalized_log_prob_soft(soft_g=g), er.unnormalized_log_prob(g=g),
        atol=1e-4,
    )
    assert jnp.allclose(
        sf.unnormalized_log_prob_soft(soft_g=g), sf.unnormalized_log_prob(g=g),
        atol=1e-4,
    )


def test_uniform_rejection_small():
    model = UniformDAGDistributionRejection(4)
    g = onp.asarray(model.sample_G(random.PRNGKey(2)))
    assert native_graph.is_dag(g)
    assert model.unnormalized_log_prob_soft(soft_g=jnp.ones((4, 4))) == 0.0


def test_native_toposort_and_is_dag():
    # chain 0 -> 1 -> 2 with extra edge 0 -> 2
    mat = onp.zeros((3, 3), dtype=onp.int32)
    mat[0, 1] = mat[1, 2] = mat[0, 2] = 1
    order = native_graph.topological_sort(mat)
    pos = {int(v): i for i, v in enumerate(order)}
    assert pos[0] < pos[1] < pos[2]
    assert native_graph.is_dag(mat)
    mat[2, 0] = 1  # close the cycle
    assert not native_graph.is_dag(mat)
    assert native_graph.topological_sort(mat) is None


def test_permute_vertices_roundtrip():
    mat = onp.zeros((4, 4), dtype=onp.int32)
    mat[0, 1] = mat[1, 2] = mat[2, 3] = 1
    perm = onp.array([2, 0, 3, 1])
    out = native_graph.permute_vertices(mat, perm)
    for i in range(4):
        for j in range(4):
            assert out[perm[i], perm[j]] == mat[i, j]
