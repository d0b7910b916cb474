import jax
import jax.numpy as jnp
import numpy as onp
import pytest
from jax import random

from dibs_tpu.native import graph as native_graph
from dibs_tpu.ops.acyclic import acyclic_constr, elwise_acyclic_constr, matrix_power


def _reference_h(g, d):
    """Plain autodiff-able reference: tr[(I + G/d)^d] - d."""
    m = jnp.eye(d) + g / d
    return jnp.trace(jnp.linalg.matrix_power(m, d)) - d


@pytest.mark.parametrize("d", [2, 3, 5, 8])
def test_matrix_power_matches_numpy(d):
    key = random.PRNGKey(d)
    m = random.normal(key, (d, d)) * 0.3
    for n in [0, 1, 2, 3, d]:
        expected = onp.linalg.matrix_power(onp.asarray(m, dtype=onp.float64), n)
        assert onp.allclose(matrix_power(m, n), expected, atol=1e-4)


@pytest.mark.parametrize("seed", range(20))
def test_h_zero_iff_dag(seed):
    """Property test: h(G) == 0 exactly for acyclic binary matrices."""
    key = random.PRNGKey(seed)
    d = 6
    g = random.bernoulli(key, 0.3, (d, d)).astype(jnp.float32)
    g = g * (1 - jnp.eye(d))
    h = acyclic_constr(g, d)
    if native_graph.is_dag(onp.asarray(g)):
        assert jnp.abs(h) < 1e-5
    else:
        assert h > 1e-6


def test_forward_matches_reference():
    key = random.PRNGKey(0)
    d = 7
    g = random.uniform(key, (d, d)) * (1 - jnp.eye(d))
    assert jnp.allclose(acyclic_constr(g, d), _reference_h(g, d), atol=1e-5)


@pytest.mark.parametrize("d", [3, 5, 10])
def test_closed_form_grad_matches_autodiff(d):
    """The custom VJP must equal autodiff through the power chain."""
    key = random.PRNGKey(d)
    g = random.uniform(key, (d, d)) * (1 - jnp.eye(d))
    grad_custom = jax.grad(lambda m: acyclic_constr(m, d))(g)
    grad_ref = jax.grad(lambda m: _reference_h(m, d))(g)
    assert jnp.allclose(grad_custom, grad_ref, atol=1e-4)


def test_elwise_batched():
    key = random.PRNGKey(3)
    gs = random.uniform(key, (4, 5, 5))
    hs = elwise_acyclic_constr(gs, 5)
    assert hs.shape == (4,)
    for i in range(4):
        assert jnp.allclose(hs[i], acyclic_constr(gs[i], 5), atol=1e-5)
