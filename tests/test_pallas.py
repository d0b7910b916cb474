"""Pallas fused SE-kernel-matrix vs the XLA Gram path (interpret mode on CPU)."""
import jax.numpy as jnp
import pytest
from jax import random

from dibs_tpu.ops.pallas_kernels import fused_se_matrix
from dibs_tpu.utils.func import pytree_sq_norm_matrix


@pytest.mark.parametrize("a,b,n", [(4, 6, 10), (130, 100, 300), (8, 8, 513)])
def test_fused_se_matrix_matches_xla(a, b, n):
    key = random.PRNGKey(a + b + n)
    k1, k2 = random.split(key)
    x = random.normal(k1, (a, n))
    y = random.normal(k2, (b, n))
    h, scale = 5.0, 1.3

    ref = scale * jnp.exp(-pytree_sq_norm_matrix(x, y) / h)
    out = fused_se_matrix(x, y, h, scale, interpret=True)
    assert out.shape == (a, b)
    assert jnp.allclose(out, ref, atol=1e-5), jnp.abs(out - ref).max()


def test_fused_se_matrix_symmetry():
    x = random.normal(random.PRNGKey(0), (12, 40))
    k = fused_se_matrix(x, x, 7.0, 1.0, interpret=True)
    assert jnp.allclose(k, k.T, atol=1e-6)
    assert jnp.allclose(jnp.diag(k), 1.0, atol=1e-6)
