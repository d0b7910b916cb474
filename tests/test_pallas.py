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


def test_sample_soft_graphs_vjp_matches_autodiff():
    """The storage-free custom VJP must equal autodiff of the same formula."""
    import jax

    from dibs_tpu.ops.soft_graphs import sample_soft_graphs
    from dibs_tpu.utils.func import zero_diagonal

    key = random.PRNGKey(3)
    b, m, d = 2, 4, 6
    scores = random.normal(key, (b, d, d))
    alpha, tau = 1.7, 1.3

    def naive(s, a):
        eps = random.logistic(key, shape=(b, m, d, d))
        return zero_diagonal(jax.nn.sigmoid(tau * (eps + a * s[:, None])))

    out = sample_soft_graphs(scores, key, alpha, tau, m, use_pallas=False)
    assert jnp.allclose(out, naive(scores, alpha), atol=1e-6)

    cot = random.normal(random.PRNGKey(4), out.shape)
    _, vjp_custom = jax.vjp(
        lambda s, a: sample_soft_graphs(s, key, a, tau, m, use_pallas=False),
        scores, jnp.float32(alpha),
    )
    _, vjp_auto = jax.vjp(naive, scores, jnp.float32(alpha))
    ds_c, da_c = vjp_custom(cot)
    ds_a, da_a = vjp_auto(cot)
    assert jnp.allclose(ds_c, ds_a, atol=1e-5)
    assert jnp.allclose(da_c, da_a, atol=1e-3)


def test_gumbel_soft_graphs_pallas_interpret():
    """Pallas path: shape/range/diagonal/statistics.

    The TPU hardware-PRNG primitive (`prng_seed`) has no CPU interpreter
    lowering in this JAX version, so this test only runs on a TPU backend
    (exercised by `benchmarks/run_benchmarks.py --configs 5` and the
    TPU validation in scripts/validate_tpu.py).
    """
    import jax

    if jax.default_backend() != "tpu":
        pytest.skip("pltpu.prng_seed has no CPU interpreter lowering")

    from dibs_tpu.ops.pallas_kernels import gumbel_soft_graphs_pallas

    b, m, d = 2, 8, 128
    scores = jnp.zeros((b, d, d))
    out = gumbel_soft_graphs_pallas(scores, 7, 0.0, 1.0, m)
    assert out.shape == (b, m, d, d)
    assert jnp.all((out >= 0) & (out <= 1))
    assert jnp.all(out[:, :, jnp.arange(d), jnp.arange(d)] == 0)
    # with alpha=0 and tau=1, entries are sigmoid(Logistic(0,1)) = U(0,1):
    # mean 0.5, var 1/12
    off = out[:, :, ~jnp.eye(d, dtype=bool)]
    assert abs(float(off.mean()) - 0.5) < 0.01
    assert abs(float(off.var()) - 1 / 12) < 0.005


def test_fused_se_matrix_symmetry():
    x = random.normal(random.PRNGKey(0), (12, 40))
    k = fused_se_matrix(x, x, 7.0, 1.0, interpret=True)
    assert jnp.allclose(k, k.T, atol=1e-6)
    assert jnp.allclose(jnp.diag(k), 1.0, atol=1e-6)
