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


def test_spectral_penalty_zero_iff_dag():
    """rho(G) == 0 exactly for nilpotent (acyclic) binary adjacencies and
    > 0 for cyclic ones, matching the NOTEARS penalty's zero set."""
    import numpy as onp
    from jax import random

    from dibs_tpu.ops.acyclic import acyclic_constr, acyclic_constr_spectral

    key = random.PRNGKey(0)
    d = 12
    for trial in range(6):
        key, k1, k2 = random.split(key, 3)
        # random DAG: strictly lower-triangular under a random permutation
        tril = (random.uniform(k1, (d, d)) < 0.3).astype(jnp.float32)
        tril = jnp.tril(tril, k=-1)
        perm = random.permutation(k2, d)
        p_mat = jnp.eye(d)[perm]
        dag = p_mat.T @ tril @ p_mat
        h_spec = float(acyclic_constr_spectral(dag))
        assert abs(h_spec) < 1e-5, h_spec

        # add a 2-cycle -> both penalties positive
        i, j = int(onp.argmax(onp.asarray(dag).sum(1) > 0)), None
        src = onp.asarray(dag)
        nz = onp.argwhere(src > 0)
        if len(nz) == 0:
            continue
        a, b = nz[0]
        cyc = dag.at[b, a].set(1.0)
        assert float(acyclic_constr_spectral(cyc)) > 1e-3
        assert float(acyclic_constr(cyc, d)) > 1e-6


def test_spectral_gradient_matches_finite_differences():
    from jax import random

    from dibs_tpu.ops.acyclic import acyclic_constr_spectral

    key = random.PRNGKey(3)
    d = 8
    g = random.uniform(key, (d, d), minval=0.05, maxval=1.0) * (
        1.0 - jnp.eye(d))
    grad = jax.grad(lambda m: acyclic_constr_spectral(m))(g)
    # directional finite difference along a random direction
    v = random.normal(random.PRNGKey(4), (d, d))
    eps = 1e-3
    fd = (acyclic_constr_spectral(g + eps * v)
          - acyclic_constr_spectral(g - eps * v)) / (2 * eps)
    got = jnp.sum(grad * v)
    assert jnp.allclose(got, fd, rtol=2e-2, atol=1e-4), (float(got), float(fd))


def test_engine_runs_with_spectral_acyclicity():
    from jax import random

    from dibs_tpu.inference import JointDiBS
    from dibs_tpu.target import make_linear_gaussian_model

    data, gm, lm = make_linear_gaussian_model(
        key=random.PRNGKey(0), n_vars=6, graph_prior_str="er",
        n_observations=20, n_ho_observations=5)
    dibs = JointDiBS(x=data.x, graph_model=gm, likelihood_model=lm,
                     acyclicity="spectral", n_grad_mc_samples=4,
                     n_acyclicity_mc_samples=2)
    gs, thetas = dibs.sample(key=random.PRNGKey(1), n_particles=3, steps=8)
    assert jnp.isfinite(thetas).all()


def test_large_d_cyclic_soft_graph_stays_finite():
    """f32 overflow regression (round 3d): a dense ~0.5 soft graph at
    d=300 has true h(G) ~ 1.5^300 (far past f32 max) — the unscaled power
    chain returned inf and the SVGD prior produced beta*inf (inf, or NaN
    at t=0 where beta=0), NaN-ing every d >= ~256 run on its first step.
    The scale-tracked chain must return a huge-but-finite h and a
    finite, direction-preserving gradient, so 0 * grad == 0."""
    import jax

    from dibs_tpu.ops.acyclic import acyclic_constr

    d = 300
    key = random.PRNGKey(0)
    g = random.uniform(key, (d, d)) * (1.0 - jnp.eye(d))
    h = acyclic_constr(g, d)
    assert jnp.isfinite(h), h
    assert h > 1e15  # genuinely astronomically cyclic
    grad = jax.grad(lambda m: acyclic_constr(m, d))(g)
    assert jnp.isfinite(grad).all()
    assert float(jnp.abs(grad).max()) > 0.0
    assert jnp.all(0.0 * grad == 0.0)  # the t=0 prior-score product


def test_large_d_dag_h_zero_exact():
    """DAG path mass is bounded by (1 + 1/d)^d < e thanks to the 1/d
    normalization, so the scale-tracked chain never rescales on DAGs and
    ``h == 0`` stays exact at any d — the metrics' DAG filter depends on
    this. A complete (upper-triangular) DAG is the worst case for path
    counts."""
    from dibs_tpu.ops.acyclic import acyclic_constr

    d = 300
    g = jnp.triu(jnp.ones((d, d)), k=1)  # complete DAG, 2^299-ish paths
    h = acyclic_constr(g, d)
    assert float(h) == 0.0, float(h)
