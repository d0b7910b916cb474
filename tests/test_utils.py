import jax.numpy as jnp
import numpy as onp
import pytest
from jax import random

from dibs_tpu.utils.func import (
    expand_by,
    masked_logdet_pd,
    masked_slogdet,
    pytree_sq_norm_matrix,
    squared_norm_pytree,
    zero_diagonal,
)


def test_expand_by():
    a = jnp.ones((3, 4))
    assert expand_by(a, 0).shape == (3, 4)
    assert expand_by(a, 2).shape == (3, 4, 1, 1)


def test_zero_diagonal_batched():
    key = random.PRNGKey(0)
    g = random.normal(key, (5, 4, 4))
    out = zero_diagonal(g)
    assert jnp.all(out[:, jnp.arange(4), jnp.arange(4)] == 0)
    mask = 1 - jnp.eye(4)
    assert jnp.allclose(out, g * mask)


def test_squared_norm_pytree():
    x = {"a": jnp.arange(3.0), "b": (jnp.ones((2, 2)),)}
    y = {"a": jnp.zeros(3), "b": (jnp.zeros((2, 2)),)}
    expected = sum(onp.arange(3.0) ** 2) + 4.0
    assert jnp.allclose(squared_norm_pytree(x, y), expected)


def test_pytree_sq_norm_matrix_matches_direct():
    key = random.PRNGKey(1)
    k1, k2 = random.split(key)
    xs = {"w": random.normal(k1, (4, 3, 2)), "b": random.normal(k2, (4, 5))}
    ys = {"w": random.normal(k2, (6, 3, 2)), "b": random.normal(k1, (6, 5))}
    mat = pytree_sq_norm_matrix(xs, ys)
    assert mat.shape == (4, 6)
    for i in range(4):
        for j in range(6):
            direct = squared_norm_pytree(
                {"w": xs["w"][i], "b": xs["b"][i]},
                {"w": ys["w"][j], "b": ys["b"][j]},
            )
            assert jnp.allclose(mat[i, j], direct, atol=1e-4)


def test_pytree_sq_norm_matrix_self_diagonal_exact():
    """When both sides are the SAME pytree (the SVGD K(particles,
    particles) case), the self-distances must be exactly 0 — Gram-form
    cancellation noise on the diagonal is exponentially amplified by the
    downstream exp(-sq / h). The reference's pairwise ||x - x||^2 is
    exactly 0; the Gram form must match. Distances must also be clamped
    nonnegative everywhere."""
    xs = {"w": random.normal(random.PRNGKey(3), (6, 64)) * 50.0}
    mat = pytree_sq_norm_matrix(xs, xs)
    assert jnp.all(jnp.diag(mat) == 0.0)
    assert jnp.all(mat >= 0.0)
    # distinct-object sides keep the raw (clamped) Gram values
    ys = {"w": xs["w"] + 0.0}
    mat2 = pytree_sq_norm_matrix(xs, ys)
    assert jnp.all(mat2 >= 0.0)


def test_se_matrix_auto_dispatch_crossover():
    """Auto dispatch must follow the measured crossover
    (benchmarks/SE_CROSSOVER{,2}.json): fused Pallas at small shapes
    (<=128 rows, <=8192 features), XLA Gram at large shapes. Structural
    check on the trace with Pallas force-enabled (CPU can trace
    pallas_call even though it cannot run it)."""
    import jax

    from dibs_tpu import config
    from dibs_tpu.kernel import _se_matrix
    from dibs_tpu.ops.pallas_kernels import pallas_enabled

    def collect(jaxpr, acc):
        for eqn in jaxpr.eqns:
            acc.add(eqn.primitive.name)
            for v in eqn.params.values():
                if hasattr(v, "jaxpr"):  # closed sub-jaxprs (jit, scan, ...)
                    collect(v.jaxpr, acc)
                elif hasattr(v, "eqns"):
                    collect(v, acc)
        return acc

    def prims_for(shape):
        xs = jnp.zeros(shape)
        jaxpr = jax.make_jaxpr(
            lambda a: _se_matrix(a, a, 5.0, 1.0, None, None)
        )(xs)
        return collect(jaxpr.jaxpr, set())

    prev = config.pallas_override()
    config.set_pallas_enabled(True)
    try:
        assert pallas_enabled()
        small = prims_for((30, 800))       # cfg1/2 z: Pallas side
        assert "pallas_call" in small, small
        big_rows = prims_for((256, 800))   # P >= 256: Gram side
        assert "pallas_call" not in big_rows and "dot_general" in big_rows
        big_feat = prims_for((100, 32768))  # cfg6 z: Gram side
        assert "pallas_call" not in big_feat and "dot_general" in big_feat
    finally:
        config.set_pallas_enabled(prev)


def test_pytree_sq_norm_matrix_pinned_precision():
    """The Gram cross-term must not inherit the backend's default matmul
    precision: on TPU the default is a single bf16 pass, whose O(100)
    absolute error at production feature counts (d=128 joint: n=32768,
    ||x||^2 ~ 3e4) is exponentially amplified by the downstream
    exp(-sq / h) — the diagonal (exact 0) came out at +-hundreds on the
    XLA-gram fallback (round-4 transport bench). CPU executes f32
    regardless of the precision hint, so this is a structural check on
    the trace: the dot must carry an explicit HIGHEST precision rather
    than None (= backend default)."""
    import jax

    xs = random.normal(random.PRNGKey(7), (4, 64))
    # conftest pins jax_default_matmul_precision='highest', which would be
    # baked into every traced dot and make this check vacuous — clear it
    # so a precision=None dot (the pre-fix bug) is visible in the trace.
    prev = jax.config.jax_default_matmul_precision
    jax.config.update("jax_default_matmul_precision", None)
    try:
        jaxpr = jax.make_jaxpr(lambda a: pytree_sq_norm_matrix(a, a))(xs)
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
    dots = [eqn for eqn in jaxpr.jaxpr.eqns
            if eqn.primitive.name == "dot_general"]
    assert dots, "expected the Gram form to lower to a dot_general"
    for eqn in dots:
        prec = eqn.params["precision"]
        flat = prec if isinstance(prec, tuple) else (prec,)
        assert all(p == jax.lax.Precision.HIGHEST for p in flat), prec


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_masked_slogdet_vs_dense_submatrix(seed):
    key = random.PRNGKey(seed)
    d = 6
    a = random.normal(key, (d, d))
    m = a @ a.T + d * jnp.eye(d)  # PD matrix
    mask = jnp.array([1, 0, 1, 1, 0, 1], dtype=jnp.float32)
    idx = onp.flatnonzero(onp.asarray(mask))
    expected = onp.linalg.slogdet(onp.asarray(m)[onp.ix_(idx, idx)])[1]
    assert jnp.allclose(masked_slogdet(m, mask), expected, atol=1e-4)


def test_masked_slogdet_empty_mask():
    m = jnp.eye(3) * 5.0
    assert jnp.allclose(masked_slogdet(m, jnp.zeros(3)), 0.0)


@pytest.mark.parametrize("seed,d", [(0, 7), (1, 7), (2, 7), (0, 50), (0, 70), (1, 70)])
def test_masked_logdet_ge_and_pair_match_slogdet(seed, d):
    """The logdet engine (BGe hot path) vs the LU oracle across all three
    size tiers: permuted-pair GE (d=7), two-elimination (d=50), and
    Cholesky (d=70)."""
    import jax

    from dibs_tpu.ops.logdet import masked_logdet_pd as ge_logdet
    from dibs_tpu.ops.logdet import masked_logdet_pd_pair

    key = random.PRNGKey(100 + seed)
    k1, k2, k3 = random.split(key, 3)
    a = random.normal(k1, (d, d))
    m = a @ a.T + d * jnp.eye(d)
    j = int(random.randint(k2, (), 0, d))
    e_j = jnp.eye(d)[:, j]
    for parents in [
        random.bernoulli(k3, 0.4, (d,)).astype(jnp.float32) * (1 - e_j),
        random.uniform(k3, (d,)) * (1 - e_j),  # soft mask
    ]:
        assert jnp.allclose(
            ge_logdet(m, parents), masked_slogdet(m, parents), atol=1e-3
        )
        ld_pa, ld_paj = masked_logdet_pd_pair(m, parents, e_j)
        assert jnp.allclose(ld_pa, masked_slogdet(m, parents), atol=1e-3)
        assert jnp.allclose(ld_paj, masked_slogdet(m, parents + e_j), atol=1e-3)

        # gradient parity of the pair op (reparam-BGe path)
        def pair_sum(p):
            l1, l2 = masked_logdet_pd_pair(m, p, e_j)
            return 3.0 * l1 - 2.0 * l2

        def ref_sum(p):
            return 3.0 * masked_slogdet(m, p) - 2.0 * masked_slogdet(m, p + e_j)

        g1 = jax.grad(pair_sum)(parents)
        g2 = jax.grad(ref_sum)(parents)
        assert jnp.allclose(g1, g2, atol=1e-3), jnp.abs(g1 - g2).max()


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_masked_logdet_pd_matches_slogdet(seed):
    """Cholesky fast path == LU path on PD matrices, for hard & soft masks."""
    key = random.PRNGKey(seed)
    d = 7
    k1, k2 = random.split(key)
    a = random.normal(k1, (d, d))
    m = a @ a.T + d * jnp.eye(d)
    hard = random.bernoulli(k2, 0.5, (d,)).astype(jnp.float32)
    soft = random.uniform(k2, (d,))
    for mask in [hard, soft, jnp.zeros(d), jnp.ones(d)]:
        assert jnp.allclose(
            masked_logdet_pd(m, mask), masked_slogdet(m, mask), atol=1e-3
        )
    # gradient parity on the soft mask (BGe reparam path)
    import jax

    g1 = jax.grad(lambda s: masked_logdet_pd(m, s))(soft)
    g2 = jax.grad(lambda s: masked_slogdet(m, s))(soft)
    assert jnp.allclose(g1, g2, atol=1e-3)


def test_standardize():
    import jax.numpy as jnp
    from jax import random

    from dibs_tpu.utils import standardize

    x = random.normal(random.PRNGKey(0), (50, 4)) * jnp.array(
        [1.0, 10.0, 100.0, 1e-12]) + jnp.array([0.0, 5.0, -3.0, 2.0])
    x_std, (mu, sd) = standardize(x, return_stats=True)
    assert jnp.allclose(x_std.mean(0), 0.0, atol=1e-5)
    # non-degenerate columns reach unit std; the constant column is guarded
    # by eps instead of dividing by ~0
    assert jnp.allclose(x_std.std(0)[:3], 1.0, atol=1e-4)
    assert jnp.isfinite(x_std).all()
    assert jnp.allclose((x - mu) / sd, x_std)
    # stats round-trip onto held-out data
    assert standardize(x).shape == x.shape
