"""The closed-form (Gram-matmul) SVGD transport must equal the generic
autodiff path — this validates the framework's central TPU optimization."""
import jax.numpy as jnp
import pytest
from jax import random

from dibs_tpu.inference.transport import (
    _joint_transport_autodiff,
    _marginal_transport_autodiff,
    joint_transport,
    marginal_transport,
)
from dibs_tpu.kernel import AdditiveFrobeniusSEKernel, JointAdditiveFrobeniusSEKernel

pytestmark = pytest.mark.heavy  # compile-heavy; excluded from `make test-fast`


def test_marginal_transport_fast_equals_autodiff():
    key = random.PRNGKey(0)
    k1, k2 = random.split(key)
    z = random.normal(k1, (6, 4, 3, 2))
    dz = random.normal(k2, (6, 4, 3, 2))
    kernel = AdditiveFrobeniusSEKernel(h=5.0)

    fast = marginal_transport(kernel, z, dz)
    slow = _marginal_transport_autodiff(kernel, z, dz)
    assert jnp.allclose(fast, slow, atol=1e-5), jnp.abs(fast - slow).max()


def test_joint_transport_fast_equals_autodiff_array_theta():
    key = random.PRNGKey(1)
    k1, k2, k3, k4 = random.split(key, 4)
    z = random.normal(k1, (5, 4, 3, 2))
    dz = random.normal(k2, (5, 4, 3, 2))
    theta = random.normal(k3, (5, 4, 4))
    dtheta = random.normal(k4, (5, 4, 4))
    kernel = JointAdditiveFrobeniusSEKernel(h_latent=5.0, h_theta=50.0)

    fast_z, fast_t = joint_transport(kernel, z, theta, dz, dtheta)
    slow_z, slow_t = _joint_transport_autodiff(kernel, z, theta, dz, dtheta)
    assert jnp.allclose(fast_z, slow_z, atol=1e-5)
    assert jnp.allclose(fast_t, slow_t, atol=1e-5)


def test_joint_transport_fast_equals_autodiff_pytree_theta():
    key = random.PRNGKey(2)
    keys = random.split(key, 6)
    z = random.normal(keys[0], (4, 3, 2, 2))
    dz = random.normal(keys[1], (4, 3, 2, 2))
    theta = [
        (random.normal(keys[2], (4, 3, 3, 2)), random.normal(keys[3], (4, 3, 2))),
        (random.normal(keys[4], (4, 3, 2, 1)),),
    ]
    dtheta = [
        (random.normal(keys[3], (4, 3, 3, 2)), random.normal(keys[2], (4, 3, 2))),
        (random.normal(keys[5], (4, 3, 2, 1)),),
    ]
    kernel = JointAdditiveFrobeniusSEKernel(h_latent=5.0, h_theta=500.0)

    fast_z, fast_t = joint_transport(kernel, z, theta, dz, dtheta)
    slow_z, slow_t = _joint_transport_autodiff(kernel, z, theta, dz, dtheta)
    assert jnp.allclose(fast_z, slow_z, atol=1e-5)
    for f_layer, s_layer in zip(fast_t, slow_t):
        for f_leaf, s_leaf in zip(f_layer, s_layer):
            assert jnp.allclose(f_leaf, s_leaf, atol=1e-5)


def test_kernel_matrix_matches_pairwise_eval():
    key = random.PRNGKey(3)
    z = random.normal(key, (5, 3, 2, 2))
    kernel = AdditiveFrobeniusSEKernel(h=7.0, scale=2.0)
    mat = kernel.matrix(z, z)
    for i in range(5):
        for j in range(5):
            assert jnp.allclose(
                mat[i, j], kernel.eval(x=z[i], y=z[j]), atol=1e-5
            )


def test_median_heuristic_bandwidth():
    """h='median' (extension): transport matches a fixed-h run at the
    realized median bandwidth."""
    import jax.numpy as jnp2

    from dibs_tpu.kernel import _median_bandwidth
    from dibs_tpu.utils.func import pytree_sq_norm_matrix

    key = random.PRNGKey(5)
    k1, k2 = random.split(key)
    z = random.normal(k1, (6, 4, 3, 2))
    dz = random.normal(k2, (6, 4, 3, 2))

    sq = pytree_sq_norm_matrix(z, z)
    h_eff = float(_median_bandwidth(sq))

    phi_median = marginal_transport(AdditiveFrobeniusSEKernel(h="median"), z, dz)
    phi_fixed = marginal_transport(AdditiveFrobeniusSEKernel(h=h_eff), z, dz)
    assert jnp2.allclose(phi_median, phi_fixed, atol=1e-5)

    # joint kernel accepts median for either component
    kj = JointAdditiveFrobeniusSEKernel(h_latent="median", h_theta=500.0)
    theta = random.normal(k1, (6, 4, 4))
    dtheta = random.normal(k2, (6, 4, 4))
    pz, pt = joint_transport(kj, z, theta, dz, dtheta)
    assert jnp2.isfinite(pz).all() and jnp2.isfinite(pt).all()

    import pytest as _pytest

    with _pytest.raises(TypeError):
        AdditiveFrobeniusSEKernel(h="median").eval(x=z[0], y=z[1])


def test_custom_kernel_falls_back_to_autodiff():
    """A user kernel with only `.eval` must still work (reference contract)."""

    class MyKernel:
        def eval(self, *, x, y):
            return jnp.exp(-jnp.sum(jnp.abs(x - y)) / 10.0)

    key = random.PRNGKey(4)
    z = random.normal(key, (4, 3, 2, 2))
    dz = random.normal(key, (4, 3, 2, 2))
    phi = marginal_transport(MyKernel(), z, dz)
    assert phi.shape == z.shape
    assert jnp.isfinite(phi).all()


def test_transport_precision_knob():
    """The transport precision knob is read at trace time and restores
    cleanly. On CPU every precision computes identically, so this checks
    plumbing (the throughput effect is TPU-only); the knob must also leave
    the likelihood precision untouched."""
    import jax

    import dibs_tpu.config as config
    from dibs_tpu.inference.transport import marginal_transport
    from dibs_tpu.kernel import AdditiveFrobeniusSEKernel

    key = random.PRNGKey(11)
    k1, k2 = random.split(key)
    z = random.normal(k1, (6, 4, 3, 2))
    dz = random.normal(k2, (6, 4, 3, 2))
    kern = AdditiveFrobeniusSEKernel(h=5.0)

    ref = marginal_transport(kern, z, dz)
    try:
        for p in ("default", "high", "highest"):
            config.set_transport_matmul_precision(p)
            phi = jax.jit(lambda a, b: marginal_transport(kern, a, b))(z, dz)
            assert jnp.allclose(phi, ref, atol=1e-5)
    finally:
        config.set_transport_matmul_precision("high")
    # default is 'high' (bf16x3) per the TRANSPORT_PREC_AB measurement;
    # the likelihood knob stays independent at HIGHEST
    assert config.likelihood_matmul_precision() == jax.lax.Precision.HIGHEST
    assert config.transport_matmul_precision() == jax.lax.Precision.HIGH
