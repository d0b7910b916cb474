"""Static padding plan + availability gate of the fused linear path."""
import pytest

from dibs_tpu.inference.fused_linear import (
    _LANE,
    _SUB,
    _pad_plan,
    fused_linear_available,
)


@pytest.mark.parametrize("d", [2, 5, 8, 20, 24, 30, 32, 64, 100, 128, 200, 384])
@pytest.mark.parametrize("m", [1, 7, 32, 128, 200])
def test_pad_plan_invariants(d, m):
    dp, bm, m_total = _pad_plan(d, m)
    assert dp >= d and dp % _SUB == 0
    assert (dp * bm) % _LANE == 0, "wide group width must be a lane multiple"
    assert dp * bm <= 2048, "wide group width bounded for VMEM"
    assert _LANE % bm == 0, "bm must divide the lane count"
    assert m_total % bm == 0 and m_total >= m
    assert m_total <= ((m + _LANE - 1) // _LANE) * _LANE, (
        "padded sample count must stay within the output lane padding"
    )


def test_gate_is_cpu_false_tpu_shape_free():
    # on the CPU test backend the gate must decline regardless of d
    import jax

    if jax.default_backend() != "tpu":
        assert not fused_linear_available(128)


def test_pallas_kill_switch():
    """set_pallas_enabled(False) / DIBS_DISABLE_PALLAS force every gate off;
    None restores auto-detect; env wins over the programmatic setting."""
    import os

    import dibs_tpu.config as config
    from dibs_tpu.inference.fused_nonlinear import fused_nonlinear_available
    from dibs_tpu.models import DenseNonlinearGaussian
    from dibs_tpu.ops.pallas_kernels import pallas_enabled

    model = DenseNonlinearGaussian(n_vars=8, hidden_layers=(5,))
    try:
        config.set_pallas_enabled(False)
        assert not pallas_enabled()
        assert not fused_linear_available(20)
        assert not fused_nonlinear_available(model, n_obs=100)

        config.set_pallas_enabled(True)  # forced on (CPU): gates honor it
        assert pallas_enabled()

        config.set_pallas_enabled(None)  # auto: CPU backend -> off
        import jax

        if jax.default_backend() != "tpu":
            assert not pallas_enabled()

        os.environ["DIBS_DISABLE_PALLAS"] = "1"
        config.set_pallas_enabled(True)
        assert not pallas_enabled(), "env kill switch must win"
    finally:
        os.environ.pop("DIBS_DISABLE_PALLAS", None)
        config.set_pallas_enabled(None)


def test_extreme_scale_advisory():
    """The fused *nonlinear* path warns once |log-likelihood| magnitudes
    reach the measured degradation regime (DESIGN.md 11f) and stays silent
    on standard-scale data. The *linear* path must stay silent at any
    scale: its centered (delta) scoring scheme is scale-invariant
    (fused_linear.py module comment; benchmarks/CENTERED_AB.json)."""
    import warnings

    import jax.numpy as jnp
    import numpy as onp
    import pytest as _pytest
    from jax import random

    import dibs_tpu.config as config
    from dibs_tpu.inference.estimators import EstimatorConfig, make_estimators
    from dibs_tpu.models import DenseNonlinearGaussian, LinearGaussian

    d = 6
    lm = LinearGaussian(n_vars=d)
    nl = DenseNonlinearGaussian(n_vars=d, hidden_layers=(5,))
    x_small = random.normal(random.PRNGKey(0), (50, d))
    x_big = x_small * 100.0
    cfg = EstimatorConfig(alpha_linear=0.2, n_grad_mc_samples=4,
                          grad_estimator_z="reparam")

    def build(x, **models):
        log_joint = models.get(
            "fused_nonlinear_model", lm).interventional_log_joint_prob
        return make_estimators(
            cfg=cfg,
            log_graph_prior=lambda soft_g: jnp.array(0.0),
            log_joint_prob=log_joint,
            x=x,
            interv_mask=jnp.zeros_like(x, dtype=jnp.int32),
            **models,
        )

    est_mag = 50 * float(onp.square(onp.asarray(x_big)).mean(0).sum()) / (
        2 * lm.obs_noise
    )
    assert est_mag > 1e6, "test data must sit in the advisory regime"

    try:
        # force the gate open on CPU so the advisory branch is reached
        # (the kernel itself is never executed at trace time here)
        config.set_pallas_enabled(True)
        with _pytest.warns(UserWarning, match="log-likelihood"):
            build(x_big, fused_nonlinear_model=nl)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            build(x_small, fused_nonlinear_model=nl)  # silent at std scale
            build(x_big, fused_linear_model=lm)  # linear: silent at ANY scale
    finally:
        config.set_pallas_enabled(None)


def test_single_pass_plan_vmem_reduction():
    """The single-pass kernel keeps the scoring-chain intermediates live
    (dead code in the legacy pass 2), so its scoped-VMEM working set is
    larger; _pad_plan halves the group width until the calibrated estimate
    fits Mosaic's 16 MB scoped limit (measured on v5e at cfg4's d=30 /
    N=600: wd=2048 OOMs at 17.85 MB, wd=1024 fits)."""
    from dibs_tpu.inference.fused_linear import _single_vmem_fits

    # cfg4 shape: the measured OOM — bm must halve from 64 (wd=2048)
    dp, bm_full, _ = _pad_plan(30, 128, single=False)
    assert (dp, bm_full) == (32, 64)
    assert not _single_vmem_fits(600, dp, bm_full)  # the measured cliff
    dp, bm, m_total = _pad_plan(30, 128, n_obs=600, single=True)
    assert bm < bm_full and _single_vmem_fits(600, dp, bm)
    assert m_total % bm == 0 and m_total >= 128

    # cfg2 shape: plenty of headroom — the plan is unchanged
    assert _pad_plan(20, 128, n_obs=100, single=True) == \
        _pad_plan(20, 128, single=False)
    # two-pass callers keep the full-width plan at any N
    assert _pad_plan(30, 128, n_obs=600, single=False)[1] == bm_full


def test_linear_gate_n_obs_vmem_budget():
    """Large-N datasets exceed the linear kernel's VMEM (measured opaque
    Mosaic compile failures on v5e at the 1024-lane wide plan: OK at
    d=128/N=1024 and d=30/N=1500, fail at d=128/N=1536 and d=30/N=2048);
    the gate must track those cliffs so the engine falls back to the
    exact XLA estimators instead of crashing the compile."""
    import dibs_tpu.config as config

    try:
        config.set_pallas_enabled(True)  # force the backend check open
        assert fused_linear_available(128, n_obs=1024)   # measured OK
        assert fused_linear_available(30, n_obs=600)     # config 4 (probed
        #                                     OK at the wd=2048 wide plan)
        assert not fused_linear_available(128, n_obs=1536)  # measured fail
        assert not fused_linear_available(30, n_obs=2048)   # measured fail
        # the budget scales with the plan's group width: at wd=2048 the
        # d=30 ceiling sits near N ~ 750 (conservative — the wd=1024
        # cliff was measured between 1500 and 2048)
        assert not fused_linear_available(30, n_obs=1024)
        # n_obs omitted keeps the shape-only behavior (back-compat)
        assert fused_linear_available(128)
    finally:
        config.set_pallas_enabled(None)
