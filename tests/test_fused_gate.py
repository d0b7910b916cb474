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
    assert dp * bm <= 1024, "wide group width bounded for VMEM"
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
