"""Unit proof of the golden regression gate's comparator (VERDICT r3
item 5): a simulated 10-15% quality regression must trip the golden
comparison even where the absolute collapse floors would pass. The
on-device injection proof (mis-set kernel bandwidth / MC starvation at
d=12/800 steps) lives in `scripts/quality_gate.py --inject`; this test
pins the comparator arithmetic itself so it cannot silently loosen."""
import importlib.util
import os
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "quality_gate",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 "scripts", "quality_gate.py"))
qg = importlib.util.module_from_spec(_SPEC)
sys.modules["quality_gate"] = qg
_SPEC.loader.exec_module(qg)


def rows_from(emp_au, emp_sh, mix_au, mix_sh, n=5):
    return [{"seed": i, "emp_auroc": emp_au, "emp_eshd": emp_sh,
             "mix_auroc": mix_au, "mix_eshd": mix_sh} for i in range(n)]


GOLDEN = {
    "joint_linear": {
        "medians": {"emp_auroc": 0.90, "emp_eshd": 12.0,
                    "mix_auroc": 0.75, "mix_eshd": 15.0},
        "iqr": {"emp_auroc": 0.03, "emp_eshd": 3.0,
                "mix_auroc": 0.10, "mix_eshd": 5.0},
    }
}


@pytest.fixture(autouse=True)
def clean_failures():
    qg.FAILURES.clear()
    yield
    qg.FAILURES.clear()


def test_golden_gate_passes_at_golden():
    rows = rows_from(0.90, 12.0, 0.75, 15.0)
    qg.golden_compare("joint_linear", rows, GOLDEN)
    assert not qg.FAILURES


def test_golden_gate_passes_within_tolerance():
    # small trajectory-level drift: -0.02 AUROC, +10% E-SHD
    rows = rows_from(0.88, 13.2, 0.71, 16.5)
    qg.golden_compare("joint_linear", rows, GOLDEN)
    assert not qg.FAILURES


def test_golden_gate_catches_auroc_regression():
    # a 10% AUROC drop (0.90 -> 0.81) sails through the 0.8 floor on the
    # empirical posterior but must trip the golden gate (tol 0.04)
    rows = rows_from(0.81, 12.0, 0.75, 15.0)
    qg.golden_compare("joint_linear", rows, GOLDEN)
    assert any("emp_auroc" in f[0] for f in qg.FAILURES)


def test_golden_gate_catches_eshd_regression():
    # +40% E-SHD (12 -> 16.8) with AUROC intact
    rows = rows_from(0.90, 16.8, 0.75, 15.0)
    qg.golden_compare("joint_linear", rows, GOLDEN)
    assert any("emp_eshd" in f[0] for f in qg.FAILURES)


def test_golden_gate_volatile_mixture_needs_bigger_drop():
    # the mixture statistic is winner-take-most volatile: its IQR-scaled
    # tolerance (max(0.08, 0.10/2) = 0.08) must absorb a 0.05 swing...
    rows = rows_from(0.90, 12.0, 0.70, 15.0)
    qg.golden_compare("joint_linear", rows, GOLDEN)
    assert not qg.FAILURES
    # ...but not a 0.15 collapse
    rows = rows_from(0.90, 12.0, 0.60, 15.0)
    qg.golden_compare("joint_linear", rows, GOLDEN)
    assert any("mix_auroc" in f[0] for f in qg.FAILURES)


def test_golden_gate_skips_without_golden_entry():
    qg.golden_compare("joint_linear", rows_from(0.5, 99, 0.5, 99), {})
    assert not qg.FAILURES  # layer 2 inactive until --record-golden


def test_floors_still_catch_collapse():
    # layer 1: posterior collapse (AUROC ~ 0.5) trips the absolute floors
    rows = rows_from(0.50, 40.0, 0.50, 40.0)
    qg.floors("joint_linear", rows, n_gt=14)
    assert qg.FAILURES
