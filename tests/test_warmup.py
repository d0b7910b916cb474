"""AOT compile warming completes and is side-effect free."""
import pytest

pytestmark = pytest.mark.heavy  # compile-heavy; excluded from `make test-fast`


def test_warmup_compiles_small_shapes(capsys):
    from dibs_tpu.warmup import warmup

    warmup(6, n_obs=10, n_particles=3, n_grad_mc_samples=4,
           models=("joint_linear", "marginal_bge"))
    err = capsys.readouterr().err
    assert "ready in" in err
