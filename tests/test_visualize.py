"""visualize(): reference-compatible grid plot + GIF frame return."""
import os
import tempfile

import numpy as onp
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")

from dibs_tpu.utils.visualize import visualize  # noqa: E402


def test_visualize_returns_frame_when_saving():
    mats = onp.random.rand(9, 5, 5)
    with tempfile.TemporaryDirectory() as tmp:
        img = visualize(mats, t=7, save_path=tmp)
        assert os.path.exists(os.path.join(tmp, "img7.png"))
        # reference contract (visualize.py:49-56): the rendered frame comes
        # back as an image array for GIF stitching
        assert img is not None and img.ndim == 3 and img.shape[-1] in (3, 4)


def test_visualize_returns_none_without_save_path():
    assert visualize(onp.random.rand(3, 4, 4), t=1) is None
