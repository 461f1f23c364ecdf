"""scripts/make_view_gif.py: per-epoch view PNGs → output.gif (reference
results-corpus artifact parity — /root/reference/results/renderer/*/output.gif)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))


def test_make_gif_orders_epochs_numerically(tmp_path):
    Image = pytest.importorskip("PIL.Image")
    from make_view_gif import make_gif

    views = tmp_path / "rendered_views"
    views.mkdir()
    for e in (1, 2, 10):  # 10 sorts after 2 numerically, before it lexically
        arr = (np.random.default_rng(e).random((16, 32, 3)) * 255).astype("uint8")
        Image.fromarray(arr).save(str(views / f"test_views_epoch_{e}.png"))

    path = make_gif(str(tmp_path))
    assert os.path.basename(path) == "output.gif"
    im = Image.open(path)
    assert im.n_frames == 3


def test_make_gif_empty_dir_raises(tmp_path):
    pytest.importorskip("PIL.Image")
    from make_view_gif import make_gif

    (tmp_path / "rendered_views").mkdir()
    with pytest.raises(FileNotFoundError):
        make_gif(str(tmp_path))
