import os
import time

import numpy as np
import pytest

from nerf_prv_tpu.labeling.labels import HB_SKIP, hb_view_counts
from nerf_prv_tpu.core.config import Config
from nerf_prv_tpu.utils import Stopwatch, TimingRegistry


def test_stopwatch_laps():
    sw = Stopwatch()
    time.sleep(0.01)
    d1 = sw.lap()
    assert d1 >= 0.009
    d2 = sw.lap()
    assert d2 < d1


def test_timing_registry_and_artifacts(tmp_path):
    reg = TimingRegistry()
    with reg.phase("train"):
        time.sleep(0.01)
    with reg.phase("train"):
        time.sleep(0.01)
    assert reg.total("train") >= 0.019
    s = reg.summary()
    assert s["train"]["count"] == 2
    reg.write_artifact(str(tmp_path), "train_time", "0", value=reg.total("train"))
    assert float(open(tmp_path / "train_time" / "0.txt").read()) >= 0.019
    reg.dump(str(tmp_path / "timings.json"))
    assert os.path.exists(tmp_path / "timings.json")


def test_hb_view_counts_skip_set():
    counts = hb_view_counts()
    assert 13 not in counts and 17 not in counts and 31 not in counts
    assert 41 not in counts and 47 not in counts
    assert counts[0] == 3 and counts[-1] == 49
    assert all(c % 2 == 1 for c in counts)


def test_hb_config_coverage_override():
    cfg = Config(is_shape_net=False)
    assert cfg.effective_coverage_max == 90
    assert cfg.effective_coverage_add == 1
    cfg2 = Config(is_shape_net=True)
    assert cfg2.effective_coverage_max == 50
    assert cfg2.effective_coverage_add == 2


def test_debug_visualization_exports(tmp_path):
    """Offline stand-ins for the reference's `show` PCL viewers
    (View_Space.hpp:575-689, main.cpp:3754-3823): view-space PLY,
    trajectory PLY polyline, and a 2-pane orthographic PNG."""
    import numpy as np
    from PIL import Image

    from nerf_prv_tpu.scene.ply import load_ply
    from nerf_prv_tpu.utils import (
        export_trajectory_ply,
        export_view_space_ply,
        plot_view_space_png,
        trajectory_polyline,
    )
    from nerf_prv_tpu.viewspace import generate_hemisphere

    views = generate_hemisphere(8, seed=0, restarts=2, steps=150) * 0.3
    order = list(range(8))

    vs_ply = str(tmp_path / "views.ply")
    obj = np.random.default_rng(0).normal(scale=0.02, size=(50, 3))
    export_view_space_ply(vs_ply, views, object_points=obj, start_id=0)
    pts, cols = load_ply(vs_ply)
    assert pts.shape == (58, 3)
    assert cols is not None
    np.testing.assert_array_equal(cols[0], [255, 80, 30])  # start highlighted

    poly = trajectory_polyline(views, order, np.zeros(3), 0.15, points_per_leg=10)
    assert len(poly) >= 7 * 2  # every leg contributes at least its endpoints
    # polyline stays outside (or on) the obstacle sphere up to arc sag
    d = np.linalg.norm(poly, axis=1)
    assert d.min() > 0.15 * 0.95

    tr_ply = str(tmp_path / "traj.ply")
    poly2 = export_trajectory_ply(tr_ply, views, order, np.zeros(3), 0.15)
    pts2, cols2 = load_ply(tr_ply)
    assert len(pts2) == len(poly2) + len(views)

    png = str(tmp_path / "views.png")
    plot_view_space_png(png, views, order=order, trajectory_points=poly)
    img = np.asarray(Image.open(png))
    assert img.shape == (480, 960, 3)
    # something was actually drawn on the white canvas
    assert (img < 250).any()
