import os

import pytest

import jax
import numpy as np

from nerf_prv_tpu.nerf import HashGridConfig, NerfConfig, init_params
from nerf_prv_tpu.nerf.extract import extract_density_grid, render_video, save_geometry
from nerf_prv_tpu.scene.ply import load_ply

TINY = NerfConfig(
    grid=HashGridConfig(levels=2, features=2, log2_table=10, n_min=8, n_max=16),
    voxel_grid_size=16,
    voxel_features=4,
    hidden=32,
    n_samples=16,
)


def test_extract_density_grid_shape():
    params = init_params(jax.random.PRNGKey(0), TINY)
    grid = extract_density_grid(params, TINY, resolution=16)
    assert grid.shape == (16, 16, 16)
    assert np.isfinite(grid).all() and (grid >= 0).all()


def test_save_geometry_writes_ply(tmp_path):
    params = init_params(jax.random.PRNGKey(0), TINY)
    out = str(tmp_path / "geom.ply")
    # threshold 0 -> everything occupied -> surface shell exported
    n = save_geometry(params, TINY, out, resolution=16, density_threshold=0.0)
    assert os.path.exists(out)
    pts, cols = load_ply(out)
    assert len(pts) == n
    assert n > 0
    assert (pts >= 0).all() and (pts <= 1).all()


@pytest.mark.slow  # ~36 s: three full-frame renders; the render path itself
# stays fast-covered (deferred/speculative tests), this only adds the
# video/frame-writer IO on top
def test_render_video_frames(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from synthetic import write_scene

    train_json, _, _, _ = write_scene(str(tmp_path), n_train=3, n_test=2)
    params = init_params(jax.random.PRNGKey(0), TINY)
    out = str(tmp_path / "video.mp4")
    n = render_video(params, train_json, out, TINY)
    assert n == 3
    frames = os.path.splitext(out)[0] + "_frames"
    assert os.path.exists(os.path.join(frames, "frame_0000.png"))
