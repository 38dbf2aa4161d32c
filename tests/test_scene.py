import os

import numpy as np
import pytest

from nerf_prv_tpu.core.config import CameraConfig, Config
from nerf_prv_tpu.core.pose import camera_to_world
from nerf_prv_tpu.scene import (
    VoxelScene,
    load_object,
    load_ply,
    make_gt_sample,
    object_pixel_rate,
    render_pointcloud,
    rgba_from_render,
    save_ply_ascii,
    save_ply_binary,
    toward_pose,
    voxel_downsample,
)


def _rand_cloud(n=500, seed=0, extent=0.05):
    rng = np.random.default_rng(seed)
    pts = rng.uniform(-extent, extent, size=(n, 3))
    cols = rng.integers(0, 255, size=(n, 3), dtype=np.uint8)
    return pts, cols


def test_ply_ascii_roundtrip(tmp_path):
    pts, cols = _rand_cloud()
    p = str(tmp_path / "a.ply")
    save_ply_ascii(p, pts, cols)
    pts2, cols2 = load_ply(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-5)
    np.testing.assert_array_equal(cols2, cols)


def test_ply_binary_roundtrip(tmp_path):
    pts, cols = _rand_cloud(seed=1)
    p = str(tmp_path / "b.ply")
    save_ply_binary(p, pts, cols)
    pts2, cols2 = load_ply(p)
    np.testing.assert_allclose(pts2, pts, atol=1e-6)
    np.testing.assert_array_equal(cols2, cols)


def test_voxel_downsample_first_wins():
    pts = np.array([[0.001, 0.001, 0.001], [0.0012, 0.0011, 0.0009], [0.05, 0.05, 0.05]])
    cols = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255]], dtype=np.uint8)
    centers, vcols, keys = voxel_downsample(pts, cols, 0.01)
    assert len(centers) == 2
    # first point of the duplicate voxel keeps its color
    assert [255, 0, 0] in vcols.tolist()
    assert [0, 255, 0] not in vcols.tolist()


def test_gt_sample_counts():
    pts, _ = _rand_cloud(2000, extent=0.04)
    g = make_gt_sample(pts, np.zeros(3), 0.05)
    assert g.init_voxels == 32**3
    assert 0 < g.occupied_voxels <= 32**3


def test_voxel_scene_ray_cast_hits_object():
    pts, cols = _rand_cloud(5000, extent=0.05)
    scene = VoxelScene(pts, cols, 0.004)
    origins = np.array([[0.0, 0.0, 0.3]] * 3)
    dirs = np.array([[0, 0, -1.0], [0, 0, 1.0], [0.05, 0.05, -0.3]])
    hit, pos, col = scene.cast_rays(origins, dirs, max_range=0.6)
    hit = np.asarray(hit)
    assert hit[0] and not hit[1]  # downward ray hits, upward misses
    # hit point is inside the cloud extent (sparse random cloud is porous)
    assert -0.055 <= np.asarray(pos)[0][2] <= 0.055


def test_render_pointcloud_coverage_and_alpha():
    pts, cols = _rand_cloud(3000, extent=0.05)
    cam = CameraConfig(
        width=160, height=90, fx=114.45, fy=114.17, ppx=80.9, ppy=46.6, model=0
    )
    c2w = camera_to_world(np.array([[0.0, 0.0, 0.3]]), np.zeros(3))[0]
    rgb, alpha = render_pointcloud(pts, cols, c2w, cam, point_size=3)
    rgb, alpha = np.asarray(rgb), np.asarray(alpha)
    assert rgb.shape == (90, 160, 3) and alpha.shape == (90, 160)
    rate = object_pixel_rate(alpha)
    assert 0.02 < rate < 0.9
    # object is centered: central pixel should be covered, corners empty
    assert alpha[45, 80] == 1.0
    assert alpha[0, 0] == 0.0 and alpha[-1, -1] == 0.0
    # background is white
    np.testing.assert_allclose(rgb[0, 0], [1, 1, 1])
    rgba = rgba_from_render(rgb, alpha)
    assert rgba.dtype == np.uint8 and rgba.shape == (90, 160, 4)


def test_render_zbuffer_front_point_wins():
    cam = CameraConfig(width=32, height=32, fx=32, fy=32, ppx=16, ppy=16, model=0)
    pts = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -0.1]])  # second is farther
    cols = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    c2w = camera_to_world(np.array([[0.0, 0.0, 0.5]]), np.array([0.0, 0.0, -0.05]))[0]
    rgb, alpha = render_pointcloud(pts, cols, c2w, cam, point_size=5)
    rgb = np.asarray(rgb)
    covered = np.asarray(alpha) > 0
    # every covered pixel near center shows the closer (red) point
    ys, xs = np.where(covered)
    center_mask = (np.abs(ys - 16) <= 1) & (np.abs(xs - 16) <= 1)
    assert center_mask.any()
    got = rgb[ys[center_mask], xs[center_mask]]
    np.testing.assert_allclose(got, np.tile([1.0, 0.0, 0.0], (len(got), 1)), atol=1e-6)


def test_toward_pose_orthonormal():
    for s in range(6):
        m = toward_pose(s)
        np.testing.assert_allclose(m[:3, :3] @ m[:3, :3].T, np.eye(3), atol=1e-12)


def test_load_object_shapenet_size_augmentation(tmp_path):
    pts, cols = _rand_cloud(4000, extent=1.0)
    model_dir = tmp_path / "models" / "ShapeNet"
    save_ply_binary(str(model_dir / "toy0.ply"), pts, cols)
    cam = CameraConfig(
        width=128, height=72, fx=91.5, fy=91.3, ppx=64.7, ppy=37.2, model=0
    )
    cfg = Config(
        workspace=str(tmp_path / "ws"),
        model_path=str(tmp_path / "models"),
        viewspace_path=str(tmp_path / "ws" / "viewspace"),
        name_of_pcd="toy0",
        num_of_views=5,
        camera=cam,
    )
    scene = load_object(cfg, "toy0")
    assert scene.ok
    assert 0.075 <= scene.size <= 0.115
    # scaled cloud: bounding radius*17/16 == accepted size
    assert scene.predicted_size == pytest.approx(scene.size, rel=1e-6)
    assert scene.octomap_resolution == pytest.approx(2 * scene.size / 32, rel=1e-6)
    # idempotent: size.txt reused
    scene2 = load_object(cfg, "toy0")
    assert scene2.size == pytest.approx(scene.size)
    assert scene.view_space is not None and len(scene.view_space) == 5
    assert scene.gt_scene.full_voxels > 100
