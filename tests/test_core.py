import json
import math
import os

import numpy as np
import pytest

from nerf_prv_tpu.core import camera, pose, transforms
from nerf_prv_tpu.core.config import CameraConfig, Config

from conftest import REFERENCE_ROOT, requires_reference


def test_config_defaults_match_reference_yaml():
    cfg = Config()
    assert cfg.camera.width == 1280 and cfg.camera.height == 720
    assert cfg.n_steps == 2500
    assert cfg.num_of_views == 540
    assert math.isclose(cfg.view_space_radius, 0.3)
    assert cfg.min_label_value == 13 and cfg.max_label_value == 58


@requires_reference
def test_config_parses_reference_yaml():
    path = os.path.join(REFERENCE_ROOT, "PRV_simulation", "DefaultConfiguration.yaml")
    cfg = Config.from_yaml(path)
    assert cfg.camera.fx == pytest.approx(915.6066894531250)
    assert cfg.camera.k1 == pytest.approx(0.12042199820280075)
    assert cfg.ensemble_num == 5
    assert cfg.num_of_thread == 20
    assert cfg.camera.model == 2
    assert cfg.octomap_resolution == pytest.approx(0.00625)


def test_project_deproject_roundtrip_no_distortion():
    intr = CameraConfig(model=0)
    rng = np.random.default_rng(1)
    pts = rng.uniform([-0.1, -0.1, 0.3], [0.1, 0.1, 1.0], size=(64, 3))
    px = np.asarray(camera.project_points(pts, intr))
    back = np.asarray(camera.deproject_pixels(px, pts[:, 2], intr))
    np.testing.assert_allclose(back, pts, rtol=1e-5, atol=1e-6)


def test_project_center_is_principal_point():
    intr = CameraConfig()  # inverse Brown-Conrady: distortion vanishes on-axis
    px = np.asarray(camera.project_points(np.array([0.0, 0.0, 1.0]), intr))
    np.testing.assert_allclose(px, [intr.ppx, intr.ppy], atol=1e-4)


def test_deproject_inverse_brown_conrady_applies_distortion():
    intr = CameraConfig(model=2)
    px = np.array([100.0, 50.0])
    pt = np.asarray(camera.deproject_pixels(px, 1.0, intr))
    pt0 = np.asarray(camera.deproject_pixels(px, 1.0, CameraConfig(model=0)))
    assert not np.allclose(pt, pt0)  # distortion must have an effect off-axis
    assert pt[2] == pytest.approx(1.0)


def test_kb4_undistort_inverts_distort():
    intr = CameraConfig(model=5, k1=0.1, k2=-0.05, k3=0.01, p1=0.002, p2=0.0)
    pts = np.array([[0.05, -0.08, 1.0], [0.2, 0.1, 1.0]])
    px = np.asarray(camera.project_points(pts, intr))
    back = np.asarray(camera.deproject_pixels(px, 1.0, intr))
    np.testing.assert_allclose(back, pts, rtol=1e-4, atol=1e-5)


def test_look_at_pose_camera_z_points_at_object():
    center = np.zeros(3)
    views = np.array([[0.3, 0.0, 0.001], [0.0, 0.0, 0.3], [0.1, 0.2, 0.15]])
    c2w = pose.camera_to_world(views, center)
    for i in range(len(views)):
        rot = c2w[i, :3, :3]
        t = c2w[i, :3, 3]
        np.testing.assert_allclose(t, views[i], atol=1e-9)
        z_axis = rot[:, 2]
        to_obj = (center - views[i]) / np.linalg.norm(center - views[i])
        np.testing.assert_allclose(z_axis, to_obj, atol=1e-9)
        # orthonormal rotation
        np.testing.assert_allclose(rot @ rot.T, np.eye(3), atol=1e-9)
        assert np.linalg.det(rot) == pytest.approx(1.0)


def test_look_at_pose_mode1_matches_bruteforce_argmax():
    # mode 1 maximizes the z-component of (R @ Rz @ T) @ [0,1,0,1] over 5-deg
    # rolls; check the vectorized sweep picks the brute-force winner.
    center = np.array([1e-4, -2e-4, 5e-5])
    views = np.array([[0.3, 0.05, 0.1], [-0.2, 0.1, 0.2]])
    poses = pose.look_at_poses(views, center, mode=1)
    rot, trans = pose._base_frames(views, np.broadcast_to(center, views.shape), np.eye(4))
    y_h = np.array([0.0, 1.0, 0.0, 1.0])
    for i in range(len(views)):
        best_val, best_pose = -np.inf, None
        for ang in np.arange(0.0, 360.0, 5.0):
            rz = pose._rz(np.deg2rad(ang))
            val = (rot[i] @ rz @ trans[i] @ y_h)[2]
            if val > best_val:
                best_val, best_pose = val, np.linalg.inv(rot[i] @ rz) @ trans[i]
        np.testing.assert_allclose(poses[i], best_pose, atol=1e-9)


def test_pose_remap_roundtrip():
    rng = np.random.default_rng(2)
    m = np.eye(4)
    m[:3, 3] = rng.normal(size=3)
    q, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    m[:3, :3] = q
    j = transforms.remap_pose(m)
    back = transforms.unmap_pose(j)
    np.testing.assert_allclose(back, m, atol=1e-12)


def test_transforms_write_load_roundtrip(tmp_path):
    cam = CameraConfig()
    root = transforms.make_root(cam, 1, predicted_size=0.1, object_center=[0.01, 0.02, 0.03])
    assert root["scale"] == pytest.approx(5.0)
    assert root["offset"] == pytest.approx([0.53, 0.51, 0.52])
    c2w = pose.camera_to_world(np.array([[0.0, 0.0, 0.3]]), np.zeros(3))[0]
    transforms.add_frame(root, "img/rgbaClip_0.png", c2w)
    p = tmp_path / "transforms.json"
    transforms.write_transforms(str(p), root)
    tf = transforms.load_transforms(str(p))
    assert tf.camera.fx == pytest.approx(cam.fx)
    assert tf.file_paths == ["img/rgbaClip_0.png"]
    np.testing.assert_allclose(tf.cam_to_world[0], c2w, atol=1e-9)
    # grid mapping puts the object center near the cube center
    g = transforms.world_to_grid(np.array([0.01, 0.02, 0.03]), tf.scale, tf.offset)
    np.testing.assert_allclose(g, [0.68, 0.56, 0.62], atol=1e-9)


def test_scaled_camera_sixteenth():
    cam = CameraConfig()
    low = transforms.scaled_camera(cam, 16.0)
    assert low.width == 80 and low.height == 45
    assert low.fx == pytest.approx(cam.fx / 16)
    assert low.k1 == 0.0 and low.model == 0
