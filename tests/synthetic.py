"""Shared synthetic-scene fixture: a colored object rendered into a
reference-format coverage dataset (rgbaClip PNGs + transforms.json)."""

import os

import numpy as np
from PIL import Image

from nerf_prv_tpu.core.config import CameraConfig
from nerf_prv_tpu.core.pose import camera_to_world
from nerf_prv_tpu.core.transforms import add_frame, make_root, write_transforms
from nerf_prv_tpu.scene import render_pointcloud, rgba_from_render
from nerf_prv_tpu.viewspace import generate_hemisphere

TEST_CAM = CameraConfig(
    width=96, height=96, fx=110.0, fy=110.0, ppx=48.0, ppy=48.0, model=0
)


def make_object(n=20000, seed=0, size=0.05):
    """A dense colored ball-ish blob with position-dependent colors."""
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3))
    pts = pts / np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= size * rng.uniform(0.7, 1.0, size=(n, 1))
    cols = np.clip(
        ((pts / size) * 0.5 + 0.5) * 255, 0, 255
    ).astype(np.uint8)
    return pts, cols


def write_scene(
    out_dir,
    n_train=12,
    n_test=6,
    camera=TEST_CAM,
    radius=0.3,
    point_size=3,
    seed=0,
    n_points=20000,
):
    """Render coverage + test sets; returns (train_json, test_json, pts, cols)."""
    pts, cols = make_object(n=n_points, seed=seed)
    center = pts.mean(axis=0)
    predicted_size = float(np.linalg.norm(pts - center, axis=1).max() * 17 / 16)

    views_train = generate_hemisphere(n_train, seed=1, restarts=2, steps=200)
    views_test = generate_hemisphere(n_test + 3, seed=2, restarts=2, steps=200)[3:]

    os.makedirs(out_dir, exist_ok=True)
    jsons = []
    for name, views in (("train", views_train), ("test", views_test)):
        root = make_root(camera, 1, predicted_size, center)
        sub = os.path.join(out_dir, name)
        os.makedirs(sub, exist_ok=True)
        for i, v in enumerate(views):
            pos = v / np.linalg.norm(v) * radius + center
            c2w = camera_to_world(pos[None], center)[0]
            rgb, alpha = render_pointcloud(pts, cols, c2w, camera, point_size=point_size)
            rgba = rgba_from_render(rgb, alpha)
            fname = f"rgbaClip_{i}.png"
            Image.fromarray(rgba, "RGBA").save(os.path.join(sub, fname))
            add_frame(root, f"{name}/{fname}", c2w)
        jpath = os.path.join(out_dir, f"{name}.json")
        write_transforms(jpath, root)
        jsons.append(jpath)
    return jsons[0], jsons[1], pts, cols
