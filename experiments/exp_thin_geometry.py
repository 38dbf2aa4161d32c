#!/usr/bin/env python3
"""Thin-geometry stress test for the probe-tightened defaults.

An object with one-voxel-scale parts (thin rods + a thin disk + a small
blob) is the failure mode interval tightening could hide: a rod that falls
between probes never gets sampled.  Compare production defaults against a
conservative no-tricks config (flat-96 train, MLP probe + 48 fine).

  nohup python -u experiments/exp_thin_geometry.py > /tmp/exp_thin.log 2>&1 &
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def make_thin_object(n=60000, seed=0, size=0.05):
    """Blob + 3 thin rods + a thin disk, all ~1-2 voxel thick at G40."""
    rng = np.random.default_rng(seed)
    parts = []
    # small central blob
    b = rng.normal(size=(n // 4, 3))
    b = b / np.linalg.norm(b, axis=1, keepdims=True) * size * 0.35
    parts.append(b)
    # three axis rods, radius ~ size/40 (~1 cell at G40)
    for axis in range(3):
        t = rng.uniform(-1, 1, n // 4)
        r = rng.normal(size=(n // 4, 2)) * size / 40
        rod = np.zeros((n // 4, 3))
        rod[:, axis] = t * size
        others = [a for a in range(3) if a != axis]
        rod[:, others[0]] = r[:, 0]
        rod[:, others[1]] = r[:, 1]
        parts.append(rod)
    # thin disk in the xy plane
    ang = rng.uniform(0, 2 * np.pi, n // 4)
    rad = np.sqrt(rng.uniform(0.25, 1.0, n // 4)) * size * 0.9
    disk = np.stack(
        [rad * np.cos(ang), rad * np.sin(ang), rng.normal(size=n // 4) * size / 50],
        axis=-1,
    )
    parts.append(disk)
    pts = np.concatenate(parts)
    cols = np.clip(((pts / size) * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    return pts, cols


def main():
    from PIL import Image

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.core.transforms import add_frame, make_root, write_transforms
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf
    from nerf_prv_tpu.scene import render_pointcloud, rgba_from_render
    from nerf_prv_tpu.viewspace import generate_hemisphere

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    out_dir = "/tmp/exp_thin_scene"
    train_js = os.path.join(out_dir, "train.json")
    if not os.path.exists(train_js):
        pts, cols = make_thin_object()
        center = pts.mean(axis=0)
        predicted_size = float(np.linalg.norm(pts - center, axis=1).max() * 17 / 16)
        views_train = generate_hemisphere(24, seed=1, restarts=2, steps=200)
        views_test = generate_hemisphere(11, seed=2, restarts=2, steps=200)[3:]
        os.makedirs(out_dir, exist_ok=True)
        for name, views in (("train", views_train), ("test", views_test)):
            root = make_root(cam, 1, predicted_size, center)
            sub = os.path.join(out_dir, name)
            os.makedirs(sub, exist_ok=True)
            for i, v in enumerate(views):
                pos = v / np.linalg.norm(v) * 0.3 + center
                c2w = camera_to_world(pos[None], center)[0]
                rgb, alpha = render_pointcloud(pts, cols, c2w, cam, point_size=2)
                rgba = rgba_from_render(rgb, alpha)
                Image.fromarray(rgba, "RGBA").save(os.path.join(sub, f"rgbaClip_{i}.png"))
                add_frame(root, f"{name}/rgbaClip_{i}.png", c2w)
            write_transforms(os.path.join(out_dir, f"{name}.json"), root)
    test_js = os.path.join(out_dir, "test.json")

    variants = {
        "blk2 rp32 (prod)": NerfConfig(),
        "blk2 rp24": NerfConfig(render_probe_fine=24),
        "blk2 rp20": NerfConfig(render_probe_fine=20),
    }
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        params, _ = train_nerf(train_js, cfg)
        t_train = time.perf_counter() - t0
        m = eval_nerf(params, test_js, cfg)
        print(
            f"{name:14s} train {t_train:6.1f}s PSNR {m['PSNR']:6.2f} "
            f"SSIM {m['SSIM']:.4f} minPSNR {m['min_PSNR']:.2f}",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
