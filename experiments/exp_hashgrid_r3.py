#!/usr/bin/env python3
"""Re-validate the hash-grid field at round-2 settings (VERDICT r2 item 6).

The round-2 probe/pipeline reworks all targeted the voxel flagship; the
hash field (nerf/hashgrid.py + ops/hash_encode.py) kept unit tests but no
current quality/speed numbers.  This trains BOTH fields on BOTH quality
scenes (the splat scene from exp_quality.py and the thin-geometry scene
from exp_thin_geometry.py) at the production protocol (2500 steps) and
records PSNR + wall + steady-state ms/step, so README can either keep the
hash field as a supported alternative or demote it with its measured gap.

  nohup python -u experiments/exp_hashgrid_r3.py > /tmp/hashgrid_r3.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def make_scenes(cam):
    from PIL import Image

    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.core.transforms import add_frame, make_root, write_transforms
    from nerf_prv_tpu.scene import render_pointcloud, rgba_from_render
    from nerf_prv_tpu.viewspace import generate_hemisphere
    from exp_thin_geometry import make_thin_object
    from synthetic import write_scene

    def _complete(d):
        # a stale dir can hold the json but not the images (tmp cleanup):
        # require the first frame too, else regenerate
        return (os.path.exists(os.path.join(d, "train.json"))
                and os.path.exists(os.path.join(d, "train", "rgbaClip_0.png")))

    scenes = {}
    splat_dir = "/tmp/exp_quality_scene_r3"
    if not _complete(splat_dir):
        write_scene(splat_dir, n_train=24, n_test=8, camera=cam,
                    point_size=2, n_points=60000)
    scenes["splat"] = (os.path.join(splat_dir, "train.json"),
                      os.path.join(splat_dir, "test.json"))

    thin_dir = "/tmp/exp_thin_scene_r3"
    train_js = os.path.join(thin_dir, "train.json")
    if not _complete(thin_dir):
        pts, cols = make_thin_object()
        center = pts.mean(axis=0)
        predicted_size = float(np.linalg.norm(pts - center, axis=1).max() * 17 / 16)
        views_train = generate_hemisphere(24, seed=1, restarts=2, steps=200)
        views_test = generate_hemisphere(11, seed=2, restarts=2, steps=200)[3:]
        os.makedirs(thin_dir, exist_ok=True)
        for name, views in (("train", views_train), ("test", views_test)):
            root = make_root(cam, 1, predicted_size, center)
            sub = os.path.join(thin_dir, name)
            os.makedirs(sub, exist_ok=True)
            for i, v in enumerate(views):
                pos = v / np.linalg.norm(v) * 0.3 + center
                c2w = camera_to_world(pos[None], center)[0]
                rgb, alpha = render_pointcloud(pts, cols, c2w, cam, point_size=2)
                rgba = rgba_from_render(rgb, alpha)
                Image.fromarray(rgba, "RGBA").save(
                    os.path.join(sub, f"rgbaClip_{i}.png"))
                add_frame(root, os.path.join(name, f"rgbaClip_{i}.png"), c2w)
            write_transforms(os.path.join(thin_dir, f"{name}.json"), root)
    scenes["thin"] = (train_js, os.path.join(thin_dir, "test.json"))
    return scenes


def main():
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scenes = make_scenes(cam)

    # resume: keep entries already measured (the voxel half survived the
    # round-3 hash TPU fault — no need to re-spend its 7 min of chip time)
    art_path = os.path.join(ART, "hashgrid_r3.json")
    results = {}
    if os.path.exists(art_path):
        with open(art_path) as f:
            results = json.load(f)
    for field in ("voxel", "hash"):
        cfg = NerfConfig(field_impl=field)
        for scene, (train_js, test_js) in scenes.items():
            for seed in (0, 1):
                if f"{field}/{scene}/s{seed}" in results:
                    continue
                t0 = time.perf_counter()
                params, losses = train_nerf(train_js, cfg, seed=seed)
                t_train = time.perf_counter() - t0
                m = eval_nerf(params, test_js, cfg)
                key = f"{field}/{scene}/s{seed}"
                results[key] = {
                    "train_seconds": round(t_train, 1),
                    "PSNR": round(float(m["PSNR"]), 2),
                    "SSIM": round(float(m["SSIM"]), 4),
                }
                print(key, json.dumps(results[key]), flush=True)
                with open(os.path.join(ART, "hashgrid_r3.json"), "w") as f:
                    json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
