#!/usr/bin/env python3
"""Quality/speed sweep of voxel-field configs on the synthetic splat scene.

Trains 2500 steps per variant at production-like resolution and reports
PSNR/SSIM on held-out views plus wall time.  Run detached:
  python -u experiments/exp_quality.py > /tmp/exp_quality.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf
    from synthetic import write_scene

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scene_dir = "/tmp/exp_quality_scene"
    if not os.path.exists(os.path.join(scene_dir, "train.json")):
        write_scene(
            scene_dir, n_train=24, n_test=8, camera=cam, point_size=2,
            n_points=60000,
        )
    train_js = os.path.join(scene_dir, "train.json")
    test_js = os.path.join(scene_dir, "test.json")

    variants = {
        "G40_base_no_oversample": NerfConfig(train_hit_oversample=1),
        "G40_oversample4": NerfConfig(),
        "G24_oversample4": NerfConfig(voxel_grid_size=24),
        "G32_oversample4": NerfConfig(voxel_grid_size=32),
        "G24_imp32": NerfConfig(
            voxel_grid_size=24, n_samples=32, n_importance=32
        ),
        "G40_imp32": NerfConfig(n_samples=32, n_importance=32),
        "G40_imp32+16": NerfConfig(n_samples=32, n_importance=16),
        "G40_imp48+16": NerfConfig(n_samples=48, n_importance=16),
    }
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        params, _ = train_nerf(train_js, cfg)
        t_train = time.perf_counter() - t0
        t0 = time.perf_counter()
        metrics = eval_nerf(params, test_js, cfg)
        t_eval = time.perf_counter() - t0
        print(
            f"{name:28s} train {t_train:6.1f}s eval {t_eval:5.1f}s "
            f"PSNR {metrics['PSNR']:6.2f} SSIM {metrics['SSIM']:.4f}",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
