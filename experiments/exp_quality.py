#!/usr/bin/env python3
"""Quality/speed sweep: hierarchical-importance training and reduced-sample
saturation-tightened rendering vs the flat-96 baseline.

Trains each train-variant 2500 steps on the synthetic splat scene, then
evaluates each with several render settings (saturation-aware 24-probe
tightening at 48/32/24 fine samples).  Run detached:
  nohup python -u experiments/exp_quality.py > /tmp/exp_quality.log 2>&1 &
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
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

    train_variants = {
        "tight16+48": NerfConfig(train_coarse=16, n_samples=48),
        "tight24+48": NerfConfig(train_coarse=24, n_samples=48),
        "tight16+32": NerfConfig(train_coarse=16, n_samples=32),
        "tight24+32": NerfConfig(train_coarse=24, n_samples=32),
        "tight16+24": NerfConfig(train_coarse=16, n_samples=24),
    }
    render_variants = {"r32": 32, "r24": 24}

    for tname, cfg in train_variants.items():
        t0 = time.perf_counter()
        params, _ = train_nerf(train_js, cfg)
        t_train = time.perf_counter() - t0
        for rname, ns in render_variants.items():
            ecfg = dataclasses.replace(cfg, render_n_samples=ns)
            t0 = time.perf_counter()
            metrics = eval_nerf(params, test_js, ecfg)
            t_eval = time.perf_counter() - t0
            print(
                f"{tname:10s} {rname:4s} train {t_train:6.1f}s eval {t_eval:5.1f}s "
                f"PSNR {metrics['PSNR']:6.2f} SSIM {metrics['SSIM']:.4f}",
                flush=True,
            )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
