#!/usr/bin/env python3
"""Warmup-phase sweep: the flat-march warmup is now ~40% of protocol train
time (500 steps x 12.2 ms vs 2000 x 4.66 ms tightened).  How short/coarse
can it get before quality suffers?

  nohup python -u experiments/exp_warmup.py > /tmp/exp_warmup.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


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
        write_scene(scene_dir, n_train=24, n_test=8, camera=cam, point_size=2,
                    n_points=60000)
    train_js = os.path.join(scene_dir, "train.json")
    test_js = os.path.join(scene_dir, "test.json")

    variants = {
        "w500s96 (prod)": NerfConfig(),
        "w500s48": NerfConfig(train_warmup_samples=48),
        "w250s96": NerfConfig(train_warmup_steps=250),
        "w250s48": NerfConfig(train_warmup_steps=250, train_warmup_samples=48),
        "w125s48": NerfConfig(train_warmup_steps=125, train_warmup_samples=48),
        "w0 (none)": NerfConfig(train_warmup_steps=0),
    }
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        params, _ = train_nerf(train_js, cfg)
        t_train = time.perf_counter() - t0
        metrics = eval_nerf(params, test_js, cfg)
        print(
            f"{name:16s} train {t_train:6.1f}s PSNR {metrics['PSNR']:6.2f} "
            f"SSIM {metrics['SSIM']:.4f}",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
