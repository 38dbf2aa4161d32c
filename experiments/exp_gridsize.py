#!/usr/bin/env python3
"""Grid-size / probe-count sweep: G32 matches the GT octree's 32-voxel
object sampling and halves the scatter table; is it quality-neutral?

  nohup python -u experiments/exp_gridsize.py > /tmp/exp_gs.log 2>&1 &
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
        "G40 (prod)": NerfConfig(),
        "G32": NerfConfig(voxel_grid_size=32),
        "G36": NerfConfig(voxel_grid_size=36),
        "G32 p2fine12": NerfConfig(voxel_grid_size=32, render_probe_fine=12),
        "G40 p2fine12": NerfConfig(render_probe_fine=12),
    }
    for name, cfg in variants.items():
        t0 = time.perf_counter()
        params, _ = train_nerf(train_js, cfg)
        t_train = time.perf_counter() - t0
        m = eval_nerf(params, test_js, cfg)
        print(
            f"{name:18s} train {t_train:6.1f}s PSNR {m['PSNR']:6.2f} "
            f"SSIM {m['SSIM']:.4f}",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
