#!/usr/bin/env python3
"""Validate the two-level RenderAux probe: PSNR parity + render speed.

  nohup python -u experiments/exp_aux_probe.py > /tmp/exp_aux.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf
    from nerf_prv_tpu.nerf.render import render_views
    from synthetic import write_scene

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scene_dir = "/tmp/exp_quality_scene"
    if not os.path.exists(os.path.join(scene_dir, "train.json")):
        write_scene(scene_dir, n_train=24, n_test=8, camera=cam, point_size=2,
                    n_points=60000)
    cfg = NerfConfig()
    t0 = time.perf_counter()
    params, _ = train_nerf(os.path.join(scene_dir, "train.json"), cfg)
    print(f"train {time.perf_counter()-t0:.1f}s", flush=True)
    m = eval_nerf(params, os.path.join(scene_dir, "test.json"), cfg)
    print(f"aux-probe PSNR {m['PSNR']:.2f} SSIM {m['SSIM']:.4f}", flush=True)

    # production-resolution render rate
    camera = CameraConfig()
    rng = np.random.default_rng(0)
    v = rng.normal(size=(8, 3)); v[:, 2] = np.abs(v[:, 2])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    c2w = camera_to_world(v * 0.3, np.zeros(3) + 1e-4)
    rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    sync(render_views(params, org, rot, camera, cfg)[..., 3])
    t0 = time.perf_counter()
    sync(render_views(params, org, rot, camera, cfg)[..., 3])
    el = time.perf_counter() - t0
    n = 8 * camera.height * camera.width
    print(f"render 8f@720p: {el*1e3:.0f} ms  {n/el/1e6:.2f} M rays/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
