#!/usr/bin/env python3
"""A/B the interval-tightened deterministic render on a trained model:
quality (PSNR/SSIM, fixed metrics) + 1280x720 throughput per setting.

python -u experiments/exp_render_coarse.py > /tmp/exp_rc.log
"""
import dataclasses
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
    train_js = os.path.join(scene_dir, "train.json")
    test_js = os.path.join(scene_dir, "test.json")

    base = NerfConfig()  # G40 flat 96 flagship
    t0 = time.perf_counter()
    params, _ = train_nerf(train_js, base)
    print(f"trained flagship in {time.perf_counter()-t0:.1f}s", flush=True)

    # production-camera render views for throughput
    camera = CameraConfig()
    rng = np.random.default_rng(0)
    views = rng.normal(size=(8, 3)); views[:, 2] = np.abs(views[:, 2])
    views /= np.linalg.norm(views, axis=1, keepdims=True)
    c2w = camera_to_world(views * 0.3, np.zeros(3) + 1e-4)
    rot8 = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org8 = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)

    settings = [
        ("flat96", dict(render_coarse=0, render_n_samples=96)),
        ("rc24+96", dict(render_coarse=24, render_n_samples=96)),
        ("rc24+64", dict(render_coarse=24, render_n_samples=64)),
        ("rc24+48", dict(render_coarse=24, render_n_samples=48)),
        ("rc16+48", dict(render_coarse=16, render_n_samples=48)),
    ]
    for name, kw in settings:
        cfg = dataclasses.replace(base, **kw)
        m = eval_nerf(params, test_js, cfg)
        imgs = render_views(params, org8, rot8, camera, cfg)
        float(np.asarray(jnp.sum(imgs[..., 3])))
        t0 = time.perf_counter()
        imgs = render_views(params, org8, rot8, camera, cfg)
        float(np.asarray(jnp.sum(imgs[..., 3])))
        el = time.perf_counter() - t0
        print(f"{name:10s} PSNR {m['PSNR']:6.2f} SSIM {m['SSIM']:.4f}  "
              f"render {8*camera.width*camera.height/el/1e6:5.2f} Mrays/s",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
