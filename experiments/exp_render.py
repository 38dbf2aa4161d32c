#!/usr/bin/env python3
"""Render-path throughput variants + candidate-view scoring time.

python -u experiments/exp_render.py > /tmp/exp_render.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.transforms import scaled_camera
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.render import render_views

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    camera = CameraConfig()

    def make_views(n):
        views = rng.normal(size=(n, 3))
        views[:, 2] = np.abs(views[:, 2])
        views /= np.linalg.norm(views, axis=1, keepdims=True)
        c2w = camera_to_world(views * 0.3, np.zeros(3) + 1e-4)
        rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
        org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)
        return rot, org

    rot8, org8 = make_views(8)

    cases = [
        ("G40 96 flat", NerfConfig()),
        ("G40 imp 32+32", NerfConfig(n_samples=32, n_importance=32)),
        ("G40 imp 16+48", NerfConfig(n_samples=16, n_importance=48)),
        ("G40 48 flat", NerfConfig(n_samples=48)),
        ("G24 96 flat", NerfConfig(voxel_grid_size=24)),
    ]
    h, w = camera.height, camera.width
    for name, cfg in cases:
        params = init_params(jax.random.PRNGKey(0), cfg)
        imgs = render_views(params, org8, rot8, camera, cfg)
        float(np.asarray(jnp.sum(imgs[..., 3])))
        t0 = time.perf_counter()
        imgs = render_views(params, org8, rot8, camera, cfg)
        float(np.asarray(jnp.sum(imgs[..., 3])))
        el = time.perf_counter() - t0
        n_rays = 8 * h * w
        print(f"{name:18s}: {el:6.2f} s for 8x{w}x{h}  "
              f"{n_rays/el/1e6:6.2f} Mrays/s", flush=True)

    # candidate scoring: 540 views at 1/16 res (80x45)
    cam_lo = scaled_camera(camera, 16.0)
    rot540, org540 = make_views(540)
    cfg = NerfConfig()
    params = init_params(jax.random.PRNGKey(0), cfg)
    imgs = render_views(params, org540, rot540, cam_lo, cfg)
    float(np.asarray(jnp.sum(imgs[..., 3])))
    t0 = time.perf_counter()
    imgs = render_views(params, org540, rot540, cam_lo, cfg)
    float(np.asarray(jnp.sum(imgs[..., 3])))
    el = time.perf_counter() - t0
    print(f"candidate render 540@{cam_lo.width}x{cam_lo.height}: {el:6.2f} s "
          f"({540*cam_lo.width*cam_lo.height/el/1e6:.2f} Mrays/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
