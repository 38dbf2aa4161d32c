#!/usr/bin/env python3
"""Train rate with the sort-based voxel-grid backward vs native scatter.

python -u experiments/exp_sorted.py > /tmp/exp_sorted.log
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
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk

    def sync(x):
        return float(np.asarray(x))

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    camera = CameraConfig()
    h, w = camera.height, camera.width
    pixels = rng.integers(0, 255, (8, h, w, 4), dtype=np.uint8)
    views = rng.normal(size=(8, 3)); views[:, 2] = np.abs(views[:, 2])
    views /= np.linalg.norm(views, axis=1, keepdims=True)
    c2w = camera_to_world(views * 0.3, np.zeros(3) + 1e-4)
    rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)
    px = jnp.asarray(pixels)

    cases = [
        ("G40 sorted", dict(voxel_grid_size=40, voxel_grad_impl="sorted")),
        ("G24 sorted", dict(voxel_grid_size=24, voxel_grad_impl="sorted")),
        ("G40 xla (ctl)", dict(voxel_grid_size=40)),
        ("G40 sorted r8k", dict(voxel_grid_size=40, voxel_grad_impl="sorted",
                                train_rays=8192)),
    ]
    for name, kw in cases:
        cfg = NerfConfig(**kw)
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(cfg).init(params)
        p, o, l = train_chunk(params, opt, jax.random.PRNGKey(1), px, rot, org,
                              camera, cfg, 300)
        sync(jnp.sum(l))
        t0 = time.perf_counter()
        p, o, l = train_chunk(p, o, jax.random.PRNGKey(2), px, rot, org,
                              camera, cfg, 300)
        sync(jnp.sum(l))
        el = time.perf_counter() - t0
        print(f"{name:16s}: {300/el:6.1f} steps/s  {el/300*1e3:6.2f} ms/step  "
              f"{300*cfg.train_rays/el/1e3:8.1f} Krays/s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
