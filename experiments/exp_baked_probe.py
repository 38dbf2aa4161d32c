#!/usr/bin/env python3
"""Baked train probe: rebake a corner-sigma table every `refresh` steps in
the train scan and probe against it (one 16-byte gather/sample,
render._tighten_interval_baked) instead of evaluating the field MLP at
every probe midpoint (train_coarse=12 -> 49k MLP rows + wide gathers per
step).  Measures step time (random-pixel scene, train_chunk directly) and
PSNR (synthetic quality scene, full train+eval) per refresh period.

  nohup python -u experiments/exp_baked_probe.py > /tmp/exp_baked.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def sync(x):
    return float(np.asarray(x))


def time_steps(refresh):
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk

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

    cfg = NerfConfig(train_probe_refresh=refresh)
    pool, pool_n = build_hit_pool(rot, org, camera)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt = make_optimizer(cfg).init(params)
    p, o, l = train_chunk(params, opt, jax.random.PRNGKey(1), px, rot, org,
                          camera, cfg, 300, None, pool, pool_n)
    sync(jnp.sum(l))
    t0 = time.perf_counter()
    p, o, l = train_chunk(p, o, jax.random.PRNGKey(2), px, rot, org,
                          camera, cfg, 300, None, pool, pool_n)
    sync(jnp.sum(l))
    el = time.perf_counter() - t0
    return el / 300 * 1e3


def quality(refresh, scene_dir):
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf

    cfg = NerfConfig(train_probe_refresh=refresh)
    t0 = time.perf_counter()
    params, _ = train_nerf(os.path.join(scene_dir, "train.json"), cfg)
    t_train = time.perf_counter() - t0
    m = eval_nerf(params, os.path.join(scene_dir, "test.json"), cfg)
    return t_train, m["PSNR"], m["SSIM"]


def main():
    import jax

    from nerf_prv_tpu.core.config import CameraConfig
    from synthetic import write_scene

    print("device:", jax.devices()[0], flush=True)

    for refresh in (0, 32, 16, 8, 4):
        ms = time_steps(refresh)
        print(f"refresh {refresh:3d}: {ms:6.3f} ms/step "
              f"({4096/ms*1e3/1e6:5.2f} M rays/s train)", flush=True)

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scene_dir = "/tmp/exp_quality_scene"
    if not os.path.exists(os.path.join(scene_dir, "train.json")):
        write_scene(scene_dir, n_train=24, n_test=8, camera=cam, point_size=2,
                    n_points=60000)
    for refresh in (0, 16, 8):
        t_train, psnr, ssim = quality(refresh, scene_dir)
        print(f"refresh {refresh:3d}: train {t_train:6.1f}s "
              f"PSNR {psnr:6.2f} SSIM {ssim:.4f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
