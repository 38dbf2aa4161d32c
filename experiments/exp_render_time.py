#!/usr/bin/env python3
"""Minimal production-render timing: train 1000 steps on the bench scene,
then time the 8-frame group render (double-warmed, speculative steady
state) and report PSNR/SSIM on the test views.

  nohup python -u experiments/exp_render_time.py > /tmp/exp_rt.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.api import eval_nerf
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.render import build_render_aux, render_views
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk
    from synthetic import write_scene

    cfg = NerfConfig()
    camera = CameraConfig()
    scene_dir = "/tmp/bench_scene_v2"
    train_js = os.path.join(scene_dir, "train.json")
    test_js = os.path.join(scene_dir, "test.json")
    if not os.path.exists(train_js):
        write_scene(scene_dir, n_train=16, n_test=8, camera=camera,
                    point_size=3, n_points=120000)
    ds = load_dataset(train_js, with_images=True)
    pixels_j = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot_j = jnp.asarray(ds.rotations, jnp.float32)
    org_j = jnp.asarray(ds.origins, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt_state = make_optimizer(cfg).init(params)
    params, opt_state, losses = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j, org_j,
        camera, cfg, 1000)
    sync(losses)
    aux = build_render_aux(params, cfg)
    n_render = 8
    h, w = camera.height, camera.width
    for _ in range(3):
        imgs = render_views(params, org_j[:n_render], rot_j[:n_render],
                            camera, cfg, aux=aux)
        sync(imgs[..., 3])
    for rep in range(3):
        t0 = time.perf_counter()
        imgs = render_views(params, org_j[:n_render], rot_j[:n_render],
                            camera, cfg, aux=aux)
        sync(imgs[..., 3])
        dt = time.perf_counter() - t0
        print(f"render rep{rep}: {dt*1e3:7.1f} ms "
              f"({n_render*h*w/dt/1e6:5.2f} M rays/s)", flush=True)
    m = eval_nerf(params, test_js, cfg)
    print(f"PSNR {m['PSNR']:.3f}  SSIM {m['SSIM']:.4f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
