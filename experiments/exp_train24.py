#!/usr/bin/env python3
"""Can the train march shed rows? 24 gradient samples / 8 probes.

The train step is row-bound (exp_batched_train.py): per ray it gathers
16 probe + 32 fine rows and scatter-adds 32 rows.  Variants:
  t-base   train_coarse=16, n_samples=32  (production)
  t24      train_coarse=16, n_samples=24  (-25% fine rows + scatter rows)
  t24p8    train_coarse=8,  n_samples=24  (also -50% probe rows)
Quality on the splat AND thin-geometry scenes (the blob hides probe
failures), speed as tight-step time at production shapes.

  nohup python -u experiments/exp_train24.py > /tmp/exp_t24.log 2>&1 &
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
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk
    from synthetic import write_scene

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scene_dir = "/tmp/exp_quality_scene"
    if not os.path.exists(os.path.join(scene_dir, "train.json")):
        write_scene(scene_dir, n_train=24, n_test=8, camera=cam, point_size=2,
                    n_points=60000)
    thin_dir = "/tmp/exp_share_thin"  # built by exp_share_march.py

    variants = {
        "t-base": NerfConfig(),
        "t24": NerfConfig(n_samples=24),
        "t24p8": NerfConfig(n_samples=24, train_coarse=8),
    }
    for name, cfg in variants.items():
        params, _ = train_nerf(os.path.join(scene_dir, "train.json"), cfg)
        m = eval_nerf(params, os.path.join(scene_dir, "test.json"), cfg)
        line = f"splat {name:7s} PSNR {m['PSNR']:6.2f} SSIM {m['SSIM']:.4f}"
        if os.path.exists(os.path.join(thin_dir, "train.json")):
            params, _ = train_nerf(os.path.join(thin_dir, "train.json"), cfg)
            mt = eval_nerf(params, os.path.join(thin_dir, "test.json"), cfg)
            line += f" | thin PSNR {mt['PSNR']:6.2f} SSIM {mt['SSIM']:.4f}"
        print(line, flush=True)

    prod_cam = CameraConfig()
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.integers(0, 255, (16, prod_cam.height, prod_cam.width, 4), dtype=np.uint8)
    )
    rot = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (16, 1, 1)))
    org = jnp.asarray(np.tile(np.array([0.5, 0.5, -0.5], np.float32), (16, 1)))

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    steps = 200
    for name, cfg in variants.items():
        params = init_params(jax.random.PRNGKey(0), cfg)
        opt_state = make_optimizer(cfg).init(params)
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(1), pixels, rot, org,
            prod_cam, cfg, steps)
        sync(losses)
        t0 = time.perf_counter()
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(2), pixels, rot, org,
            prod_cam, cfg, steps)
        sync(losses)
        dt = time.perf_counter() - t0
        print(f"speed {name:7s} tight step {dt/steps*1e3:6.2f} ms "
              f"({steps*cfg.train_rays/dt/1e6:5.2f} M rays/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
