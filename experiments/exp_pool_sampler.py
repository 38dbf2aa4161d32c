#!/usr/bin/env python3
"""Hit-pixel-pool sampler: step-rate + quality check.

exp_train_anatomy2 put per-step sampling at 1.08 ms of the 3.9 ms step —
the 4x-oversample argsort partition recomputed a STATIC set (the
sphere-hit pixels) every step.  build_hit_pool computes it once; this
experiment measures the pooled step rate and confirms end-to-end quality
on the bench scene.

  nohup python -u experiments/exp_pool_sampler.py > /tmp/exp_pool.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def main():
    import dataclasses

    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.api import eval_nerf
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk
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

    t0 = time.perf_counter()
    pool, pool_n = build_hit_pool(rot_j, org_j, camera)
    sync(pool_n)
    print(f"pool build {time.perf_counter() - t0:.3f} s  "
          f"n_hit {int(pool_n)} / {pool.shape[0]} "
          f"({int(pool_n) / pool.shape[0]:.1%})", flush=True)

    warm_cfg = dataclasses.replace(cfg, train_coarse=0,
                                   n_samples=cfg.train_warmup_samples)
    for name, phase_cfg in (("tight", cfg), ("warmup", warm_cfg)):
        for label, args in (("pooled", (None, pool, pool_n)),
                            ("oversample", (None, None, None))):
            params = init_params(jax.random.PRNGKey(0), cfg)
            opt_state = make_optimizer(cfg).init(params)
            params, opt_state, losses = train_chunk(
                params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j,
                org_j, camera, phase_cfg, 500, *args)
            sync(losses)
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                params, opt_state, losses = train_chunk(
                    params, opt_state, jax.random.PRNGKey(2), pixels_j, rot_j,
                    org_j, camera, phase_cfg, 500, *args)
                sync(losses)
                best = min(best, time.perf_counter() - t0)
            print(f"{name:7s} {label:11s} {best / 500 * 1e3:6.3f} ms/step", flush=True)

    # quality: full production train (warmup + tight phases) through train()
    from nerf_prv_tpu.nerf.train import train

    for seed in (0, 1):
        t0 = time.perf_counter()
        params, losses = train(ds, cfg, seed=seed)
        m = eval_nerf(params, test_js, cfg)
        print(f"seed {seed}: PSNR {m['PSNR']:.2f} SSIM {m['SSIM']:.4f} "
              f"(train+eval {time.perf_counter() - t0:.1f} s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
