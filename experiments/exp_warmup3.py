#!/usr/bin/env python3
"""Warmup phase at fewer RAYS (the knob exp_warmup2 didn't try).

exp_warmup2 cut warmup SAMPLES (125x24: -0.16..-0.29 dB) and STEPS
(64x48 / none: fails the 35.3 splat gate) — both reduce how much
geometry the warmup forms.  Fewer RAYS per warmup step is different:
each step still marches 48 samples over the full chord (same per-ray
information), the gradient is just averaged over a smaller batch, and
Adam's 125 noisier steps may form the same coarse geometry.  The warmup
step is row-count-bound, so 2048 rays should take roughly half the
5.71 ms and save ~0.3 s of the 10.15 s protocol.

Arms: warmup rays 4096 (prod) / 3072 / 2048, on both quality scenes x
2 seeds, plus warm-phase step time at production shapes for each.

  nohup python -u experiments/exp_warmup3.py > /tmp/exp_warm3.log 2>&1 &
"""
import dataclasses
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
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk
    from synthetic import write_scene

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scene_dir = "/tmp/exp_quality_scene"
    if not os.path.exists(os.path.join(scene_dir, "train.json")):
        write_scene(scene_dir, n_train=24, n_test=8, camera=cam, point_size=2,
                    n_points=60000)
    thin_dir = "/tmp/exp_thin_scene"
    if not os.path.exists(os.path.join(thin_dir, "train.json")):
        import exp_thin_geometry as thin_mod
        from PIL import Image

        from nerf_prv_tpu.core.pose import camera_to_world
        from nerf_prv_tpu.core.transforms import (add_frame, make_root,
                                                  write_transforms)
        from nerf_prv_tpu.scene import render_pointcloud, rgba_from_render
        from nerf_prv_tpu.viewspace import generate_hemisphere

        pts, cols = thin_mod.make_thin_object()
        center = pts.mean(axis=0)
        predicted_size = float(np.linalg.norm(pts - center, axis=1).max() * 17 / 16)
        views_train = generate_hemisphere(24, seed=1, restarts=2, steps=200)
        views_test = generate_hemisphere(11, seed=2, restarts=2, steps=200)[3:]
        os.makedirs(thin_dir, exist_ok=True)
        for name, views in (("train", views_train), ("test", views_test)):
            root = make_root(cam, 1, predicted_size, center)
            sub = os.path.join(thin_dir, name)
            os.makedirs(sub, exist_ok=True)
            for i, v in enumerate(views):
                pos = v / np.linalg.norm(v) * 0.3 + center
                c2w = camera_to_world(pos[None], center)[0]
                rgb, alpha = render_pointcloud(pts, cols, c2w, cam, point_size=2)
                rgba = rgba_from_render(rgb, alpha)
                Image.fromarray(rgba, "RGBA").save(
                    os.path.join(sub, f"rgbaClip_{i}.png"))
                add_frame(root, f"{name}/rgbaClip_{i}.png", c2w)
            write_transforms(os.path.join(thin_dir, f"{name}.json"), root)

    variants = {
        "wr4096 (prod)": NerfConfig(),
        "wr3072": NerfConfig(train_warmup_rays=3072),
        "wr2048": NerfConfig(train_warmup_rays=2048),
    }
    for name, cfg in variants.items():
        for seed in (0, 1):
            line = f"{name:14s} seed {seed}:"
            for tag, d in (("splat", scene_dir), ("thin", thin_dir)):
                params, _ = train_nerf(os.path.join(d, "train.json"), cfg,
                                       seed=seed)
                m = eval_nerf(params, os.path.join(d, "test.json"), cfg)
                line += f"  {tag} {m['PSNR']:6.2f}/{m['SSIM']:.4f}"
            print(line, flush=True)

    # warm-phase step time at production shapes
    prod_cam = CameraConfig()
    bench_js = "/tmp/bench_scene_v2/train.json"
    if not os.path.exists(bench_js):
        write_scene("/tmp/bench_scene_v2", n_train=16, n_test=8,
                    camera=prod_cam, point_size=3, n_points=120000)
    ds = load_dataset(bench_js, with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)
    pool, pool_n = build_hit_pool(rot, org, prod_cam)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    sync(pool_n)
    for rays in (4096, 3072, 2048):
        wcfg = dataclasses.replace(NerfConfig(), train_coarse=0,
                                   n_samples=48, train_rays=rays)
        params = init_params(jax.random.PRNGKey(0), wcfg)
        opt_state = make_optimizer(wcfg).init(params)
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(1), pixels, rot, org,
            prod_cam, wcfg, 500, None, pool, pool_n)
        sync(losses)
        best = 1e9
        for i in range(2):
            t0 = time.perf_counter()
            params, opt_state, losses = train_chunk(
                params, opt_state, jax.random.PRNGKey(2 + i), pixels, rot,
                org, prod_cam, wcfg, 500, None, pool, pool_n)
            sync(losses)
            best = min(best, time.perf_counter() - t0)
        print(f"warm rays {rays}: {best / 500 * 1e3:6.3f} ms/step", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
