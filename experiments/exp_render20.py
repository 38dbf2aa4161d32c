#!/usr/bin/env python3
"""Can the RENDER march shed rows?  render_probe_fine / render_n_samples
sweep below the adopted 24/24.

The fused probe+march is the render's dominant phase (~202 ms device of
~285 per 8-frame group, exp_render_anatomy4) and is row-bound: each
level-1-surviving ray pays render_probe_fine narrow rows + render_n_samples
wide rows.  Render settings don't touch training, so one trained field per
(scene, seed) is evaluated under every variant — quality deltas are exact,
not seed-confounded.  Speed: steady-state 8-frame group render on the
bench scene per variant.

  nohup python -u experiments/exp_render20.py > /tmp/exp_r20.log 2>&1 &
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
    from nerf_prv_tpu.nerf.render import build_render_aux, render_views
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk
    from synthetic import write_scene

    base = NerfConfig()
    variants = {
        "rp24 rs24 (prod)": base,
        "rp24 rs16": dataclasses.replace(base, render_n_samples=16),
        "rp20 rs16": dataclasses.replace(
            base, render_probe_fine=20, render_n_samples=16),
        "rp16 rs16": dataclasses.replace(
            base, render_probe_fine=16, render_n_samples=16),
    }

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scene_dir = "/tmp/exp_quality_scene"
    thin_dir = "/tmp/exp_thin_scene"  # built by exp_train16
    if not os.path.exists(os.path.join(scene_dir, "train.json")):
        write_scene(scene_dir, n_train=24, n_test=8, camera=cam, point_size=2,
                    n_points=60000)

    for tag, d in (("splat", scene_dir), ("thin", thin_dir)):
        if not os.path.exists(os.path.join(d, "train.json")):
            print(f"{tag}: scene missing, skipped", flush=True)
            continue
        for seed in (0, 1):
            params, _ = train_nerf(os.path.join(d, "train.json"), base, seed=seed)
            line = f"{tag} seed {seed}:"
            for name, cfg in variants.items():
                m = eval_nerf(params, os.path.join(d, "test.json"), cfg)
                line += f"  {name.split()[0]}/{name.split()[1]} {m['PSNR']:6.2f}"
            print(line, flush=True)

    # steady-state group render speed on the bench scene
    camera = CameraConfig()
    bench = "/tmp/bench_scene_v2"
    if not os.path.exists(os.path.join(bench, "train.json")):
        write_scene(bench, n_train=16, n_test=8, camera=camera, point_size=3,
                    n_points=120000)
    ds = load_dataset(os.path.join(bench, "train.json"), with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    pool, pool_n = build_hit_pool(rot, org, camera)
    params = init_params(jax.random.PRNGKey(0), base)
    opt_state = make_optimizer(base).init(params)
    for s in range(4):
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(s), pixels, rot, org,
            camera, base, 500, None, pool, pool_n)
    sync(losses)
    n_render = 8
    n_rays = n_render * camera.height * camera.width
    for name, cfg in variants.items():
        aux = build_render_aux(params, cfg)
        for _ in range(2):
            imgs = render_views(params, org[:n_render], rot[:n_render],
                                camera, cfg, aux=aux)
            sync(imgs[..., 3])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            imgs = render_views(params, org[:n_render], rot[:n_render],
                                camera, cfg, aux=aux)
            sync(imgs[..., 3])
            times.append(time.perf_counter() - t0)
        print(f"{name:18s} best {min(times)*1e3:6.1f} ms/group "
              f"({n_rays / min(times) / 1e6:5.1f} M rays/s)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
