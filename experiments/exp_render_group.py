#!/usr/bin/env python3
"""Render frame-group size sweep: 8 (current) vs 16 vs 24 frames/group.

The eval loop (api.eval_nerf) and bench render in 8-frame groups; each
group pays fixed costs that a bigger group amortizes — one ~29 ms host
readback (speculative-bound verify), dispatch gaps between the stage
jits, and the slack-rounding of the speculative chunk bounds.  100
protocol eval frames = 12.5 groups of 8 vs 6.25 of 16: if the fixed
part is ~50-70 ms/group this is worth ~0.3-0.45 s/object.

Outputs must be frame-identical across group sizes (grouping only
changes how rays are batched through the same chunked program); this
script checks that too.

  nohup python -u experiments/exp_render_group.py > /tmp/exp_rgroup.log 2>&1 &
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
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.render import build_render_aux, render_views
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk
    from nerf_prv_tpu.viewspace import generate_hemisphere
    from synthetic import write_scene

    cfg = NerfConfig()
    camera = CameraConfig()
    scene_dir = "/tmp/bench_scene_v2"
    train_js = os.path.join(scene_dir, "train.json")
    if not os.path.exists(train_js):
        write_scene(scene_dir, n_train=16, n_test=8, camera=camera,
                    point_size=3, n_points=120000)
    ds = load_dataset(train_js, with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)
    pool, pool_n = build_hit_pool(rot, org, camera)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # train a realistic field (occupancy/silhouette like the protocol eval)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = make_optimizer(cfg).init(params)
    params, opt_state, losses = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels, rot, org, camera,
        cfg, 1000, None, pool, pool_n)
    sync(losses)
    aux = build_render_aux(params, cfg)

    # 48 eval-orbit views (the protocol renders 100 test views)
    views = generate_hemisphere(48, seed=5, restarts=2, steps=200)
    pos = views / np.linalg.norm(views, axis=1, keepdims=True) * 0.3
    c2w = camera_to_world(pos, np.zeros(3) + 1e-4)
    # dataset-convention axis remap (matches rays.load_dataset world frame)
    org_e = jnp.asarray(np.asarray(ds.origins[:1]), jnp.float32)  # noqa: F841
    rot_all = jnp.asarray(ds.rotations, jnp.float32)
    org_all = jnp.asarray(ds.origins, jnp.float32)
    # reuse the 16 train views tiled to 48 so every group size sees the
    # exact same frames (the orbit math above is only a fallback)
    idx = np.arange(48) % rot_all.shape[0]
    rot48 = rot_all[idx]
    org48 = org_all[idx]

    h, w = camera.height, camera.width
    base = {}
    for group in (8, 16, 24):
        n_groups = 48 // group
        # warm twice: exact-count path seeds the speculative cache, second
        # pass compiles the slack-rounded speculative shapes
        for _ in range(2):
            for gi in range(n_groups):
                s = gi * group
                imgs = render_views(params, org48[s:s + group],
                                    rot48[s:s + group], camera, cfg, aux=aux)
                sync(imgs[..., 3])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            outs = []
            for gi in range(n_groups):
                s = gi * group
                outs.append(render_views(params, org48[s:s + group],
                                         rot48[s:s + group], camera, cfg,
                                         aux=aux))
            sync(outs[-1][..., 3])
            best = min(best, time.perf_counter() - t0)
        rate = 48 * h * w / best
        print(f"group {group:2d}: {best * 1e3:7.1f} ms /48 frames  "
              f"{rate / 1e6:5.1f} M rays/s", flush=True)
        img0 = np.asarray(outs[0][0])
        if 8 in base:
            diff = np.abs(img0 - base[8]).max()
            print(f"   max|frame0 - group8 frame0| = {diff:.2e}", flush=True)
        else:
            base[8] = img0
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
