#!/usr/bin/env python3
"""Render chunk-size sweep on the fused sync-free tile render.

exp_render_anatomy4 leaves ~40 ms/group of dispatch gap between the
device-estimated phase sum (~285 ms) and the measured full render
(~357 ms): the group issues ~20 chunked programs through the axon tunnel.
Fewer, bigger chunks shrink the gap (HBM headroom allows 4x the current
131k-ray chunk at ~1.3 GB of live march activations); this sweeps chunk
sizes and re-measures the steady-state group render, plus best-of-3
timing to bound tunnel jitter (the round's bench runs measured 17.8 vs
21.7 M rays/s on IDENTICAL code).

  nohup python -u experiments/exp_render_chunk.py > /tmp/exp_rchunk.log 2>&1 &
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
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.render import build_render_aux, render_views
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk
    from synthetic import write_scene

    cfg = NerfConfig()
    camera = CameraConfig()
    scene_dir = "/tmp/bench_scene_v2"
    if not os.path.exists(os.path.join(scene_dir, "train.json")):
        write_scene(scene_dir, n_train=16, n_test=8, camera=camera,
                    point_size=3, n_points=120000)
    ds = load_dataset(os.path.join(scene_dir, "train.json"), with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # train ~2000 steps so the render sees a realistic trained field
    pool, pool_n = build_hit_pool(rot, org, camera)
    params = init_params(jax.random.PRNGKey(0), cfg)
    opt_state = make_optimizer(cfg).init(params)
    for s in range(4):
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(s), pixels, rot, org,
            camera, cfg, 500, None, pool, pool_n)
    sync(losses)

    aux = build_render_aux(params, cfg)
    n_render = 8
    ref = None
    for chunk in (1 << 17, 1 << 18, 1 << 19):
        # warm twice: exact pass seeds _SPEC_COUNTS, second compiles the
        # speculative shapes
        for _ in range(2):
            imgs = render_views(params, org[:n_render], rot[:n_render],
                                camera, cfg, chunk=chunk, aux=aux)
            sync(imgs[..., 3])
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            imgs = render_views(params, org[:n_render], rot[:n_render],
                                camera, cfg, chunk=chunk, aux=aux)
            sync(imgs[..., 3])
            times.append(time.perf_counter() - t0)
        n_rays = n_render * camera.height * camera.width
        if ref is None:
            ref = np.asarray(imgs)
            err = 0.0
        else:
            err = float(np.max(np.abs(np.asarray(imgs) - ref)))
        print(f"chunk {chunk >> 10:4d}k  "
              + "  ".join(f"{t*1e3:6.1f}" for t in times)
              + f" ms  best {n_rays / min(times) / 1e6:5.1f} M rays/s"
              + f"  max|diff| {err:.2e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
