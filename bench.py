#!/usr/bin/env python3
"""Benchmark: hash-grid NeRF train+render throughput on one chip.

Prints ONE JSON line:
  {"metric": "nerf_rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: the BASELINE.md north-star of 2e7 rays/sec/chip (train+render) for
instant-ngp-class workloads.  The measured number is total rays processed
(training batches + full-frame renders) divided by total wall time, at the
production configuration (16-level 2^19 hash grid, 128 samples/ray,
1280x720 render).
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 2e7


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.rays import RayDataset
    from nerf_prv_tpu.nerf.render import render_image
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk

    cfg = NerfConfig()  # production defaults: L16 T2^19, 128 samples, 8192 rays
    camera = CameraConfig()
    rng = np.random.default_rng(0)

    n_frames = 16
    h, w = camera.height, camera.width
    pixels = rng.integers(0, 255, (n_frames, h, w, 4), dtype=np.uint8)
    # plausible look-at cameras on the hemisphere
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.core.transforms import AXIS_CYCLE, CV_TO_GL

    views = rng.normal(size=(n_frames, 3))
    views[:, 2] = np.abs(views[:, 2])
    views /= np.linalg.norm(views, axis=1, keepdims=True)
    c2w = camera_to_world(views * 0.3, np.zeros(3) + 1e-4)
    scale, offset = 0.5 / 0.1, np.array([0.5, 0.5, 0.5])
    rot_g = c2w[:, :3, :3][:, [2, 0, 1], :]
    org_g = c2w[:, :3, 3][:, [2, 0, 1]] * scale + offset

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt_state = make_optimizer(cfg).init(params)
    pixels_j = jnp.asarray(pixels)
    rot_j = jnp.asarray(rot_g, jnp.float32)
    org_j = jnp.asarray(org_g, jnp.float32)

    # ---- training throughput -------------------------------------------
    steps_warm, steps_meas = 20, 100
    params, opt_state, _ = train_chunk(
        params, opt_state, key, pixels_j, rot_j, org_j, camera, cfg, steps_warm
    )
    jax.block_until_ready(params["table"])
    t0 = time.perf_counter()
    params, opt_state, losses = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j, org_j, camera, cfg, steps_meas
    )
    jax.block_until_ready(losses)
    t_train = time.perf_counter() - t0
    train_rays = steps_meas * cfg.train_rays

    # ---- render throughput ---------------------------------------------
    img = render_image(params, org_j[0], rot_j[0], camera, cfg)  # compile
    jax.block_until_ready(img)
    n_render = 3
    t0 = time.perf_counter()
    for i in range(1, 1 + n_render):
        img = render_image(params, org_j[i], rot_j[i], camera, cfg)
    jax.block_until_ready(img)
    t_render = time.perf_counter() - t0
    render_rays_n = n_render * h * w

    total_rays = train_rays + render_rays_n
    total_time = t_train + t_render
    value = total_rays / total_time
    out = {
        "metric": "nerf_rays_per_sec",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_SEC, 4),
        "detail": {
            "train_rays_per_sec": round(train_rays / t_train, 1),
            "render_rays_per_sec": round(render_rays_n / t_render, 1),
            "train_steps_per_sec": round(steps_meas / t_train, 2),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
