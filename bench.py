#!/usr/bin/env python3
"""Benchmark: flagship NeRF train+render throughput on one chip.

Prints ONE JSON line:
  {"metric": "nerf_rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: BASELINE.md's north star of 2e7 rays/sec/chip (train+render) for
instant-ngp-class workloads.  Measures the production configuration of the
wide-row voxel field (one gather per sample, 96 samples/ray, 4096-ray train
batches, 1280x720 render) with device-synchronized timing (host readback of
a reduction — block_until_ready alone does not synchronize through the axon
tunnel).
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 2e7


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.render import render_image
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk

    cfg = NerfConfig()  # voxel field production defaults
    camera = CameraConfig()
    rng = np.random.default_rng(0)

    n_frames = 16
    h, w = camera.height, camera.width
    pixels = rng.integers(0, 255, (n_frames, h, w, 4), dtype=np.uint8)
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

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # ---- training throughput -------------------------------------------
    steps_warm, steps_meas = 50, 500
    params, opt_state, losses = train_chunk(
        params, opt_state, key, pixels_j, rot_j, org_j, camera, cfg, steps_warm
    )
    sync(losses)
    t0 = time.perf_counter()
    params, opt_state, losses = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j, org_j, camera, cfg, steps_meas
    )
    sync(losses)
    t_train = time.perf_counter() - t0
    train_rays = steps_meas * cfg.train_rays

    # ---- render throughput ---------------------------------------------
    img = render_image(params, org_j[0], rot_j[0], camera, cfg)
    sync(img)
    n_render = 3
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(1, 1 + n_render):
        img = render_image(params, org_j[i], rot_j[i], camera, cfg)
    acc = sync(img)
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
            "field": cfg.field_impl,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
