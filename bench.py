#!/usr/bin/env python3
"""Benchmark: flagship NeRF train+render throughput on one chip.

Prints ONE JSON line:
  {"metric": "nerf_rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: BASELINE.md's north star of 2e7 rays/sec/chip (train+render) for
instant-ngp-class workloads.  The value is throughput over the reference's
standard per-object protocol mix — 2,500 training steps x 4,096 rays
(DefaultConfiguration.yaml:19) plus 100 test-view renders at 1280x720
(run.py:213-277) — computed from separately measured train and render rates.

Timing discipline (axon tunnel): block_until_ready does not synchronize, so
every phase is scan-amortized or batched and synchronized by a host readback;
warmup calls use the IDENTICAL static shapes as the measured calls, otherwise
the ~20 s remote compile pollutes the measurement.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 2e7

# the reference's per-object protocol
PROTOCOL_TRAIN_STEPS = 2500
PROTOCOL_EVAL_FRAMES = 100
N_CANDIDATES = 540  # largest hemisphere view space (PRV_simulation/Hemisphere)


def main():
    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.core.transforms import scaled_camera
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.render import render_views
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk
    from nerf_prv_tpu.pipeline import score_candidates_rgb_density

    cfg = NerfConfig()  # voxel field production defaults
    camera = CameraConfig()
    rng = np.random.default_rng(0)

    n_frames = 16
    h, w = camera.height, camera.width
    pixels = rng.integers(0, 255, (n_frames, h, w, 4), dtype=np.uint8)

    def views_of(n):
        v = rng.normal(size=(n, 3))
        v[:, 2] = np.abs(v[:, 2])
        v /= np.linalg.norm(v, axis=1, keepdims=True)
        c2w = camera_to_world(v * 0.3, np.zeros(3) + 1e-4)
        scale, offset = 0.5 / 0.1, np.array([0.5, 0.5, 0.5])
        rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
        org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * scale + offset, jnp.float32)
        return rot, org

    rot_j, org_j = views_of(n_frames)

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt_state = make_optimizer(cfg).init(params)
    pixels_j = jnp.asarray(pixels)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # ---- training rate ---------------------------------------------------
    # the production trainer runs two phases (train.py): train_warmup_steps
    # of flat marching while geometry forms, then probe-tightened steps;
    # measure each phase's steady-state rate and combine per the protocol
    import dataclasses

    steps_meas = 500
    warm_cfg = (
        dataclasses.replace(cfg, train_coarse=0, n_samples=cfg.train_warmup_samples)
        if cfg.train_coarse > 0 and cfg.train_warmup_steps > 0
        else cfg
    )

    def measure_chunk(phase_cfg, key_seed):
        nonlocal params, opt_state
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(key_seed), pixels_j, rot_j,
            org_j, camera, phase_cfg, steps_meas
        )
        sync(losses)  # warm: pays compile for this exact scan length
        t0 = time.perf_counter()
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(key_seed + 1), pixels_j,
            rot_j, org_j, camera, phase_cfg, steps_meas
        )
        sync(losses)
        return time.perf_counter() - t0

    t_warm = measure_chunk(warm_cfg, 1)
    t_tight = measure_chunk(cfg, 3) if warm_cfg is not cfg else t_warm
    n_warm = min(cfg.train_warmup_steps, PROTOCOL_TRAIN_STEPS) if warm_cfg is not cfg else 0
    t_train = (
        n_warm * t_warm + (PROTOCOL_TRAIN_STEPS - n_warm) * t_tight
    ) / steps_meas
    train_rate = PROTOCOL_TRAIN_STEPS * cfg.train_rays / t_train  # rays/s

    # ---- render rate (batched frames, one ray stream) ---------------------
    n_render = 8
    imgs = render_views(params, org_j[:n_render], rot_j[:n_render], camera, cfg)
    sync(imgs[..., 3])  # warm
    t0 = time.perf_counter()
    imgs = render_views(params, org_j[:n_render], rot_j[:n_render], camera, cfg)
    sync(imgs[..., 3])
    t_render = time.perf_counter() - t0
    render_rate = n_render * h * w / t_render  # rays/s

    # ---- candidate-view scoring (<1 s/object target) ----------------------
    cam_lo = scaled_camera(camera, 16.0)
    rot_c, org_c = views_of(N_CANDIDATES)

    def score_once():
        imgs = render_views(params, org_c, rot_c, cam_lo, cfg)
        u8 = jnp.clip(imgs * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        return sync(score_candidates_rgb_density(u8[:, None]))

    score_once()  # warm
    t0 = time.perf_counter()
    score_once()
    t_score = time.perf_counter() - t0

    # ---- combined protocol throughput --------------------------------------
    train_rays = PROTOCOL_TRAIN_STEPS * cfg.train_rays
    render_rays = PROTOCOL_EVAL_FRAMES * h * w
    protocol_time = train_rays / train_rate + render_rays / render_rate
    value = (train_rays + render_rays) / protocol_time

    out = {
        "metric": "nerf_rays_per_sec",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_SEC, 4),
        "detail": {
            "train_rays_per_sec": round(train_rate, 1),
            "render_rays_per_sec": round(render_rate, 1),
            "train_steps_per_sec": round(PROTOCOL_TRAIN_STEPS / t_train, 2),
            "train_warmup_ms_per_step": round(t_warm / steps_meas * 1e3, 3),
            "train_tight_ms_per_step": round(t_tight / steps_meas * 1e3, 3),
            "protocol_seconds_per_object": round(protocol_time, 2),
            "candidate_scoring_540_views_s": round(t_score, 3),
            "field": cfg.field_impl,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
