#!/usr/bin/env python3
"""Span-bucketed fine march: speed + quality measurement.

The three-phase tile render marches every level-2 survivor with a uniform
render_n_samples=24.  Tightened spans vary widely (saturation clamping
collapses solid-interior rays to a thin crust), so short-span rays waste
rows: their sample spacing is far finer than the march's worst-case
spacing.  render_span_bucket partitions survivors short-first and marches
whole chunks of short rays at render_short_samples — the static-shape
recovery of CUDA marching's per-ray variable step counts.

Measures, on the bench scene after 2000 production train steps:
  - the span distribution of level-2 survivors (what fraction is "short")
  - full 8-frame render time + test-view PSNR for: uniform 24 (baseline),
    bucket 12/24, bucket 16/24

  nohup python -u experiments/exp_span_bucket.py > /tmp/exp_span.log 2>&1 &
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
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )
    rot_j = jnp.asarray(ds.rotations, jnp.float32)
    org_j = jnp.asarray(ds.origins, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt_state = make_optimizer(cfg).init(params)
    warm = dataclasses.replace(cfg, train_coarse=0, n_samples=cfg.train_warmup_samples)
    params, opt_state, l0 = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j, org_j,
        camera, warm, cfg.train_warmup_steps)
    params, opt_state, l1 = train_chunk(
        params, opt_state, jax.random.PRNGKey(2), pixels_j, rot_j, org_j,
        camera, cfg, 2000)
    print(f"trained: warm loss {sync(l0[-10:])/10:.4f} tight {sync(l1[-10:])/10:.4f}",
          flush=True)
    aux = build_render_aux(params, cfg)

    # ---- span distribution of level-2 survivors ---------------------------
    # reproduce phases A1/A2 on the 8-frame stream via the public path once
    # with a tiny probe hook: simplest is to recompute what the march sees
    # by calling the probe levels directly on a subsample of rays
    from nerf_prv_tpu.nerf.rays import pixel_dirs_cam, ray_sphere
    from nerf_prv_tpu.nerf.render import _probe_level1, _probe_level2

    h, w = camera.height, camera.width
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32))
    d_cam = pixel_dirs_cam(camera, u.reshape(-1), v.reshape(-1))
    f = 0
    d_g = jnp.einsum("ij,nj->ni", rot_j[f], d_cam)[::8]  # subsample: stats only
    d_g = d_g / jnp.linalg.norm(d_g, axis=-1, keepdims=True)
    o_g = jnp.broadcast_to(org_j[f], d_g.shape)

    @jax.jit
    def probe_spans(o_g, d_g):
        tmin, tmax, valid = ray_sphere(o_g, d_g)
        t1lo, t1hi, any1 = _probe_level1(aux, o_g, d_g, tmin, tmax, valid, cfg)
        tlo, thi, any2 = _probe_level2(aux, o_g, d_g, t1lo, t1hi, cfg)
        return tlo, thi, any1 & any2 & valid

    tlo, thi, occ_j = probe_spans(o_g, d_g)
    occ = np.asarray(occ_j)
    spans = np.asarray(thi - tlo)[occ]
    smax = spans.max()
    print(f"frame-0 survivors {occ.sum()} / {occ.size}  span max {smax:.4f} "
          f"mean {spans.mean():.4f} p50 {np.percentile(spans, 50):.4f}", flush=True)
    for ns_s in (8, 12, 16):
        frac = (spans <= smax * ns_s / 24.0).mean()
        rows_rel = frac * ns_s / 24.0 + (1 - frac)
        print(f"  short@{ns_s}/24: {frac:.1%} of survivors -> fine rows x{rows_rel:.3f}",
              flush=True)

    # ---- timed renders + PSNR --------------------------------------------
    n_render = 8

    def measure(tag, c):
        # warm TWICE: the first call runs the exact path and seeds the
        # speculative-count cache; the second compiles any slack-rounded
        # speculative shapes.  The timed call then runs the sync-free
        # steady state with a warm compile cache.
        for _ in range(2):
            imgs = render_views(params, org_j[:n_render], rot_j[:n_render],
                                camera, c, aux=aux)
            sync(imgs[..., 3])
        t0 = time.perf_counter()
        imgs = render_views(params, org_j[:n_render], rot_j[:n_render],
                            camera, c, aux=aux)
        sync(imgs[..., 3])
        dt = time.perf_counter() - t0
        m = eval_nerf(params, test_js, c)
        print(f"{tag:16s} render {dt*1e3:7.1f} ms "
              f"({n_render*h*w/dt/1e6:5.2f} M rays/s)  "
              f"PSNR {m['PSNR']:.3f}  SSIM {m['SSIM']:.4f}", flush=True)

    measure("uniform-24", cfg)
    measure("bucket-12/24", dataclasses.replace(
        cfg, render_span_bucket=True, render_short_samples=12))
    measure("bucket-16/24", dataclasses.replace(
        cfg, render_span_bucket=True, render_short_samples=16))
    measure("bucket-8/24", dataclasses.replace(
        cfg, render_span_bucket=True, render_short_samples=8))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
