#!/usr/bin/env python3
"""[ARCHIVED — REJECTED 2026-08-17] Row-shared marching (share=2).

MEASURED RESULTS (v5e, the run this script produced):
  splat  t-base  r-base 35.38 | r-share 35.09 | r-share+probe-share 34.53 dB
  splat  t-share r-base 35.34 | r-share 35.15 | r-share+probe-share 34.75 dB
  thin   t-base 35.37 vs t-share+r-share+ps combo 34.38 dB
  speed  tight step 4.71 (base) vs 4.79 ms (t-share);
         render chunk 62.4 (base) vs 94.9 (r-share) vs 127.9 ms (+ps)
VERDICT: slower AND worse.  Halving gather rows does not pay because the
pair-axis broadcast/reshape relayouts cost equivalent HBM traffic, and
extrapolating untied corner blocks across cell boundaries loses quality.
The share knobs/paths were removed from the package after this run; the
script is preserved as the measurement record and will not re-run as-is.

Original description: quality + speed for render/train/probe share=2.

The march's dominant cost is grid-row gathers (~250M rows/s width-free,
exp_vmem_gather.py; fine blend ~15ms + probe-2 ~10.8ms of a 37.8ms/131k-ray
render chunk, exp_breakdown2.py; ~0.8ms fwd gather + 1.9ms backward scatter
of a 4.6ms train step).  blend_shared gathers ONE row per pair of
consecutive samples and trilinearly extrapolates within the pair (anchor at
the pair midpoint, error <= half a sample spacing) — halving fine-march
gathers, probe-2 gathers, and the backward scatter rows.

Phase A: quality on the 320x180 splat scene (2500-step trains):
  trains:  base | train_share=2
  renders: base | render_share=2 | render+probe share=2
Phase B: quality on the thin-geometry scene (1-2 cell rods/disk) for the
  full combo vs base.
Phase C: speed at production res: tight-step time for both train cfgs,
  render chunk time for the render cfgs.

  nohup python -u experiments/exp_share_march.py > /tmp/exp_share.log 2>&1 &
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
    train_js = os.path.join(scene_dir, "train.json")
    test_js = os.path.join(scene_dir, "test.json")

    base = NerfConfig()
    tshare = dataclasses.replace(base, train_share=2)
    renders = {
        "r-base": {},
        "r-share": {"render_share": 2},
        "r-share+ps": {"render_share": 2, "probe_share": 2},
    }

    # ---- Phase A: splat quality ------------------------------------------
    for tname, tcfg in (("t-base", base), ("t-share", tshare)):
        t0 = time.perf_counter()
        params, _ = train_nerf(train_js, tcfg)
        t_train = time.perf_counter() - t0
        for rname, over in renders.items():
            ecfg = dataclasses.replace(tcfg, **over)
            m = eval_nerf(params, test_js, ecfg)
            print(f"splat {tname:8s} {rname:11s} train {t_train:5.1f}s "
                  f"PSNR {m['PSNR']:6.2f} SSIM {m['SSIM']:.4f}", flush=True)

    # ---- Phase B: thin geometry ------------------------------------------
    from exp_thin_geometry import make_thin_object
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.core.transforms import add_frame, make_root, write_transforms
    from nerf_prv_tpu.scene import render_pointcloud, rgba_from_render
    from nerf_prv_tpu.viewspace import generate_hemisphere
    from PIL import Image

    thin_dir = "/tmp/exp_share_thin"
    if not os.path.exists(os.path.join(thin_dir, "train.json")):
        pts, cols = make_thin_object(seed=1)
        center = pts.mean(axis=0)
        predicted_size = float(np.linalg.norm(pts - center, axis=1).max() * 17 / 16)
        for name, views in (
            ("train", generate_hemisphere(24, seed=1, restarts=2, steps=200)),
            ("test", generate_hemisphere(11, seed=2, restarts=2, steps=200)[3:]),
        ):
            root = make_root(cam, 1, predicted_size, center)
            sub = os.path.join(thin_dir, name)
            os.makedirs(sub, exist_ok=True)
            for i, v in enumerate(views):
                pos = v / np.linalg.norm(v) * 0.3 + center
                c2w = camera_to_world(pos[None], center)[0]
                rgb, alpha = render_pointcloud(pts, cols, c2w, cam, point_size=2)
                rgba = rgba_from_render(rgb, alpha)
                p = os.path.join(sub, f"rgbaClip_{i}.png")
                Image.fromarray(rgba).save(p)
                add_frame(root, p, c2w)
            write_transforms(os.path.join(thin_dir, f"{name}.json"), root)
    for tname, tcfg, rover in (
        ("t-base", base, {}),
        ("t-share", tshare, {"render_share": 2, "probe_share": 2}),
    ):
        params, _ = train_nerf(os.path.join(thin_dir, "train.json"), tcfg)
        ecfg = dataclasses.replace(tcfg, **rover)
        m = eval_nerf(params, os.path.join(thin_dir, "test.json"), ecfg)
        print(f"thin  {tname:8s} combo       PSNR {m['PSNR']:6.2f} "
              f"SSIM {m['SSIM']:.4f}", flush=True)

    # ---- Phase C: speed at production res --------------------------------
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
    for tname, tcfg in (("t-base", base), ("t-share", tshare)):
        params = init_params(jax.random.PRNGKey(0), tcfg)
        opt_state = make_optimizer(tcfg).init(params)
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(1), pixels, rot, org,
            prod_cam, tcfg, steps)
        sync(losses)
        t0 = time.perf_counter()
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(2), pixels, rot, org,
            prod_cam, tcfg, steps)
        sync(losses)
        dt = time.perf_counter() - t0
        print(f"speed {tname:8s} tight step {dt/steps*1e3:6.2f} ms "
              f"({steps*tcfg.train_rays/dt/1e6:5.2f} M rays/s)", flush=True)

    # render chunk timing: trained-ish params so density exists
    from nerf_prv_tpu.nerf.render import _jit_render, build_render_aux

    n_chunk = 1 << 17
    o = jnp.concatenate(
        [jax.random.uniform(jax.random.PRNGKey(3), (n_chunk, 2)),
         jnp.full((n_chunk, 1), -0.5)], axis=-1)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, 1.0]]), (n_chunk, 1))
    for rname, over in renders.items():
        ecfg = dataclasses.replace(base, **over)
        aux = build_render_aux(params, ecfg)
        rgbs, als = _jit_render(params, o, d, ecfg, aux)
        sync(als)
        t0 = time.perf_counter()
        for _ in range(5):
            rgbs, als = _jit_render(params, o, d, ecfg, aux)
            sync(als)
        dt = (time.perf_counter() - t0) / 5
        print(f"speed {rname:11s} chunk {dt*1e3:6.2f} ms "
              f"({n_chunk/dt/1e6:6.2f} M rays/s marched)", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
