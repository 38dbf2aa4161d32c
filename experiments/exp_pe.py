#!/usr/bin/env python3
"""PE-frequency / fine-sample-count / chunk-size sweep with the aux probe.

PE sin/cos transcendentals are a measurable slice of the march (VPU-bound);
how few frequencies keep quality?

  nohup python -u experiments/exp_pe.py > /tmp/exp_pe.log 2>&1 &
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
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf
    from nerf_prv_tpu.nerf.render import render_views
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

    camera = CameraConfig()
    rng = np.random.default_rng(0)
    v = rng.normal(size=(8, 3)); v[:, 2] = np.abs(v[:, 2])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    c2w = camera_to_world(v * 0.3, np.zeros(3) + 1e-4)
    rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    for pe in (4, 2):
        base = NerfConfig(voxel_pe_freqs=pe)
        t0 = time.perf_counter()
        params, _ = train_nerf(train_js, base)
        t_train = time.perf_counter() - t0
        for ns, chunk in ((32, 1 << 17), (24, 1 << 17), (24, 1 << 18)):
            cfg = dataclasses.replace(base, render_n_samples=ns)
            m = eval_nerf(params, test_js, cfg)
            sync(render_views(params, org, rot, camera, cfg, chunk=chunk)[..., 3])
            t0 = time.perf_counter()
            sync(render_views(params, org, rot, camera, cfg, chunk=chunk)[..., 3])
            el = time.perf_counter() - t0
            n = 8 * camera.height * camera.width
            print(
                f"pe{pe} r{ns} c{chunk>>10}k train {t_train:5.1f}s "
                f"PSNR {m['PSNR']:6.2f} SSIM {m['SSIM']:.4f} "
                f"render {el*1e3:6.0f} ms {n/el/1e6:5.2f} M rays/s",
                flush=True,
            )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
