#!/usr/bin/env python3
"""Production-resolution end-to-end label calibration on TPU.

Runs the reference's dataset-generation pipeline (modes 3 -> 4 -> fit ->
5) on three synthetic objects at the production camera (1280x720,
RealSense intrinsics) with the flagship NeRF config, producing
PSNR-vs-views curves and lognormal view-budget labels.

python -u experiments/exp_calibration_run.py > /tmp/exp_calib.log
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

WS = "/tmp/calib_ws"


def make_objects():
    """Three distinct synthetic objects as ShapeNet-layout PLYs."""
    from nerf_prv_tpu.scene import save_ply_binary

    rng = np.random.default_rng(7)
    objs = {}

    # blob (ball-ish shell)
    pts = rng.normal(size=(80000, 3))
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    pts *= 0.05 * rng.uniform(0.7, 1.0, (80000, 1))
    cols = np.clip((pts / 0.05 * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    objs["calblob0"] = (pts, cols)

    # torus
    u = rng.uniform(0, 2 * np.pi, 80000)
    v = rng.uniform(0, 2 * np.pi, 80000)
    R, r = 0.035, 0.015
    pts = np.stack(
        [(R + r * np.cos(v)) * np.cos(u), (R + r * np.cos(v)) * np.sin(u), r * np.sin(v)],
        axis=1,
    )
    cols = np.clip(
        np.stack([np.cos(u), np.sin(v), np.cos(v)], axis=1) * 127 + 128, 0, 255
    ).astype(np.uint8)
    objs["caltorus0"] = (pts, cols)

    # box frame (edges of a cube, thin structures)
    edges = []
    for axis in range(3):
        for s1 in (-1, 1):
            for s2 in (-1, 1):
                t = rng.uniform(-1, 1, 7000)
                e = np.zeros((7000, 3))
                e[:, axis] = t
                e[:, (axis + 1) % 3] = s1
                e[:, (axis + 2) % 3] = s2
                edges.append(e)
    pts = np.concatenate(edges) * 0.04
    pts += rng.normal(scale=0.0012, size=pts.shape)
    cols = np.clip((pts / 0.04 * 0.5 + 0.5) * 255, 0, 255).astype(np.uint8)
    objs["calbox0"] = (pts, cols)

    names = []
    for name, (pts, cols) in objs.items():
        p = os.path.join(WS, "models", "ShapeNet", f"{name}.ply")
        if not os.path.exists(p):
            save_ply_binary(p, pts, cols)
        names.append(name)
    return names


def main():
    from nerf_prv_tpu.core.config import Config
    from nerf_prv_tpu.nerf.model import NerfConfig
    from nerf_prv_tpu.pipeline import modes

    names = make_objects()
    cfg = Config(
        workspace=os.path.join(WS, "ws"),
        model_path=os.path.join(WS, "models"),
        viewspace_path=os.path.join(WS, "ws", "viewspace"),
        num_of_views=64,
    )
    nerf_cfg = NerfConfig()  # flagship: G40 flat 96 train, 24+48 render

    t0 = time.time()
    for name in names:
        t1 = time.time()
        modes.mode_get_coverage(cfg, [name])
        print(f"{name}: coverage done in {time.time()-t1:.1f}s", flush=True)
        t1 = time.time()
        modes.mode_instant_ngp(cfg, [name], nerf_cfg)
        print(f"{name}: NeRF sweep done in {time.time()-t1:.1f}s", flush=True)
        # print the curve
        obj_cfg = cfg.replace(name_of_pcd=name)
        for n in modes._coverage_counts(obj_cfg):
            f = os.path.join(obj_cfg.gt_path, f"{n}.txt")
            if os.path.exists(f):
                vals = dict(
                    line.split("\t") for line in open(f).read().strip().splitlines()
                )
                print(f"  v={n:3d} PSNR {float(vals['PSNR']):6.2f} "
                      f"SSIM {float(vals['SSIM']):.4f}", flush=True)
    modes.mode_fit_labels(cfg, names)
    for name in names:
        obj_cfg = cfg.replace(name_of_pcd=name)
        lp = os.path.join(obj_cfg.gt_path, "label.txt")
        print(f"{name} label.txt:", flush=True)
        print(open(lp).read(), flush=True)
    stats = modes.mode_read_label(cfg, names)
    print("label stats:", stats, flush=True)
    print(f"TOTAL {time.time()-t0:.1f}s", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
