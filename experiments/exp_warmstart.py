#!/usr/bin/env python3
"""Warm-started label sweep: does mode 4 need 2,500 from-scratch steps
per view count?

The production dataset generation trains ~3,000 objects x ~25 view
counts (mode 4, ≙ main.cpp:2463-2489) — 75k NeRF fits, each from
scratch in the reference (its file-IPC instant-ngp server has no state
to carry).  In-process we can warm-start count v from count v-2's
trained field: the marginal information is two views, so far fewer
steps should reach the same PSNR.  The question is CALIBRATION — the
lognormal fit and the gradient@0.02 label (main.cpp:2641-2642) must
come out the same, else every downstream PRVNet label shifts.

Arms (same object, same coverage images, full 3..49-step-2 + 100 sweep
via the real mode_instant_ngp):
  scratch          — reference parity (n_steps=2500 each)
  warm800/warm400  — first count from scratch, then 800/400 steps each

Reports per arm: wall time, PSNR at probe counts, fitted curve deltas,
gap/gradient labels, and the headline gradient@0.02 label.

  nohup python -u experiments/exp_warmstart.py > /tmp/exp_warmstart.log 2>&1 &
"""
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import numpy as np


def main():
    from nerf_prv_tpu.core.config import Config
    from nerf_prv_tpu.labeling.labels import fit_object_from_metrics
    from nerf_prv_tpu.nerf.api import load_metrics
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.scene import save_ply_binary
    from synthetic import make_object

    root = "/tmp/warmstart_ws"
    os.makedirs(root, exist_ok=True)
    pts, cols = make_object(30000, seed=3)
    ply = os.path.join(root, "models", "ShapeNet", "toy0.ply")
    if not os.path.exists(ply):
        save_ply_binary(ply, pts * 20, cols)
    cfg = Config(
        workspace=os.path.join(root, "ws"),
        model_path=os.path.join(root, "models"),
        viewspace_path=os.path.join(root, "ws", "viewspace"),
        name_of_pcd="toy0",
        n_steps=2500,
    )
    counts = list(range(3, 51, 2))
    t0 = time.perf_counter()
    modes.mode_view_cover(cfg, sizes=counts + [100])
    modes.mode_get_coverage(cfg, ["toy0"])
    print(f"viewspaces + coverage {time.perf_counter()-t0:.1f}s", flush=True)

    obj_cfg = cfg.replace(name_of_pcd="toy0")
    gt = obj_cfg.gt_path
    probe_counts = (3, 13, 25, 49, 100)

    results = {}
    for arm, warm in (("scratch", 0), ("warm800", 800), ("warm400", 400)):
        for v in counts + [100]:
            f = os.path.join(gt, f"{v}.txt")
            if os.path.exists(f):
                os.remove(f)
        t0 = time.perf_counter()
        modes.mode_instant_ngp(cfg, ["toy0"], warm_start_steps=warm)
        wall = time.perf_counter() - t0
        psnrs = {v: load_metrics(os.path.join(gt, f"{v}.txt"))["PSNR"]
                 for v in counts + [100]}
        fit = fit_object_from_metrics(gt)
        results[arm] = (wall, psnrs, fit)
        probe = "  ".join(f"P{v}={psnrs[v]:.2f}" for v in probe_counts)
        print(f"{arm:8s} {wall:7.1f}s  conv={fit.converged}  {probe}\n"
              f"         gap={fit.gap_labels.tolist()}\n"
              f"         grad={fit.gradient_labels.tolist()}", flush=True)

    base = results["scratch"]
    for arm in ("warm800", "warm400"):
        wall, psnrs, fit = results[arm]
        dpsnr = max(abs(psnrs[v] - base[1][v]) for v in counts + [100])
        dcurve = float(np.abs(fit.curve - base[2].curve).max())
        dlab = int(abs(fit.gradient_labels[1] - base[2].gradient_labels[1]))
        print(f"{arm}: speedup {base[0]/wall:.2f}x  max|dPSNR|={dpsnr:.2f}  "
              f"max|dcurve|={dcurve:.2f}  |d grad@0.02|={dlab}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
