#!/usr/bin/env python3
"""Mode-7 statistics comparison on the chip with the LEARNED predictor.

≙ ``TestObjects`` (main.cpp:2886-3465): for each test object, PSNR/SSIM
at the ground-truth budget, at the statistics baselines {32 mode,
34 median, 35 mean} (main.cpp:3001-3005), and at the PRVNet-predicted
budget, plus the TSP path cost per budget.  Runs on three objects (one
per family) from the chip-generated PRV dataset with the trained
checkpoint from exp_prvnet_real.py; writes pvb_statistic_compare.txt and
experiments/artifacts/mode7_compare.json.

  nohup python -u experiments/exp_mode7.py > /tmp/exp_m7.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ROOT = "/tmp/prvnet_ws"
NAMES = ["blob1", "torus1", "box0"]


def main():
    from nerf_prv_tpu.core.config import CameraConfig, Config
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.pipeline.coverage import get_coverage
    from nerf_prv_tpu.prvnet.infer import BudgetPredictor
    from nerf_prv_tpu.scene.object_setup import load_object

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    cfg = Config(
        workspace=os.path.join(ROOT, "ws"),
        model_path=os.path.join(ROOT, "models"),
        viewspace_path=os.path.join(ROOT, "ws", "viewspace"),
        name_of_pcd=NAMES[0],
        n_steps=1200,
        camera=cam,
    )
    ds = os.path.join(cfg.workspace, "pvb_dataset")
    labels = {}
    for n in NAMES:
        labels[n] = int(np.loadtxt(os.path.join(ds, n, "view_budget.txt")))
    print("gt labels:", labels, flush=True)

    ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts", "prvnet_ckpt", "best_checkpoint.msgpack",
    )
    predictor = BudgetPredictor(
        checkpoint_path=ckpt, arch="convnextv2_atto", pattern=[0, 1, 3], crop=180
    )

    # stage 1: the 5-view init space + predictions decide which view-space
    # sizes must exist (each size compiles its own Riesz-descent program,
    # so generate only what the comparison needs)
    modes.mode_view_cover(cfg, sizes=[5])
    preds = {}
    for n in NAMES:
        obj_cfg = cfg.replace(name_of_pcd=n)
        scene = load_object(obj_cfg, n)
        assert scene.ok, n
        get_coverage(scene, obj_cfg, 5)
        preds[n] = predictor.predict_from_coverage(
            os.path.join(obj_cfg.gt_path, "5"), [0, 1, 3]
        )
    print("prv predictions:", preds, flush=True)

    sizes = sorted(
        {32, 34, 35} | set(labels.values()) | set(preds.values())
    )
    modes.mode_view_cover(cfg, sizes=sizes)

    t0 = time.perf_counter()
    rows = modes.mode_test_objects(
        cfg, NAMES, labels, predictor=predictor,
        nerf_cfg=NerfConfig(n_steps=cfg.n_steps),
    )
    el = time.perf_counter() - t0
    print(f"mode7 comparison {len(NAMES)} objects x 5 budgets: {el:.1f}s", flush=True)

    artifact = {"objects": rows, "seconds": round(el, 1), "gt_labels": labels,
                "prv_predictions": {k: int(v) for k, v in preds.items()}}
    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "artifacts", "mode7_compare.json"
    )
    with open(out, "w") as f:
        json.dump(artifact, f, indent=1, default=float)
    for name, entry in rows.items():
        for key, m in entry.items():
            print(f"  {name:7s} {key:5s} budget {m['budget']:3d} "
                  f"PSNR {m['PSNR']:6.2f} path {m['path_len']:6.3f}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
