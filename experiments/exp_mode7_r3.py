#!/usr/bin/env python3
"""Mode-7 statistics comparison at >=10 HELD-OUT objects, round-3 scale.

VERDICT r2 item 2: round 2's comparison covered 3 objects with a
constant-30 predictor and hard-coded 32/34/35 baselines.  This reruns
``TestObjects`` (≙ main.cpp:2886-3465) on the round-3 dataset's val split
(>=15 objects never seen in training):

- baselines mode/median/mean derived from the VAL label distribution
  (stat_budgets_from_labels, ≙ how the reference's 32/34/35 constants were
  obtained from its own val labels, main.cpp:3001-3005),
- PRV budgets from the round-3 checkpoint (exp_dataset100 phase C), fed
  the SAME images the training saw: rgbaClip_0..4 of the object's 64-view
  coverage set (IMG_PATTERN[4], ≙ train_regression.py:497-500),
- per-object PSNR/SSIM + TSP path cost at every budget, and the
  mean±std table pvb_statistic_compare.txt (≙ main.cpp:3301-3464).

Evaluations are cached per (object, budget) through compare_<b>.txt, so
budgets shared between methods are trained once.  Runs after
exp_dataset100.py in the same workspace:

  nohup python -u experiments/exp_mode7_r3.py > /tmp/mode7_r3.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from exp_label_spread import pipeline_config

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
PATTERN = [0, 1, 2, 3, 4]  # IMG_PATTERN[4], matches the r3 training
CROP = 180


def main():
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.pipeline.compare import stat_budgets_from_labels
    from nerf_prv_tpu.prvnet.infer import BudgetPredictor

    cfg = pipeline_config()
    ds_root = os.path.join(cfg.workspace, "pvb_dataset")
    with open(os.path.join(ds_root, "val_split.txt")) as f:
        names = [ln.strip() for ln in f if ln.strip()]
    if len(names) > 15:
        # VERDICT r2 item 2 asks >=10 held-out objects; cap the chip time at
        # 15, spread across families (val_split is family-sorted, so stride)
        idx = np.linspace(0, len(names) - 1, 15).round().astype(int)
        names = [names[i] for i in sorted(set(idx.tolist()))]
    labels = {
        n: int(np.loadtxt(os.path.join(ds_root, n, "view_budget.txt")))
        for n in names
    }
    stat_budgets = stat_budgets_from_labels(labels)
    print(f"{len(names)} val objects, gt labels {sorted(labels.values())}",
          flush=True)
    print("val-derived baselines:", stat_budgets, flush=True)

    ckpt = os.path.join(ART, "prvnet_r3_ckpt", "best_checkpoint.msgpack")
    predictor = BudgetPredictor(
        checkpoint_path=ckpt, arch="convnextv2_atto", pattern=PATTERN,
        crop=CROP,
    )
    preds = {
        n: predictor.predict_from_coverage(os.path.join(ds_root, n), PATTERN)
        for n in names
    }
    print("prv predictions:", preds, flush=True)

    # every view-space size the comparison will train at must exist
    sizes = sorted(set(stat_budgets.values()) | set(labels.values())
                   | {int(p) for p in preds.values()})
    modes.mode_view_cover(cfg, sizes=sizes)

    t0 = time.perf_counter()
    rows = modes.mode_test_objects(
        cfg, names, labels, predictor=predictor,
        nerf_cfg=NerfConfig(n_steps=cfg.n_steps),
        stat_budgets=stat_budgets,
        predictions={k: int(v) for k, v in preds.items()},
    )
    el = time.perf_counter() - t0

    # headline: PRV vs each baseline, mean PSNR delta + mean path saving
    summary = {}
    for base in ("mode", "median", "mean", "gt"):
        d_psnr = [e["prv"]["PSNR"] - e[base]["PSNR"] for e in rows.values()]
        d_path = [e["prv"]["path_len"] - e[base]["path_len"] for e in rows.values()]
        summary[base] = {
            "psnr_delta_mean": round(float(np.mean(d_psnr)), 3),
            "path_delta_mean": round(float(np.mean(d_path)), 4),
        }
    pvals = np.array([float(p) for p in preds.values()])
    artifact = {
        "n_objects": len(names),
        "seconds": round(el, 1),
        "stat_budgets": stat_budgets,
        "gt_labels": labels,
        "prv_predictions": {k: int(v) for k, v in preds.items()},
        "prv_pred_std": round(float(pvals.std()), 3),
        "prv_pred_min_max": [int(pvals.min()), int(pvals.max())],
        "prv_vs": summary,
        "objects": rows,
    }
    with open(os.path.join(ART, "mode7_r3.json"), "w") as f:
        json.dump(artifact, f, indent=1, default=float)
    for name, entry in rows.items():
        for key, m in entry.items():
            print(f"  {name:7s} {key:6s} budget {m['budget']:3d} "
                  f"PSNR {m['PSNR']:6.2f} path {m['path_len']:6.3f}",
                  flush=True)
    print(json.dumps(summary), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
