#!/usr/bin/env python3
"""Mode-7 statistics comparison at reference scale with the LIVE infer path.

VERDICT r3 next-step #5 / missing #1: the reference's flagship comparison
runs on a 250-object, val-distribution-matched test set
(main.cpp:2935,2954-2984) with budgets from the live PRVNet handshake
(main.cpp:3136-3205); round 3 demonstrated 15 objects with pinned
predictions.  This run:

- test set: the frozen roster from exp_dataset300 phase B —
  match_distribution over the NEW labeled objects against the FIXED r3 val
  split (no train/val leakage; ≙ main.cpp:2904-2984),
- statistics baselines mode/median/mean derived from the val labels
  (≙ how the reference's 32/34/35 were obtained, main.cpp:3001-3005),
- PRV budgets from the LIVE predictor (tiny@720 reference config), reading
  the hd (1280x720) 5-view init images pattern [0,1,3] through
  predict_from_coverage — the in-process equivalent of the infer_server
  handshake (≙ infer_server.py:47,80-88),
- per-object PSNR/SSIM at every budget + TSP path length, written to the
  pvb_statistic_compare.txt mean±std table (≙ main.cpp:3301-3464).

Incremental: compare_<budget>.txt resume guards make re-runs cheap; the
artifact flushes after every object.

  nohup python -u experiments/exp_mode7_r4.py > /tmp/mode7_r4.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from exp_label_spread import pipeline_config

ART = os.environ.get(
    "PRV4_ART",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts"))
CKPT = os.environ.get(
    "PRV4_CKPT",
    os.path.join(ART, "prvnet_tiny720_ckpt", "best_checkpoint.msgpack"))
ARCH = os.environ.get("PRV4_ARCH", "convnextv2_tiny")
CROP = int(os.environ.get("PRV4_CROP", 720))
DEADLINE_MIN = float(os.environ.get("PRV4_MODE7_DEADLINE_MIN", 110))


class HDPredictor:
    """Redirects predict_from_coverage to the object's hd (1280x720) 5-view
    set when present, so the tiny@720 predictor sees the image geometry it
    was trained on; falls back to the qcam directory otherwise."""

    def __init__(self, inner):
        self.inner = inner

    def predict_from_coverage(self, coverage_dir, view_ids):
        hd_dir = os.path.join(
            os.path.dirname(coverage_dir), "hd",
            os.path.basename(coverage_dir))
        if os.path.isdir(hd_dir):
            coverage_dir = hd_dir
        return self.inner.predict_from_coverage(coverage_dir, view_ids)


def main():
    from predictor_gate import predictor_gate

    predictor_gate()  # no rows with a degenerate predictor
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.pipeline.compare import (
        compare_objects, stat_budgets_from_labels, write_comparison_table,
    )
    from nerf_prv_tpu.prvnet.infer import BudgetPredictor

    with open(os.path.join(ART, "dataset300_stats.json")) as f:
        ds = json.load(f)
    with open(os.path.join(ART, "dataset100_labels.json")) as f:
        legacy = json.load(f)["objects"]
    with open(os.path.join(ART, "dataset300_labels.json")) as f:
        new = json.load(f)["objects"]
    labels = {n: o["label"] for n, o in {**legacy, **new}.items()}
    val_labels = {n: labels[n] for n in ds["val"]}
    test = ds["test"]
    stat_budgets = stat_budgets_from_labels(val_labels)

    cfg = pipeline_config()
    nerf_cfg = NerfConfig(n_steps=cfg.n_steps)
    predictor = BudgetPredictor(CKPT, arch=ARCH, crop=CROP)
    if CROP >= 720:  # 180-crop predictors trained on qcam images
        predictor = HDPredictor(predictor)

    art_path = os.path.join(ART, "mode7_r4.json")
    rows = {}
    if os.path.exists(art_path):
        with open(art_path) as f:
            rows = json.load(f).get("rows", {})

    t0 = time.perf_counter()
    for i, name in enumerate(test):
        if name in rows:
            continue
        if (time.perf_counter() - t0) / 60.0 > DEADLINE_MIN:
            print(f"[mode7] deadline after {len(rows)} objects", flush=True)
            break
        t1 = time.perf_counter()
        r = compare_objects(
            cfg, [name], labels, predictor=predictor, nerf_cfg=nerf_cfg,
            stat_budgets=stat_budgets,
            out_file=os.path.join(cfg.workspace, "pvb_statistic_compare.txt"),
        )
        rows.update(r)
        dt = time.perf_counter() - t1
        e = r.get(name, {})
        print(f"[{i+1}/{len(test)}] {name}: gt={e.get('gt', {}).get('budget')} "
              f"prv={e.get('prv', {}).get('budget')} ({dt:.0f}s)", flush=True)
        _flush(art_path, rows, stat_budgets, val_labels, len(test))

    _flush(art_path, rows, stat_budgets, val_labels, len(test))
    # final mean±std table over ALL completed rows
    write_comparison_table(
        os.path.join(cfg.workspace, "pvb_statistic_compare.txt"), rows)
    print("DONE", flush=True)


def _flush(art_path, rows, stat_budgets, val_labels, n_roster):
    summary = {}
    methods = sorted({k for e in rows.values() for k in e})
    for m in methods:
        recs = [e[m] for e in rows.values() if m in e]
        for k in ("budget", "PSNR", "SSIM", "path_len"):
            v = np.array([r[k] for r in recs], dtype=np.float64)
            summary.setdefault(m, {})[k] = {
                "mean": round(float(v.mean()), 4),
                "std": round(float(v.std(ddof=1)) if len(v) > 1 else 0.0, 4),
            }
    # the paper's core claim, quantified: PRV vs each statistics baseline
    deltas = {}
    if "prv" in methods:
        for m in ("mode", "median", "mean", "gt"):
            if m not in methods:
                continue
            dp = [e["prv"]["PSNR"] - e[m]["PSNR"] for e in rows.values()
                  if "prv" in e and m in e]
            dl = [e["prv"]["path_len"] - e[m]["path_len"] for e in rows.values()
                  if "prv" in e and m in e]
            deltas[f"prv_vs_{m}"] = {
                "dPSNR_mean": round(float(np.mean(dp)), 4),
                "dPSNR_sem": round(float(np.std(dp, ddof=1) / np.sqrt(len(dp)))
                                   if len(dp) > 1 else 0.0, 4),
                "dpath_mean": round(float(np.mean(dl)), 4),
                "dpath_sem": round(float(np.std(dl, ddof=1) / np.sqrt(len(dl)))
                                   if len(dl) > 1 else 0.0, 4),
            }
    with open(art_path, "w") as f:
        json.dump({
            "n_done": len(rows),
            "n_roster": n_roster,
            "stat_budgets": stat_budgets,
            "val_n": len(val_labels),
            "summary": summary,
            "deltas": deltas,
            "rows": rows,
        }, f, indent=1)


if __name__ == "__main__":
    main()
