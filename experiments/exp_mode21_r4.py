#!/usr/bin/env python3
"""Mode-21 five-method view-planning table on multiple held-out objects.

VERDICT r3 missing #3 / next-step #6: the reference's flagship experiment
runs every object through methods {4,0,1,2,3} (main.cpp:3834-4004) — PRV,
RandomIterative, RandomOneshot, EnsembleRGB (2 NeRFs/iter), and
EnsembleRGBDensity (5 NeRFs/iter) — recording per-method final PSNR/SSIM
and movement cost; round 3 demonstrated a single object with 3 methods.

This run: >=5 objects from the round-4 held-out test roster (one per
family where possible), all five methods, evaluate=True (final NeRF at the
PRV budget scored vs the 100-view set), the LIVE tiny@720 predictor for
method 4 (budgets of methods 0-3 replay PRV's view_budget.txt, ≙
main.cpp:1735-1749).  Reduced-protocol scale knobs, recorded in the
artifact: 64-view candidate space (vs 540), qcam 320x180, n_steps=1200 —
the same metrology the round-3/4 labels use, so PSNRs are in-family.

  nohup python -u experiments/exp_mode21_r4.py > /tmp/mode21_r4.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from exp_label_spread import pipeline_config
from exp_mode7_r4 import ARCH, CKPT, CROP, HDPredictor

ART = os.environ.get(
    "PRV4_ART",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts"))
N_OBJECTS = int(os.environ.get("PRV4_M21_OBJECTS", 5))
METHODS = (4, 0, 1, 2, 3)


def pick_objects(n):
    """One test-roster object per family, hardest-first families for
    method-diversity (occlusion-heavy objects differentiate NBV methods)."""
    with open(os.path.join(ART, "dataset300_stats.json")) as f:
        test = json.load(f)["test"]
    by_fam = {}
    for name in test:
        by_fam.setdefault(name[:3], []).append(name)
    order = ["clu", "cup", "pla", "spi", "van", "tor", "box", "ell",
             "nos", "fan", "blo", "uni"]
    picked = []
    for fam in order:
        if fam in by_fam and len(picked) < n:
            picked.append(sorted(by_fam[fam])[0])
    for name in test:  # top up if some families missing from the roster
        if len(picked) >= n:
            break
        if name not in picked:
            picked.append(name)
    return picked[:n]


def main():
    from predictor_gate import predictor_gate

    predictor_gate()  # no rows with a degenerate predictor
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.pipeline.nbv import METHOD_NAMES
    from nerf_prv_tpu.prvnet.infer import BudgetPredictor

    cfg0 = pipeline_config()
    cfg0 = cfg0.replace(num_of_views=64, num_of_max_iteration=60,
                        evaluate=True)
    nerf_cfg = NerfConfig(n_steps=cfg0.n_steps)
    predictor = BudgetPredictor(CKPT, arch=ARCH, crop=CROP)
    if CROP >= 720:  # 180-crop predictors trained on qcam images
        predictor = HDPredictor(predictor)
    objects = pick_objects(N_OBJECTS)
    print(f"objects: {objects}", flush=True)

    art_path = os.path.join(ART, "mode21_r4.json")
    out = {"objects": objects, "methods": list(METHODS),
           "protocol": {"candidate_space": 64, "camera": "320x180",
                        "n_steps": cfg0.n_steps,
                        "ensemble_num": {"2": 2, "3": cfg0.ensemble_num}},
           "rows": {}}
    if os.path.exists(art_path):
        with open(art_path) as f:
            out.update(json.load(f))

    for name in objects:
        for method in METHODS:
            key = f"{name}/m{method}"
            # resume guard requires a COMPLETE row: a transient failure
            # (load flake, killed run) leaves a metric-less row that must
            # retry, not become a permanent hole in the five-method table
            if key in out["rows"] and "PSNR" in out["rows"][key]:
                continue
            t0 = time.perf_counter()
            paths = modes.mode_view_planning(
                cfg0, [name], method_ids=(method,),
                init_view_cases=((0, 1, 3),), nerf_cfg=nerf_cfg,
                predictor=predictor if method == 4 else None,
            )
            dt = time.perf_counter() - t0
            row = {"method": METHOD_NAMES[method], "seconds": round(dt, 1)}
            if paths:
                p = paths[0]
                bud = os.path.join(p, "view_budget.txt")
                if os.path.exists(bud):
                    row["budget"] = int(float(open(bud).read().split()[0]))
                # final metrics file = metrics/<last iteration>.txt
                mdir = os.path.join(p, "metrics")
                finals = sorted(
                    (f for f in os.listdir(mdir) if f.endswith(".txt")),
                    key=lambda f: int(f[:-4]))
                if finals:
                    from nerf_prv_tpu.nerf.api import load_metrics

                    m = load_metrics(os.path.join(mdir, finals[-1]))
                    row["PSNR"] = round(m["PSNR"], 3)
                    row["SSIM"] = round(m["SSIM"], 4)
                    row["n_views_trained"] = int(finals[-1][:-4]) + 1
                # total movement cost = last movement file's 3rd column
                mvdir = os.path.join(p, "movement")
                mv = sorted((f for f in os.listdir(mvdir)
                             if f[:-4].lstrip("-").isdigit()),
                            key=lambda f: int(f[:-4]))
                if mv:
                    row["movement"] = round(
                        float(open(os.path.join(mvdir, mv[-1])).read()
                              .split()[-1]), 4)
            out["rows"][key] = row
            print(f"{key}: {row}", flush=True)
            _summarize(out)
            with open(art_path, "w") as f:
                json.dump(out, f, indent=1)
    _summarize(out)
    with open(art_path, "w") as f:
        json.dump(out, f, indent=1)
    print("DONE", flush=True)


def _summarize(out):
    from nerf_prv_tpu.pipeline.nbv import METHOD_NAMES

    summary = {}
    for method in METHODS:
        recs = [r for k, r in out["rows"].items()
                if k.endswith(f"/m{method}") and "PSNR" in r]
        if not recs:
            continue
        entry = {"n": len(recs)}
        for field in ("PSNR", "SSIM", "movement"):
            v = np.array([r[field] for r in recs if field in r], np.float64)
            if len(v):
                entry[field] = {
                    "mean": round(float(v.mean()), 4),
                    "std": round(float(v.std(ddof=1)) if len(v) > 1 else 0.0, 4),
                }
        summary[METHOD_NAMES[method]] = entry
    out["summary"] = summary


if __name__ == "__main__":
    main()
