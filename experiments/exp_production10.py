#!/usr/bin/env python3
"""Production-resolution label pipeline at 10 objects (VERDICT r2 item 5).

Runs modes 0 -> 3 -> 4 -> fit -> 5 end-to-end at the reference's FULL
default protocol — 1280x720 inverse-Brown-Conrady camera, view counts
3..50 step 2 (+100 test set), 2500-step trainings — over 10 procedural
objects (8 families' mid-hardness members + the two pilot-2 tail anchors),
recording seconds/object and the mode-5 label statistics table
(≙ main.cpp:2553-2637).  This validates the ~10 s/object protocol
headline at production settings: each of the 24 per-object view counts is
one full protocol unit (2500-step train + 100-view 1280x720 eval).

Separate workspace from the 320x180 dataset run (different camera).

  nohup python -u experiments/exp_production10.py > /tmp/prod10.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
ROOT = "/tmp/prv3_prod"
NAMES = ["uni5", "ell5", "clu5", "cup5", "pla5",
         "spi5", "van5", "box5", "nos5", "fan5"][: int(os.environ.get("PRV3_PROD_N", 10))]


def main():
    from families import make_family_object
    from nerf_prv_tpu.core.config import Config
    from nerf_prv_tpu.labeling.labels import parse_label_file
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.pipeline import modes

    cfg = Config(
        workspace=os.path.join(ROOT, "ws"),
        model_path=os.path.join(ROOT, "models"),
        viewspace_path=os.path.join(ROOT, "ws", "viewspace"),
        name_of_pcd=NAMES[0],
    )  # defaults: 1280x720 distorted camera, counts 3..50 step 2, 2500 steps

    model_dir = os.path.join(ROOT, "models", "ShapeNet")
    for name in NAMES:
        make_family_object(name, model_dir)

    counts = [n for n in modes._coverage_counts(cfg) if n != 100]
    modes.mode_view_cover(cfg, sizes=counts + [100])

    nerf_cfg = NerfConfig(n_steps=cfg.n_steps)
    out_path = os.path.join(ART, "production10.json")
    objects, times = {}, {}
    for i, name in enumerate(NAMES):
        t0 = time.perf_counter()
        obj_cfg = cfg.replace(name_of_pcd=name)
        modes.mode_get_coverage(cfg, [name])
        t_cov = time.perf_counter() - t0
        t1 = time.perf_counter()
        modes.mode_instant_ngp(cfg, [name], nerf_cfg=nerf_cfg)
        t_ngp = time.perf_counter() - t1
        modes.mode_fit_labels(cfg, [name])
        res = parse_label_file(os.path.join(obj_cfg.gt_path, "label.txt"))
        label = int(res.gradient_labels[1])
        dt = time.perf_counter() - t0
        objects[name] = {"label": label, "converged": bool(res.converged)}
        n_units = len(counts) + 1  # mode_instant_ngp also trains+evals 100
        times[name] = {
            "total_s": round(dt, 1),
            "coverage_s": round(t_cov, 1),
            "ngp_sweep_s": round(t_ngp, 1),
            "s_per_protocol_unit": round(t_ngp / n_units, 2),
        }
        print(f"[{i+1}/{len(NAMES)}] {name}: label={label} "
              f"({dt:.0f}s, {times[name]['s_per_protocol_unit']}s/unit)",
              flush=True)
        stats = modes.mode_read_label(cfg, list(objects))
        units = [t["s_per_protocol_unit"] for t in times.values()]
        from exp_dataset100 import _jsonable  # int64 stat keys crash json.dump

        with open(out_path, "w") as f:
            json.dump(_jsonable({
                "camera": "1280x720 inverse-Brown-Conrady (production default)",
                "n_steps": cfg.n_steps,
                "view_counts": len(counts) + 1,
                "objects": objects,
                "seconds": times,
                "median_s_per_protocol_unit": round(float(np.median(units)), 2),
                "label_stats_mode5": stats,
            }), f, indent=1, default=float)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
