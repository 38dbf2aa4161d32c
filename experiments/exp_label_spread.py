#!/usr/bin/env python3
"""Pilot: verify the procedural families actually spread the gradient@0.02
label before committing the chip to the ~120-object round-3 dataset run.

VERDICT r2 item 1 requires labels spanning >=20 distinct values in [13,58].
Round 2's three families landed in [25,33]; this pilot runs each new family
at its hardness extremes (idx 0 and 7) plus the three round-2 anchors
through the reduced label protocol (320x180, 1200-step fits, view counts
3..47 step 4 + 100) and prints family -> label so the full run's roster can
be tuned.  Shares the round-3 workspace (/tmp/prv3_ws): everything computed
here is reused verbatim by exp_dataset100.py via the pipeline's
idempotence guards (≙ the reference's size.txt/N.json/metrics resume
guards, main.cpp:851-964, 2351-2352, 2472-2473).

  nohup python -u experiments/exp_label_spread.py > /tmp/pilot.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

# Round 4+: the workspace must survive builder-session restarts (/tmp is
# wiped with the VM).  It lives inside the repo tree but is gitignored —
# images/checkpoints are regenerable artifacts, not source.  PRV_WS_ROOT
# overrides for tests / throwaway runs.
ROOT = os.environ.get(
    "PRV_WS_ROOT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".workspace", "prv3_ws"))

PILOT = (
    ["uni0", "uni7", "ell0", "ell7", "clu0", "clu7", "cup0", "cup7",
     "pla0", "pla7", "spi0", "spi7", "van0", "van7",
     "blo0", "tor0", "box0"]
)


def pipeline_config():
    from nerf_prv_tpu.core.config import CameraConfig, Config

    cam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    return Config(
        workspace=os.path.join(ROOT, "ws"),
        model_path=os.path.join(ROOT, "models"),
        viewspace_path=os.path.join(ROOT, "ws", "viewspace"),
        name_of_pcd="uni0",
        coverage_view_num_max=47,
        coverage_view_num_add=4,  # 12 fit counts 3,7,..,47 (+100 for max)
        n_steps=1200,
        camera=cam,
    )


def run_label_protocol(cfg, names):
    """modes 0 -> 3 -> 4 -> lognormal fit for ``names``; returns
    {name: (label, converged, n_fits_done)} + wall seconds per object."""
    from families import make_family_object
    from nerf_prv_tpu.labeling.labels import parse_label_file
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.pipeline import modes

    model_dir = os.path.join(ROOT, "models", "ShapeNet")
    for name in names:
        make_family_object(name, model_dir)

    counts = [n for n in modes._coverage_counts(cfg) if n != 100]
    modes.mode_view_cover(cfg, sizes=counts + [64, 100])

    nerf_cfg = NerfConfig(n_steps=cfg.n_steps)
    out, times = {}, {}
    for name in names:
        t0 = time.perf_counter()
        modes.mode_get_coverage(cfg, [name])
        modes.mode_instant_ngp(cfg, [name], nerf_cfg=nerf_cfg)
        modes.mode_fit_labels(cfg, [name])
        obj_cfg = cfg.replace(name_of_pcd=name)
        res = parse_label_file(os.path.join(obj_cfg.gt_path, "label.txt"))
        label = int(res.gradient_labels[1])  # gradient@0.02 (≙ main.cpp:2641)
        out[name] = (label, bool(res.converged))
        times[name] = round(time.perf_counter() - t0, 1)
        print(f"{name}: label={label} converged={res.converged} "
              f"({times[name]}s)", flush=True)
    return out, times


def main():
    cfg = pipeline_config()
    t0 = time.perf_counter()
    out, times = run_label_protocol(cfg, PILOT)
    artifact = {
        "objects": {k: {"label": v[0], "converged": v[1]} for k, v in out.items()},
        "seconds_per_object": times,
        "total_seconds": round(time.perf_counter() - t0, 1),
        "distinct_labels": sorted({v[0] for v in out.values() if v[0] > 0}),
    }
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "label_spread_pilot.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
