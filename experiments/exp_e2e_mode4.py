#!/usr/bin/env python3
"""End-to-end mode 0->3->4 on one synthetic object at production settings
(1280x720, 2500 steps, 100-view eval) — validates the pipeline with the
current NeRF defaults and measures label-sweep pace.

  nohup python -u experiments/exp_e2e_mode4.py > /tmp/exp_e2e.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    from nerf_prv_tpu.core.config import Config
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.scene import save_ply_binary
    from synthetic import make_object

    root = "/tmp/e2e_ws"
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
        coverage_view_num_max=7,
        coverage_view_num_add=2,
        n_steps=2500,
    )
    t0 = time.perf_counter()
    modes.mode_view_cover(cfg, sizes=[3, 5, 7, 100])
    print(f"mode0 viewspaces {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    modes.mode_get_coverage(cfg, ["toy0"])
    print(f"mode3 coverage {time.perf_counter()-t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    modes.mode_instant_ngp(cfg, ["toy0"])
    el = time.perf_counter() - t0
    print(f"mode4 sweep (3 counts + 100-view test) {el:.1f}s", flush=True)
    gt = os.path.join(cfg.workspace, "ShapeNet", "GT_points_info", "toy0")
    for n in (3, 5, 7):
        path = os.path.join(cfg.gt_path, f"{n}.txt")
        if os.path.exists(path):
            print(f"  {n}.txt: {open(path).read().strip()}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
