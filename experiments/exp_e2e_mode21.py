#!/usr/bin/env python3
"""End-to-end mode 21 (view planning: PRV + baselines incl. the
ensemble-NeRF method) on the TPU at production resolution.

  nohup python -u experiments/exp_e2e_mode21.py > /tmp/exp_m21.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))


def main():
    from nerf_prv_tpu.core.config import Config
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.prvnet.infer import BudgetPredictor
    from nerf_prv_tpu.prvnet.model import IMG_PATTERN
    from nerf_prv_tpu.prvnet.train import TrainConfig, init_model
    from nerf_prv_tpu.scene import save_ply_binary
    from synthetic import make_object

    root = "/tmp/e2e_ws"
    os.makedirs(root, exist_ok=True)
    ply = os.path.join(root, "models", "ShapeNet", "toy0.ply")
    if not os.path.exists(ply):
        pts, cols = make_object(30000, seed=3)
        save_ply_binary(ply, pts * 20, cols)
    cfg = Config(
        workspace=os.path.join(root, "ws"),
        model_path=os.path.join(root, "models"),
        viewspace_path=os.path.join(root, "ws", "viewspace"),
        name_of_pcd="toy0",
        num_of_views=60,
        num_of_max_iteration=3,
        n_steps=2500,
        ensemble_num=2,
        evaluate=False,
    )
    modes.mode_view_cover(cfg, sizes=[5, 60] + list(range(13, 59)))

    # method 4 runs with LEARNED weights when the real training run's
    # checkpoint exists (experiments/exp_prvnet_real.py); falls back to a
    # fresh init so the wiring e2e still runs standalone
    ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "artifacts", "prvnet_ckpt", "best_checkpoint.msgpack",
    )
    if os.path.exists(ckpt):
        predictor = BudgetPredictor(
            checkpoint_path=ckpt, arch="convnextv2_atto",
            pattern=IMG_PATTERN[2], crop=180,
        )
        print(f"using learned PRVNet checkpoint {ckpt}", flush=True)
    else:
        tc = TrainConfig(arch="convnextv2_atto", image_size=64)
        _, params = init_model(tc, n_views=3, image_size=64)
        predictor = BudgetPredictor(
            params=params, arch="convnextv2_atto", pattern=IMG_PATTERN[2], crop=64
        )
        print("using fresh-init PRVNet weights (no checkpoint found)", flush=True)

    t0 = time.perf_counter()
    paths = modes.mode_view_planning(
        cfg,
        ["toy0"],
        method_ids=(4, 0, 2),
        init_view_cases=((0, 1, 3),),
        predictor=predictor,
        coverage_sizes=(),
    )
    el = time.perf_counter() - t0
    print(f"mode21 methods (4,0,2) x 3 iterations: {el:.1f}s", flush=True)
    for p in paths:
        bud = os.path.join(p, "view_budget.txt")
        rt = os.path.join(p, "run_time.txt")
        print(
            f"  {os.path.basename(p)}: budget="
            f"{open(bud).read().split()[0] if os.path.exists(bud) else '-'} "
            f"run_time={open(rt).read().strip() if os.path.exists(rt) else '-'}",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
