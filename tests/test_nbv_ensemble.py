"""End-to-end NBV with the ensemble methods (2/3) and server daemons."""

import os
import subprocess
import sys
import threading
import time

import numpy as np
import pytest

from nerf_prv_tpu.core.config import CameraConfig, Config
from nerf_prv_tpu.nerf.model import HashGridConfig, NerfConfig
from nerf_prv_tpu.pipeline import modes
from nerf_prv_tpu.scene import save_ply_binary

from synthetic import make_object

TEST_CAM = CameraConfig(
    width=96, height=54, fx=68.7, fy=68.5, ppx=48.5, ppy=27.9, model=0
)

TINY_NERF = NerfConfig(
    grid=HashGridConfig(levels=4, features=2, log2_table=12, n_min=8, n_max=64),
    voxel_grid_size=16,
    voxel_features=4,
    hidden=32,
    n_samples=24,
    train_rays=512,
    n_steps=30,
)


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("ens")
    pts, cols = make_object(4000, seed=5)
    save_ply_binary(str(root / "models" / "ShapeNet" / "toy1.ply"), pts * 20, cols)
    return Config(
        workspace=str(root / "ws"),
        model_path=str(root / "models"),
        viewspace_path=str(root / "ws" / "viewspace"),
        name_of_pcd="toy1",
        num_of_views=8,
        num_of_max_iteration=2,
        camera=TEST_CAM,
        evaluate=False,
    )


@pytest.mark.slow
def test_nbv_ensemble_rgb_method(workspace):
    cfg = workspace
    paths = modes.mode_view_planning(
        cfg,
        ["toy1"],
        method_ids=(2,),
        init_view_cases=((0, 1, 3),),
        nerf_cfg=TINY_NERF,
        coverage_sizes=(),
    )
    p = paths[0]
    assert p.endswith("_m2_v3_t0")
    assert os.path.exists(os.path.join(p, "run_time.txt"))
    # 2 iterations, each trained an ensemble of 2 and rendered the candidates
    for it in range(cfg.num_of_max_iteration):
        for e in range(2):  # EnsembleRGB uses 2 members (Share_Data.hpp:505)
            d = os.path.join(p, "render", str(it), f"ensemble_{e}")
            assert os.path.isdir(d), d
            assert any(f.startswith("rgbaClip_") for f in os.listdir(d))
    moves = [f for f in os.listdir(os.path.join(p, "movement")) if f[0].isdigit()]
    assert len(moves) == cfg.num_of_max_iteration
    # chosen views are distinct
    chosen = [int(open(os.path.join(p, "movement", f)).read().split()[0]) for f in sorted(moves)]
    assert len(set(chosen)) == len(chosen)


SERVERS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "servers")


def test_train_server_roundtrip(tmp_path):
    root = str(tmp_path)
    interact = os.path.join(root, "interact")
    os.makedirs(interact)
    marker = os.path.join(root, "ran.txt")
    with open(os.path.join(interact, "run_with_c++.py"), "w") as f:
        f.write(f"open(r'{marker}', 'w').write('done')\n")
    open(os.path.join(interact, "ready_c++.txt"), "w").close()
    sys.path.insert(0, SERVERS)
    import importlib

    train_server = importlib.import_module("train_server")
    train_server.serve(root, poll_s=0.05, once=True)
    assert os.path.exists(marker)
    assert os.path.exists(os.path.join(interact, "ready_py.txt"))
    assert not os.path.exists(os.path.join(interact, "ready_c++.txt"))


@pytest.mark.slow
def test_infer_server_roundtrip(tmp_path, monkeypatch):
    from PIL import Image

    from nerf_prv_tpu.prvnet.infer import BudgetPredictor
    from nerf_prv_tpu.prvnet.model import IMG_PATTERN
    from nerf_prv_tpu.prvnet.train import TrainConfig, init_model, save_checkpoint

    root = str(tmp_path)
    data = os.path.join(root, "data", "images")
    os.makedirs(data)
    rng = np.random.default_rng(0)
    for idx in IMG_PATTERN[2]:
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), dtype=np.uint8), "RGB"
        ).save(os.path.join(data, f"{idx}.png"))
    cfg = TrainConfig(arch="convnextv2_atto", image_size=64)
    _, params = init_model(cfg, n_views=3, image_size=64)
    ckpt = os.path.join(root, "ckpt.msgpack")
    save_checkpoint(ckpt, params)

    sys.path.insert(0, SERVERS)
    import importlib

    infer_server = importlib.import_module("infer_server")
    # small-crop predictor for the 64x64 test images
    monkeypatch.setattr(
        infer_server,
        "serve",
        infer_server.serve,
    )
    # run serve with a patched BudgetPredictor via the module's import path
    import nerf_prv_tpu.prvnet.infer as infer_mod

    orig = infer_mod.BudgetPredictor

    def small(*a, **kw):
        kw.setdefault("arch", "convnextv2_atto")
        kw.setdefault("crop", 64)
        return orig(*a, **kw)

    monkeypatch.setattr(infer_mod, "BudgetPredictor", small)
    open(os.path.join(root, "data", "ready_c++.txt"), "w").close()
    infer_server.serve(root, ckpt, poll_s=0.05, once=True)
    budget = int(open(os.path.join(root, "data", "view_budget.txt")).read())
    assert 13 <= budget <= 58
    assert os.path.exists(os.path.join(root, "data", "ready_py.txt"))
