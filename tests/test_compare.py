import os

import numpy as np
import pytest

from nerf_prv_tpu.core.config import CameraConfig, Config
from nerf_prv_tpu.nerf.model import HashGridConfig, NerfConfig
from nerf_prv_tpu.pipeline.compare import (
    STAT_BUDGETS,
    compare_objects,
    match_distribution,
    path_length_for_budget,
    write_comparison_table,
)
from nerf_prv_tpu.scene import load_object, save_ply_binary
from nerf_prv_tpu.viewspace import generate_hemisphere, save_view_space

from synthetic import make_object

TEST_CAM = CameraConfig(
    width=64, height=36, fx=45.8, fy=45.7, ppx=32.4, ppy=18.6, model=0
)

TINY_NERF = NerfConfig(
    grid=HashGridConfig(levels=2, features=2, log2_table=10, n_min=8, n_max=16),
    voxel_grid_size=12,
    voxel_features=4,
    hidden=32,
    n_samples=16,
    train_rays=256,
    n_steps=20,
)


def test_stat_budgets_match_reference():
    assert STAT_BUDGETS == {"mode": 32, "median": 34, "mean": 35}


def test_stat_budgets_from_labels():
    from nerf_prv_tpu.pipeline.compare import stat_budgets_from_labels

    labels = {"a": 20, "b": 20, "c": 30, "d": 40, "e": 25}
    got = stat_budgets_from_labels(labels)
    assert got == {"mode": 20, "median": 25, "mean": 27}
    # empty -> falls back to the reference constants
    assert stat_budgets_from_labels({}) == STAT_BUDGETS


def test_match_distribution_tracks_val_histogram():
    val = {f"v{i}": 20 for i in range(8)} | {f"w{i}": 30 for i in range(4)}
    cand = {f"c{i}": 20 for i in range(50)} | {f"d{i}": 30 for i in range(50)}
    test = match_distribution(val, cand, n_test=12, seed=0)
    labels = [20 if t.startswith("c") else 30 for t in test]
    assert labels.count(20) == 8 and labels.count(30) == 4
    assert not (set(test) & set(val))


def test_write_comparison_table(tmp_path):
    rows = {
        "a": {"gt": {"budget": 20, "PSNR": 30.0, "SSIM": 0.9, "path_len": 5.0}},
        "b": {"gt": {"budget": 24, "PSNR": 32.0, "SSIM": 0.95, "path_len": 6.0}},
    }
    out = str(tmp_path / "cmp.txt")
    write_comparison_table(out, rows)
    lines = open(out).read().splitlines()
    assert lines[0].startswith("method\t")
    gt = [l for l in lines if l.startswith("gt\t")][0].split("\t")
    assert float(gt[1]) == pytest.approx(22.0)   # budget mean
    assert float(gt[3]) == pytest.approx(31.0)   # PSNR mean


@pytest.mark.slow
def test_compare_objects_end_to_end(tmp_path):
    root = tmp_path
    pts, cols = make_object(3000, seed=9)
    save_ply_binary(str(root / "models" / "ShapeNet" / "toyc0.ply"), pts * 20, cols)
    cfg = Config(
        workspace=str(root / "ws"),
        model_path=str(root / "models"),
        viewspace_path=str(root / "ws" / "viewspace"),
        name_of_pcd="toyc0",
        num_of_views=8,
        camera=TEST_CAM,
    )
    labels = {"toyc0": 14}
    # restrict budgets to keep the test cheap: monkeypatch STAT_BUDGETS? use
    # the real ones — view spaces generate on demand, trainings are tiny
    rows = compare_objects(cfg, ["toyc0"], labels, nerf_cfg=TINY_NERF)
    entry = rows["toyc0"]
    assert set(entry) == {"gt", "mode", "median", "mean"}
    assert entry["gt"]["budget"] == 14
    assert entry["mode"]["budget"] == 32
    for rec in entry.values():
        assert np.isfinite(rec["PSNR"]) and np.isfinite(rec["path_len"])
        assert rec["path_len"] > 0
    assert os.path.exists(root / "ws" / "pvb_statistic_compare.txt")
    # metric files cached for idempotence (≙ the reference's resume guards)
    assert os.path.exists(root / "ws" / "Coverage_images" / "ShapeNet" / "toyc0" / "compare_14.txt")

    # precomputed predictions pin the prv budget verbatim and take priority
    # over the predictor (which must then never be queried)
    class Boom:
        def predict_from_coverage(self, *a):  # pragma: no cover
            raise AssertionError("predictor must not be called")

    rows2 = compare_objects(cfg, ["toyc0"], labels, nerf_cfg=TINY_NERF,
                            predictor=Boom(), predictions={"toyc0": 14})
    assert rows2["toyc0"]["prv"]["budget"] == 14
    # budget 14 was cached above -> identical metrics, no retrain
    assert rows2["toyc0"]["prv"]["PSNR"] == entry["gt"]["PSNR"]
