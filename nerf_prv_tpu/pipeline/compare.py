"""Statistics comparison — mode 7 (TestObjects) equivalent.

≙ ``main.cpp:2886-3465``: build a test set whose label distribution matches
the validation split (250 objects, main.cpp:2935), then for every object
evaluate NeRF quality (PSNR/SSIM vs the 100-view novel test set) at

- the ground-truth label budget,
- the statistics baselines 32 (mode), 34 (median), 35 (mean)
  (main.cpp:3001-3005),
- the PRVNet-predicted budget,

plus the TSP movement cost for every view count 3..100 (main.cpp:3256-3298),
and write the mean±std comparison table ``pvb_statistic_compare.txt``.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.config import Config
from ..labeling.dataset import MAX_VIEWS, MIN_VIEWS
from ..nerf.api import load_metrics
from ..nerf.model import NerfConfig
from ..planning.tsp import GlobalPathPlanner
from ..viewspace.hemisphere import ViewSpace, load_path_order, load_view_space

STAT_BUDGETS = {"mode": 32, "median": 34, "mean": 35}  # ≙ main.cpp:3001-3005


def stat_budgets_from_labels(labels: Dict[str, int]) -> Dict[str, int]:
    """Derive the statistics baselines from an actual label distribution.

    The reference hard-codes 32/34/35 (main.cpp:3001-3005), which are the
    mode/median/mean of ITS val split's labels (main.cpp:2644-2645 context).
    At our dataset scale those constants don't describe the data, so this
    computes them the way the reference's were obtained: mode = most common
    label (smallest on ties), median and mean rounded to integers."""
    vals = np.array(sorted(labels.values()))
    if len(vals) == 0:
        return dict(STAT_BUDGETS)
    uniq, counts = np.unique(vals, return_counts=True)
    # half-away-from-zero rounding (C++ round()), not Python's half-to-even:
    # a .5 median must not round down on even values
    return {
        "mode": int(uniq[np.argmax(counts)]),
        "median": int(np.floor(float(np.median(vals)) + 0.5)),
        "mean": int(np.floor(float(vals.mean()) + 0.5)),
    }


def match_distribution(
    val_labels: Dict[str, int],
    candidate_labels: Dict[str, int],
    n_test: int = 250,
    seed: int = 0,
) -> List[str]:
    """Pick a test set whose label histogram tracks the val split's
    (≙ main.cpp:2904-2984)."""
    rng = np.random.default_rng(seed)
    val_hist = np.zeros(MAX_VIEWS + 1)
    for lb in val_labels.values():
        val_hist[lb] += 1
    if val_hist.sum() == 0:
        return []
    want = np.round(val_hist / val_hist.sum() * n_test).astype(int)
    by_label: Dict[int, List[str]] = {}
    for name, lb in candidate_labels.items():
        if name not in val_labels and MIN_VIEWS <= lb <= MAX_VIEWS:
            by_label.setdefault(lb, []).append(name)
    test = []
    for lb in range(MIN_VIEWS, MAX_VIEWS + 1):
        pool = sorted(by_label.get(lb, []))
        rng.shuffle(pool)
        test.extend(pool[: want[lb]])
    return test


def path_length_for_budget(cfg: Config, scene_view_space: ViewSpace, budget: int) -> float:
    """Movement cost of the precomputed TSP path at a given view count,
    scaled into the object's view space (≙ main.cpp:3256-3298)."""
    views = load_view_space(cfg.viewspace_path, budget)
    try:
        order = load_path_order(cfg.viewspace_path, budget)
    except OSError:
        start = int(np.argmin(np.linalg.norm(views - [0, 0, 1], axis=1)))
        planner = GlobalPathPlanner(
            views, list(range(budget)), np.zeros(3),
            0.5 * float(np.linalg.norm(views[0])), start,
        )
        planner.solve()
        order = np.asarray(planner.get_path_id_set())
    # scale unit-sphere path into metric space at the view radius
    pts = views / np.linalg.norm(views, axis=1, keepdims=True) * cfg.view_space_radius
    total = 0.0
    from ..planning.local_path import local_path

    for a, b in zip(order[:-1], order[1:]):
        _, d = local_path(pts[a], pts[b], np.zeros(3) + 1e-10, scene_view_space.predicted_size)
        total += d
    return total


def evaluate_budget(
    cfg: Config,
    scene,
    budget: int,
    nerf_cfg: Optional[NerfConfig] = None,
) -> Dict[str, float]:
    """Train on the budget-view coverage json and evaluate vs the 100-view
    test json; cached through the metrics file like the reference's
    idempotence guards."""
    from ..nerf.api import run
    from .coverage import get_coverage

    metrics_file = os.path.join(cfg.gt_path, f"compare_{budget}.txt")
    if os.path.exists(metrics_file):
        return load_metrics(metrics_file)
    train_json = get_coverage(scene, cfg, budget)
    test_json = get_coverage(scene, cfg, 100)
    nerf_cfg = nerf_cfg or NerfConfig(n_steps=cfg.n_steps)
    metrics = run(
        train_json,
        test_transforms=test_json,
        save_metrics_path=metrics_file,
        cfg=nerf_cfg,
    )
    return metrics


def compare_objects(
    cfg: Config,
    names: Sequence[str],
    labels: Dict[str, int],
    predictor=None,
    nerf_cfg: Optional[NerfConfig] = None,
    out_file: Optional[str] = None,
    stat_budgets: Optional[Dict[str, int]] = None,
    predictions: Optional[Dict[str, int]] = None,
) -> Dict[str, dict]:
    """Run the budget comparison for each object and write the summary table
    (≙ pvb_statistic_compare.txt, main.cpp:3301-3464).

    ``stat_budgets``: the mode/median/mean baselines.  Defaults to the
    reference's published constants; pass
    ``stat_budgets_from_labels(val_labels)`` to derive them from the
    dataset actually in use (≙ how the reference's constants were made).

    ``predictions``: precomputed per-object PRV budgets.  When given they
    are used verbatim (so the recorded predictions and the evaluated
    budgets cannot drift apart); otherwise ``predictor`` is queried the
    reference way — pattern [0,1,3] of the 5-view init coverage
    (≙ infer_server.py:47,80-88, main.cpp:3136-3205)."""
    from ..scene.object_setup import load_object
    from .coverage import get_coverage

    rows: Dict[str, dict] = {}
    for name in names:
        obj_cfg = cfg.replace(name_of_pcd=name)
        scene = load_object(obj_cfg, name)
        if not scene.ok:
            continue
        budgets = {"gt": labels[name], **(stat_budgets or STAT_BUDGETS)}
        if predictions is not None and name in predictions:
            budgets["prv"] = int(predictions[name])
        elif predictor is not None:
            init_json = get_coverage(scene, obj_cfg, 5)
            coverage_dir = os.path.join(obj_cfg.gt_path, "5")
            budgets["prv"] = predictor.predict_from_coverage(coverage_dir, [0, 1, 3])
        entry = {}
        for key, b in budgets.items():
            m = evaluate_budget(obj_cfg, scene, int(b), nerf_cfg)
            entry[key] = {
                "budget": int(b),
                "PSNR": m["PSNR"],
                "SSIM": m["SSIM"],
                "path_len": path_length_for_budget(obj_cfg, scene.view_space, int(b)),
            }
        rows[name] = entry

    if out_file is None:
        out_file = os.path.join(cfg.workspace, "pvb_statistic_compare.txt")
    write_comparison_table(out_file, rows)
    return rows


def write_comparison_table(path: str, rows: Dict[str, dict]) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    methods = sorted({k for entry in rows.values() for k in entry})
    with open(path, "w") as f:
        f.write("method\tbudget_mean\tbudget_std\tPSNR_mean\tPSNR_std\t"
                "SSIM_mean\tSSIM_std\tpath_mean\tpath_std\tn\n")
        for m in methods:
            recs = [entry[m] for entry in rows.values() if m in entry]
            if not recs:
                continue
            arr = {
                k: np.array([r[k] for r in recs], dtype=np.float64)
                for k in ("budget", "PSNR", "SSIM", "path_len")
            }
            f.write(
                f"{m}\t{arr['budget'].mean():.3f}\t{arr['budget'].std(ddof=1) if len(recs) > 1 else 0:.3f}\t"
                f"{arr['PSNR'].mean():.4f}\t{arr['PSNR'].std(ddof=1) if len(recs) > 1 else 0:.4f}\t"
                f"{arr['SSIM'].mean():.4f}\t{arr['SSIM'].std(ddof=1) if len(recs) > 1 else 0:.4f}\t"
                f"{arr['path_len'].mean():.4f}\t{arr['path_len'].std(ddof=1) if len(recs) > 1 else 0:.4f}\t"
                f"{len(recs)}\n"
            )
