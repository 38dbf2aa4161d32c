import os

import numpy as np
import pytest

from nerf_prv_tpu.labeling import (
    LabelResult,
    X_EVAL,
    build_dataset,
    fit_objects,
    labels_from_curve,
    lognormal_cdf,
    parse_label_file,
    select_labels,
    stratified_split,
    write_label_file,
    write_label_stats,
)


def _synthetic_curve(y0=12.0, a=18.0, mu=np.log(15.0), sigma=0.8, x=None):
    import jax.numpy as jnp
    from scipy.stats import norm

    x = np.asarray(x if x is not None else X_EVAL, np.float64)
    return y0 + a * norm.cdf((np.log(x) - mu) / sigma)


def test_fit_recovers_lognormal_params():
    x = np.arange(3, 51, 2, dtype=np.float64)
    rng = np.random.default_rng(0)
    true = _synthetic_curve(x=x)
    y = true + rng.normal(0, 0.05, size=len(x))
    max_psnr = _synthetic_curve(x=np.array([100.0]))[0] + 0.3
    results = fit_objects(x, y[None], np.array([max_psnr]))
    r = results[0]
    assert r.converged
    full = _synthetic_curve(x=X_EVAL)
    np.testing.assert_allclose(r.curve, full, atol=0.35)


def test_fit_batch_many_objects():
    x = np.arange(3, 51, 2, dtype=np.float64)
    rng = np.random.default_rng(1)
    curves, maxes = [], []
    for i in range(16):
        mu = np.log(rng.uniform(8, 30))
        sig = rng.uniform(0.5, 1.2)
        a = rng.uniform(10, 25)
        curves.append(_synthetic_curve(12.0, a, mu, sig, x) + rng.normal(0, 0.05, len(x)))
        maxes.append(_synthetic_curve(12.0, a, mu, sig, np.array([100.0]))[0] + 0.5)
    results = fit_objects(x, np.stack(curves), np.asarray(maxes))
    assert sum(r.converged for r in results) >= 14


def test_convergence_rejected_when_sample_exceeds_max():
    x = np.arange(3, 51, 2, dtype=np.float64)
    y = _synthetic_curve(x=x)
    max_psnr = y.max() - 1.0  # some samples exceed it
    r = fit_objects(x, y[None], np.array([max_psnr]))[0]
    assert not r.converged


def test_labels_from_curve_gap_and_gradient():
    curve = _synthetic_curve(x=X_EVAL)
    max_psnr = _synthetic_curve(x=np.array([100.0]))[0]
    lab = labels_from_curve(curve, max_psnr)
    # gap 0%: first v reaching 100% of max -> close to 100
    assert lab["gap"][0] >= 90
    # monotone: larger allowed gap -> smaller view count
    g = lab["gap"][lab["gap"] > 0]
    assert (np.diff(g) <= 0).all()
    # gradient labels monotone too (higher threshold -> earlier stop)
    gr = lab["gradient"][lab["gradient"] > 0]
    assert (np.diff(gr) <= 0).all()
    # gradient 0.02 (index 1) in plausible range for this curve
    assert 10 <= lab["gradient"][1] <= 80


def test_label_file_roundtrip(tmp_path):
    curve = _synthetic_curve(x=X_EVAL)
    lab = labels_from_curve(curve, curve[-1] + 0.5)
    r = LabelResult(True, curve, lab["gap"], lab["gradient"])
    p = str(tmp_path / "label.txt")
    write_label_file(p, r)
    r2 = parse_label_file(p)
    assert r2.converged == r.converged
    np.testing.assert_allclose(r2.curve, r.curve, atol=1e-5)
    np.testing.assert_array_equal(r2.gap_labels, r.gap_labels)
    np.testing.assert_array_equal(r2.gradient_labels, r.gradient_labels)
    # reference line format: "gap 0% 97" / "gradient 0.02 31"
    lines = open(p).read().splitlines()
    assert lines[0].startswith("Converged ")
    assert any(l.startswith("gap 0% ") for l in lines)
    assert any(l.startswith("gradient 0.02 ") for l in lines)


def _fake_results(labels):
    out = []
    for lb in labels:
        gaps = np.full(11, -1, np.int64)
        grads = np.full(20, -1, np.int64)
        grads[1] = lb
        out.append(LabelResult(True, np.zeros(98), gaps, grads))
    return out


def test_select_and_split_and_build(tmp_path):
    names = [f"tab{i}" for i in range(10)] + [f"car{i}" for i in range(10)]
    labels = [20] * 6 + [30] * 4 + [25] * 5 + [99] * 5  # 99 -> filtered out
    results = _fake_results(labels)
    sel = select_labels(names, results)
    assert len(sel) == 15
    train, val = stratified_split(sel, seed=0)
    assert set(train) | set(val) == set(sel)
    assert not (set(train) & set(val))
    # every (cat,label) has >=1 in train
    for name in sel:
        same = [n for n in sel if n[:3] == name[:3] and sel[n] == sel[name]]
        assert any(n in train for n in same)
    info = build_dataset(str(tmp_path), names, results, copy_images=False)
    assert os.path.exists(tmp_path / "pvb_dataset" / "train_split.txt")
    assert os.path.exists(tmp_path / "sorted_object_names.txt")
    assert os.path.exists(tmp_path / "train_distribution.txt")
    assert (tmp_path / "pvb_dataset" / "tab0" / "view_budget.txt").read_text() == "20"


def test_stratified_split_holdout_fills_val():
    """The reference threshold sends a cell to val only at >=5 members
    (measured round 2: 1 val object of 19).  holdout mode must give every
    >=2-member cell at least one val object while keeping >=1 in train."""
    names = [f"tab{i}" for i in range(4)] + [f"car{i}" for i in range(2)]
    sel = dict(zip(names, [20, 20, 20, 20, 25, 25]))
    train_ref, val_ref = stratified_split(sel, seed=0, split="reference")
    assert val_ref == []  # cells of 4 and 2: reference starves val
    train, val = stratified_split(sel, seed=0, split="holdout")
    assert set(train) | set(val) == set(sel)
    assert not (set(train) & set(val))
    # each (cat,label) cell: >=1 train member AND >=1 val member (size >= 2)
    for cell in ({"tab0", "tab1", "tab2", "tab3"}, {"car0", "car1"}):
        assert cell & set(train) and cell & set(val)


def test_write_label_stats(tmp_path):
    results = _fake_results([20, 22, 24, 30])
    agg = write_label_stats(str(tmp_path), results)
    assert os.path.exists(tmp_path / "label_mean_std.txt")
    assert os.path.exists(tmp_path / "label_distribution.txt")
    row = agg["gradient"][1]
    assert row["mean"] == pytest.approx(24.0)
    assert row["min"] == 20 and row["max"] == 30
