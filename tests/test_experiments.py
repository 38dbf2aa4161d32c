"""Tests for experiment-driver logic that guards scientific validity.

The measurement drivers in experiments/ are not product code, but the
mode-7 roster selection decides which objects may appear in the held-out
test set across sessions and rounds — a leak there invalidates the
flagship comparison (≙ the reference's held-out protocol,
PRV_simulation/main.cpp:2904-2984), so it gets unit coverage like any
subsystem.
"""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "experiments"))


@pytest.fixture(scope="module")
def select_roster():
    from exp_dataset300 import select_roster as fn

    return fn


def _labels(names, label=30):
    return {n: label for n in names}


VAL = _labels(["v1", "v2", "v3"], 30)


def test_rematch_before_consumption(select_roster):
    """An undersized, unconsumed roster is fully re-matched from the pool."""
    new = _labels(["a", "b", "c", "d"])
    test, ever = select_roster([], [], new, VAL, n_test=3, seed=0,
                               consumed=False)
    assert len(test) == 3
    # everything not rostered becomes train and is recorded as trained
    assert set(ever) == set(new) - set(test)


def test_pinned_once_consumed(select_roster):
    """Consumed roster objects never leave the test set."""
    new = _labels(["a", "b", "c", "d", "e"])
    test, _ = select_roster(["a", "b"], [], new, VAL, n_test=2, seed=0,
                            consumed=True)
    assert test == ["a", "b"]


def test_growth_excludes_ever_trained(select_roster):
    """Roster growth only admits objects no predictor ever trained on."""
    new = _labels(["a", "b", "c", "d", "e"])
    test, ever = select_roster(["a"], ["b", "c"], new, VAL, n_test=3, seed=0,
                               consumed=True)
    assert "a" in test and len(test) <= 3
    assert "b" not in test and "c" not in test
    # grown members come only from the never-trained pool {d, e}
    assert set(test) - {"a"} <= {"d", "e"}
    assert {"b", "c"} <= set(ever)


def test_growth_excludes_on_disk_train_split(select_roster):
    """A train_split.txt written before ever_trained_new existed still
    blocks migration into the roster (belt-and-braces guard)."""
    new = _labels(["a", "b", "c"])
    test, ever = select_roster(["a"], [], new, VAL, n_test=3, seed=0,
                               consumed=True, trained_on_disk=["b", "zz"])
    assert "b" not in test
    assert "b" in ever and "zz" not in ever  # legacy names are not "new"


def test_rematch_excludes_ever_trained(select_roster):
    """Even the pre-consumption full re-match may not grab a trained
    object (a failed mode-7 run must not create a leak window)."""
    new = _labels(["a", "b", "c", "d"])
    test, _ = select_roster(["a"], ["b"], new, VAL, n_test=10, seed=0,
                            consumed=False)
    assert "b" not in test


def test_stale_roster_dropped_when_pool_changes(select_roster):
    """A pinned name missing from the usable pool forces a re-match
    (labels file rebuilt, object rejected as unusable, ...)."""
    new = _labels(["c", "d"])
    test, _ = select_roster(["gone"], [], new, VAL, n_test=2, seed=0,
                            consumed=False)
    assert "gone" not in test and len(test) == 2

def test_consumed_survivors_pinned_when_one_drops(select_roster):
    """Advisor r4 (medium): if a relabel pushes a consumed roster object
    out of the usable pool, the SURVIVING consumed objects must stay
    pinned in test (no full re-match migrating them into train), and the
    dropped object must stay barred from train too."""
    new = _labels(["b", "c", "d", "e"])  # "a" dropped out of the pool
    test, ever = select_roster(["a", "b"], [], new, VAL, n_test=2, seed=0,
                               consumed=True)
    assert "b" in test           # survivor stays pinned
    assert "a" not in test       # unusable: cannot be tested...
    assert "a" not in ever       # ...but must never enter train either
    assert "b" not in ever


def test_consumed_dropped_object_never_returns_to_train(select_roster):
    """A dropped-then-relabeled-back object may rejoin TEST (growth), but
    never train: it is excluded from train_new even while unusable, and
    growth around survivors never pulls from prev_test directly."""
    new = _labels(["a", "b", "c", "d"])  # "a" is usable again
    test, ever = select_roster(["a", "b"], [], new, VAL, n_test=2, seed=0,
                               consumed=True)
    # n_test already met by survivors+a? prev_test fully usable -> both pin
    assert set(test) == {"a", "b"}
    assert "a" not in ever and "b" not in ever


def test_predictor_gate(tmp_path, monkeypatch):
    """mode-7/21 rows pin budgets forever; the gate must block a flat
    predictor (corr ~0 / degenerate span) and admit a healthy one."""
    import json

    import predictor_gate as pg

    monkeypatch.setattr(pg, "ART", str(tmp_path))
    monkeypatch.delenv("PRV4_SKIP_PREDICTOR_GATE", raising=False)

    # missing artifact -> block
    with pytest.raises(SystemExit, match="missing"):
        pg.predictor_gate("prvnet_tiny720.json")

    art = tmp_path / "prvnet_tiny720.json"
    # flat predictor (the r4 partial: corr -0.03, span 0.1) -> block
    art.write_text(json.dumps(
        {"val_pred_gt_corr": -0.03, "val_pred_min_max": [27.5, 27.6]}))
    with pytest.raises(SystemExit, match="degenerate"):
        pg.predictor_gate("prvnet_tiny720.json")

    # healthy predictor (r3-atto-like: corr 0.73, span 19) -> pass
    art.write_text(json.dumps(
        {"val_pred_gt_corr": 0.73, "val_pred_min_max": [23.0, 42.1]}))
    assert pg.predictor_gate("prvnet_tiny720.json")["val_pred_gt_corr"] == 0.73

    # override escape hatch
    art.write_text(json.dumps(
        {"val_pred_gt_corr": 0.0, "val_pred_min_max": [30, 30]}))
    monkeypatch.setenv("PRV4_SKIP_PREDICTOR_GATE", "1")
    assert pg.predictor_gate("prvnet_tiny720.json") == {}


def test_pick_predictor_selection(tmp_path, monkeypatch):
    """Best-qualifying-predictor selection: prefers the highest val corr
    among artifacts that clear the gate floors AND have a checkpoint on
    disk; emits shell exports; fails loudly when none qualify."""
    import json
    import subprocess
    import sys

    art = tmp_path
    def write(name, corr, span, ckpt_rel):
        (art / name).write_text(json.dumps(
            {"val_pred_gt_corr": corr, "val_pred_min_max": [20, 20 + span]}))
        p = art / ckpt_rel
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_bytes(b"x")

    env = {**os.environ, "PRV4_ART": str(art)}
    script = os.path.join(os.path.dirname(__file__), "..", "experiments",
                          "pick_predictor.py")

    # nothing qualifies -> exit 1
    r = subprocess.run([sys.executable, script], env=env, capture_output=True,
                       text=True)
    assert r.returncode == 1

    # only r3 atto qualifies
    write("prvnet_r3.json", 0.73, 19, "prvnet_r3_ckpt/best_checkpoint.msgpack")
    r = subprocess.run([sys.executable, script], env=env, capture_output=True,
                       text=True)
    assert r.returncode == 0
    assert "PRV4_ARCH=convnextv2_atto" in r.stdout
    assert "PRV4_GATE_ARTIFACT=prvnet_r3.json" in r.stdout

    # a better tiny720 takes over
    write("prvnet_tiny720.json", 0.8, 15,
          "prvnet_tiny720_ckpt/best_checkpoint.msgpack")
    r = subprocess.run([sys.executable, script], env=env, capture_output=True,
                       text=True)
    assert "PRV4_ARCH=convnextv2_tiny" in r.stdout
    assert "PRV4_CROP=720" in r.stdout

    # a degenerate tiny720 (high corr, no span) would NOT take over
    write("prvnet_tiny720.json", 0.9, 1,
          "prvnet_tiny720_ckpt/best_checkpoint.msgpack")
    r = subprocess.run([sys.executable, script], env=env, capture_output=True,
                       text=True)
    assert "PRV4_ARCH=convnextv2_atto" in r.stdout
