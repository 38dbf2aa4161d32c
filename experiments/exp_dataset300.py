#!/usr/bin/env python3
"""Round-4 dataset scale-up + mode-7 test-pool labeling.

VERDICT r3 "What's missing #1" / next-steps #4-#5: the labeled corpus must
grow beyond 120 objects and mode-7 must run at >=100 held-out,
val-distribution-matched objects.  This driver:

  Phase R  regenerates the ROUND-3 corpus's images (the /tmp workspace does
           not survive rounds; objects are deterministic — families.py seeds
           the rng from the object name — so the PLYs and coverage renders
           reproduce exactly).  Labels are NOT recomputed: they are reused
           from the committed round-3 artifact (dataset100_labels.json),
           which is the honest record of the measured protocol.
  Phase A  labels NEW objects (families indices 10..19, index-major) through
           the identical round-3 protocol (320x180, n_steps=1200, counts
           3..47 step 4 + 100, gradient@0.02) until PRV4_DEADLINE_MIN of
           wall clock is spent — every object flushes incrementally, so a
           truncated run still yields a usable pool.
  Phase B  assembles the expanded pvb_dataset: the new labeled objects that
           match_distribution selects as the mode-7 test set are EXCLUDED
           from train/val (no leakage); the round-3 val split is kept FIXED
           so predictor metrics stay comparable across rounds; every other
           new object joins train.

Artifacts: dataset300_labels.json (phase A), dataset300_stats.json (phase B,
incl. the frozen mode-7 test roster consumed by exp_mode7_r4.py).

  nohup python -u experiments/exp_dataset300.py > /tmp/dataset300.log 2>&1 &
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from exp_label_spread import ROOT, pipeline_config

ART = os.environ.get(
    "PRV4_ART",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts"))
# stop labeling new objects once this much wall clock is spent in phase A
DEADLINE_MIN = float(os.environ.get("PRV4_DEADLINE_MIN", 255))
# 12 families x indices [10, PRV4_INDEX_END): default 120 new candidates
# (corpus 240); the end-of-queue extension raises PRV4_INDEX_END to 25
# (corpus 300) once the evaluation jobs are done — safe because phase B
# pins the test roster after its first freeze.
NEW_INDICES = range(10, int(os.environ.get("PRV4_INDEX_END", 20)))
N_TEST = int(os.environ.get("PRV4_N_TEST", 100))
LEGACY_LABELS = os.path.join(ART, "dataset100_labels.json")
LEGACY_STATS = os.path.join(ART, "dataset100_stats.json")


def legacy_corpus():
    with open(LEGACY_LABELS) as f:
        objs = json.load(f)["objects"]
    with open(LEGACY_STATS) as f:
        val = json.load(f)["val"]
    return objs, val


def new_roster():
    from families import FAMILIES

    return [f"{fam}{i}" for i in NEW_INDICES for fam in FAMILIES]


def _pvb_cfg(cfg):
    """The PVB input spaces (64-view dataset images, 5-view infer images)
    ALSO render at the PRODUCTION camera (1280x720) into ``<gt_path>/hd/``
    so CenterCrop(720) sees the reference's image geometry
    (≙ train_regression.py:497-505, infer_server.py:47-50).  The reduced
    320x180 sets keep their round-3 paths: the atto@180 scaling-curve
    retrains stay byte-comparable with round 3, while tiny@720 (the
    reference config) consumes the hd set."""
    from nerf_prv_tpu.core.config import CameraConfig

    return cfg.replace(camera=CameraConfig())


# The hd (1280x720) training view space is HD_VIEWS wide, not 64: the
# regression stage reads only pattern [0..4] (≙ train_regression.py:237,
# IMG_PATTERN[4]) and the single-view pretrain treats each view as an
# independent sample, so 16 well-spread views keep 16x120 ≈ 1900 pretrain
# samples while cutting the dominant regen cost (64x1280x720x4 ≈ 236 MB
# of tunnel transfer per object) by 4x.  The qcam (320x180) dataset keeps
# the full 64-view reference format.  Recorded in every artifact that
# trains on the hd set.
HD_VIEWS = int(os.environ.get("PRV4_HD_VIEWS", 16))


def _render_pvb_sets(scene, obj_cfg, hd_train=True):
    """``hd_train=False`` defers the expensive 1280x720 training-set render
    (phase A labels every new object but only the ones that join the TRAIN
    split need hd/HD_VIEWS; phase B renders it for exactly those)."""
    from nerf_prv_tpu.pipeline.coverage import get_coverage

    get_coverage(scene, obj_cfg, 64)   # qcam (round-3 protocol, atto arm)
    hd_cfg = _pvb_cfg(obj_cfg)
    hd = os.path.join(obj_cfg.gt_path, "hd")
    if hd_train:
        get_coverage(scene, hd_cfg, HD_VIEWS, gt_path=hd)  # tiny@720 arm
    get_coverage(scene, hd_cfg, 5, gt_path=hd)             # live-infer init


def _pvb_done(obj_cfg, hd_train=True):
    gp = obj_cfg.gt_path
    want = ["64.json", os.path.join("hd", "5.json")]
    if hd_train:
        want.append(os.path.join("hd", f"{HD_VIEWS}.json"))
    return all(os.path.exists(os.path.join(gp, p)) for p in want)


def phase_r_regen(cfg, names):
    """PLY + 64-view (dataset) + 5-view (infer) coverage for legacy objects."""
    from families import make_family_object
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.scene.object_setup import load_object

    model_dir = os.path.join(ROOT, "models", "ShapeNet")
    counts = [n for n in modes._coverage_counts(cfg) if n != 100]
    modes.mode_view_cover(cfg, sizes=counts + [5, 64, 100])
    t0 = time.perf_counter()
    for i, name in enumerate(names):
        obj_cfg = cfg.replace(name_of_pcd=name)
        # cheap restart: skip before the ~8 s mesh synthesis AND load_object
        # (the PLY check keeps later phases' load_object working)
        if _pvb_done(obj_cfg) and \
                os.path.exists(os.path.join(model_dir, f"{name}.ply")):
            continue
        make_family_object(name, model_dir)
        scene = load_object(obj_cfg, name)
        if not scene.ok:
            print(f"[regen] {name}: load FAILED", flush=True)
            continue
        _render_pvb_sets(scene, obj_cfg)
        if (i + 1) % 20 == 0:
            print(f"[regen] {i+1}/{len(names)} "
                  f"({time.perf_counter()-t0:.0f}s)", flush=True)
    print(f"[regen] done {len(names)} in {time.perf_counter()-t0:.0f}s",
          flush=True)


def phase_a_labels(cfg, names, deadline_min):
    """Round-3 label protocol for new objects, deadline-bounded."""
    from families import make_family_object
    from nerf_prv_tpu.labeling.labels import parse_label_file
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.scene.object_setup import load_object

    model_dir = os.path.join(ROOT, "models", "ShapeNet")
    counts = [n for n in modes._coverage_counts(cfg) if n != 100]
    modes.mode_view_cover(cfg, sizes=counts + [5, 64, 100])

    out_path = os.path.join(ART, "dataset300_labels.json")
    objects, times = {}, {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f)
        objects = prev.get("objects", {})
        times = prev.get("seconds_per_object", {})

    nerf_cfg = NerfConfig(n_steps=cfg.n_steps)
    # The budget is CUMULATIVE labeling minutes already invested in this
    # corpus (sum of per-object wall seconds persisted in the artifact):
    # restart-proof (a watchdog relaunch does not reset it) and
    # session-proof (a wall-clock anchor would go stale across VM
    # restarts and zero the next session's budget).  deadline_min thus
    # means "stop once this much total labeling work exists".
    prev_meta = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev_meta = json.load(f)
    for i, name in enumerate(names):
        spent_min = sum(times.values()) / 60.0
        if name not in objects and spent_min > deadline_min:
            print(f"[labels] budget spent ({spent_min:.0f} min) after "
                  f"{len(objects)} objects", flush=True)
            break
        obj_cfg = cfg.replace(name_of_pcd=name)
        if name in objects and _pvb_done(obj_cfg, hd_train=False):
            continue  # cheap restart: fully done, skip all setup
        t0 = time.perf_counter()
        make_family_object(name, model_dir)
        label_path = os.path.join(obj_cfg.gt_path, "label.txt")
        fresh = name not in objects
        modes.mode_get_coverage(cfg, [name])
        scene = load_object(obj_cfg, name)
        if scene.ok:
            _render_pvb_sets(scene, obj_cfg, hd_train=False)
        modes.mode_instant_ngp(cfg, [name], nerf_cfg=nerf_cfg)
        modes.mode_fit_labels(cfg, [name])
        res = parse_label_file(label_path)
        label = int(res.gradient_labels[1])  # gradient@0.02 (≙ main.cpp:2641)
        objects[name] = {"label": label, "converged": bool(res.converged)}
        dt = round(time.perf_counter() - t0, 1)
        if fresh:
            times[name] = dt
        print(f"[{i+1}/{len(names)}] {name}: label={label} "
              f"converged={res.converged} ({dt}s)", flush=True)
        fresh_times = [t for t in times.values() if t > 5]
        artifact = {
            "objects": objects,
            "n_done": len(objects),
            "distinct_labels": sorted({o["label"] for o in objects.values()
                                       if o["label"] > 0}),
            "seconds_per_object_median": (round(float(np.median(fresh_times)), 1)
                                          if fresh_times else None),
            "seconds_per_object": times,
        }
        os.makedirs(ART, exist_ok=True)
        # atomic replace: a crash mid-write must not truncate the labels
        # file every restart depends on
        tmp = out_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(artifact, f, indent=1)
        os.replace(tmp, out_path)
    return objects


def select_roster(prev_test, ever_trained, new_lab, val_labels,
                  n_test, seed, consumed, trained_on_disk=()):
    """Leakage-safe mode-7 roster selection (unit-tested in
    tests/test_experiments.py):

    - once mode-7 has STARTED consuming the roster (``consumed``), every
      previously-rostered object is PINNED in test — its rows must stay
      out of all later train splits;
    - the roster may still GROW toward ``n_test``, but only with new
      objects that have NEVER been in a train split — an object a
      committed predictor trained on can never become a test object;
    - before consumption, a full re-match is allowed (a deadline-cut
      phase A must not freeze an undersized set), subject to the same
      never-trained constraint.

    Returns (test, ever_trained_updated)."""
    from nerf_prv_tpu.pipeline.compare import match_distribution

    ever = set(ever_trained) | {n for n in trained_on_disk if n in new_lab}
    ok_pool = all(n in new_lab for n in prev_test)
    if prev_test and consumed:
        # mode-7 rows exist: every previously-rostered object is pinned out
        # of train FOREVER, even if a relabel made it unusable (advisor r4:
        # a full re-match here would silently migrate surviving test
        # objects into train_new while their mode-7 rows persist).  Keep
        # the usable survivors in test, bar the dropped ones from train,
        # and grow around them.
        test = sorted(n for n in prev_test if n in new_lab)
        dropped = sorted(set(prev_test) - set(test))
        if dropped:
            print(f"[dataset] WARNING: {len(dropped)} consumed roster "
                  f"object(s) unusable after relabel, still barred from "
                  f"train: {dropped}", flush=True)
        print(f"[dataset] pinned test roster ({len(test)})", flush=True)
        if len(test) < n_test:
            growth_pool = {n: l for n, l in new_lab.items()
                           if n not in test and n not in ever
                           and n not in prev_test}
            if growth_pool:
                grown = match_distribution(
                    val_labels, growth_pool, n_test=n_test - len(test),
                    seed=seed)
                test = sorted(set(test) | set(grown))
                print(f"[dataset] roster grown to {len(test)} "
                      f"(+{len(grown)} never-trained)", flush=True)
        train_new = sorted(set(new_lab) - set(test) - set(prev_test))
        return test, sorted(ever | set(train_new))
    if prev_test and ok_pool and len(prev_test) >= n_test:
        test = sorted(prev_test)
        print(f"[dataset] pinned test roster ({len(test)})", flush=True)
    else:
        pool = {n: l for n, l in new_lab.items() if n not in ever}
        test = sorted(match_distribution(val_labels, pool, n_test=n_test,
                                         seed=seed))
    train_new = sorted(set(new_lab) - set(test))
    return test, sorted(ever | set(train_new))


def phase_b_dataset(cfg, legacy, legacy_val, new_objects):
    """Expanded dataset: legacy split kept, new minus the mode-7 test set."""
    from nerf_prv_tpu.labeling.dataset import (
        MAX_VIEWS, MIN_VIEWS, build_dataset,
    )
    from nerf_prv_tpu.labeling.labels import (
        LabelResult, N_GAPS, N_GRADIENTS, X_EVAL,
    )
    def usable(objs):
        return {n: o["label"] for n, o in objs.items()
                if o["converged"] and MIN_VIEWS <= o["label"] <= MAX_VIEWS}

    legacy_lab = usable(legacy)
    new_lab = usable(new_objects)
    val_labels = {n: legacy_lab[n] for n in legacy_val if n in legacy_lab}

    # frozen mode-7 roster: new objects matched to the FIXED r3 val split.
    # Once frozen (first phase-B run), the roster is PINNED: corpus
    # extensions only ever grow the train split, so mode-7/mode-21 results
    # computed against the roster stay valid (no post-hoc leakage).
    stats_path = os.path.join(ART, "dataset300_stats.json")
    prev_test, ever_trained = [], []
    if os.path.exists(stats_path):
        with open(stats_path) as f:
            prev_stats = json.load(f)
        prev_test = prev_stats.get("test", [])
        ever_trained = prev_stats.get("ever_trained_new", [])
    # belt-and-braces: any NEW object already sitting in an on-disk train
    # split was (or will be) seen by a committed predictor — it may never
    # migrate into the test roster, even if an older phase B predates the
    # ever_trained_new record
    trained_on_disk = []
    for ds in ("pvb_dataset", "pvb_dataset_hd"):
        split = os.path.join(cfg.workspace, ds, "train_split.txt")
        if os.path.exists(split):
            with open(split) as f:
                trained_on_disk.extend(f.read().split())
    consumed = os.path.exists(os.path.join(ART, "mode7_r4.json"))
    test, ever_trained = select_roster(
        prev_test, ever_trained, new_lab, val_labels, N_TEST, cfg.seed,
        consumed, trained_on_disk)
    train_new = sorted(set(new_lab) - set(test))

    # reconstruct minimal LabelResults: only converged + gradient[1] feed
    # select_labels/build_dataset; curves are not used downstream here
    def as_result(label, converged):
        grads = np.full(N_GRADIENTS, -1, dtype=np.int64)
        grads[1] = label
        return LabelResult(converged, np.zeros(len(X_EVAL)),
                           np.full(N_GAPS, -1, dtype=np.int64), grads)

    ds_names = sorted(legacy_lab) + train_new
    results = [as_result(legacy_lab.get(n, new_lab.get(n)), True)
               for n in ds_names]
    coverage_root = os.path.dirname(cfg.replace(name_of_pcd="x").gt_path)
    info = build_dataset(cfg.workspace, ds_names, results,
                         coverage_root=coverage_root, seed=cfg.seed,
                         split="holdout")
    # pin the r3 val split (comparability across rounds); everything else
    # in the dataset is train
    ds_root = os.path.join(cfg.workspace, "pvb_dataset")
    val = sorted(n for n in legacy_val if n in info["labels"])
    train = sorted(set(info["labels"]) - set(val))
    with open(os.path.join(ds_root, "train_split.txt"), "w") as f:
        f.write("\n".join(train) + "\n")
    with open(os.path.join(ds_root, "val_split.txt"), "w") as f:
        f.write("\n".join(val) + "\n")

    # render the deferred hd/64 sets for NEW objects that joined train
    # (phase A only rendered hd/5; test objects never need hd/64)
    from nerf_prv_tpu.pipeline.coverage import get_coverage
    from nerf_prv_tpu.scene.object_setup import load_object

    for name in sorted(info["labels"]):
        obj_cfg = cfg.replace(name_of_pcd=name)
        hd = os.path.join(obj_cfg.gt_path, "hd")
        if os.path.exists(os.path.join(hd, f"{HD_VIEWS}.json")):
            continue
        scene = load_object(obj_cfg, name)
        if scene.ok:
            get_coverage(scene, _pvb_cfg(obj_cfg), HD_VIEWS, gt_path=hd)
            print(f"[hd{HD_VIEWS}] rendered {name}", flush=True)

    # parallel hd dataset (1280x720 images) for the tiny@720 reference
    # config: same names, same labels.  An object whose hd/64 render is
    # incomplete (load failure, interrupted render) must NOT enter the hd
    # split files — a label with missing PNGs crashes the tiny trainer's
    # first epoch — so the hd splits are the qcam splits filtered to
    # complete objects, with every drop printed.
    hd_root = os.path.join(cfg.workspace, "pvb_dataset_hd")
    hd_ok = set()
    for name, label in info["labels"].items():
        obj_dir = os.path.join(hd_root, name)
        os.makedirs(obj_dir, exist_ok=True)
        src_dir = os.path.join(coverage_root, name, "hd", str(HD_VIEWS))
        n_linked = 0
        for j in range(HD_VIEWS):
            src = os.path.join(src_dir, f"rgbaClip_{j}.png")
            dst = os.path.join(obj_dir, f"rgbaClip_{j}.png")
            # a pre-existing dst may link to a DIFFERENT hd render (e.g. a
            # 64-view run before the HD_VIEWS=16 change — same index j,
            # different camera pose): validate identity, relink on mismatch
            # (advisor r4)
            if os.path.exists(dst) and (not os.path.exists(src)
                                        or os.path.samefile(src, dst)):
                n_linked += 1
            elif os.path.exists(src):
                if os.path.exists(dst):
                    os.remove(dst)
                os.link(src, dst)  # hardlink: zero extra bytes
                n_linked += 1
        # drop stale images from a larger earlier view space so the dir
        # matches the recorded viewspace_size (advisor r4)
        for stale in os.listdir(obj_dir):
            if stale.startswith("rgbaClip_") and stale.endswith(".png"):
                try:
                    j = int(stale[len("rgbaClip_"):-len(".png")])
                except ValueError:
                    continue
                if j >= HD_VIEWS:
                    os.remove(os.path.join(obj_dir, stale))
        with open(os.path.join(obj_dir, "view_budget.txt"), "w") as f:
            f.write(str(label))
        if n_linked == HD_VIEWS:
            hd_ok.add(name)
        else:
            print(f"[hd] DROPPED {name}: {n_linked}/{HD_VIEWS} images",
                  flush=True)
    for split_file in ("train_split.txt", "val_split.txt", "names_all.txt"):
        with open(os.path.join(ds_root, split_file)) as f:
            keep = [n for n in f.read().split() if n in hd_ok]
        with open(os.path.join(hd_root, split_file), "w") as f:
            f.write("\n".join(keep) + "\n")

    all_labels = {**legacy_lab, **new_lab}
    vals = np.array(sorted(all_labels.values()))
    uniq, cnt = np.unique(vals, return_counts=True)
    artifact = {
        "n_corpus": len(all_labels),
        "n_legacy": len(legacy_lab),
        "n_new": len(new_lab),
        "n_train": len(train),
        "n_val": len(val),
        "n_test": len(test),
        "test": test,
        "ever_trained_new": ever_trained,
        "val": val,
        "label_mean": round(float(vals.mean()), 2),
        "label_std": round(float(vals.std(ddof=1)), 2),
        "label_min": int(vals.min()),
        "label_max": int(vals.max()),
        "distinct_labels": int(len(uniq)),
        "label_distribution": {int(u): int(c) for u, c in zip(uniq, cnt)},
        # the val-derived mode/median/mean baselines live in mode7_r4.json
        # (stat_budgets), computed by exp_mode7_r4 at comparison time
    }
    with open(os.path.join(ART, "dataset300_stats.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items()
                      if k not in ("test", "val", "label_distribution")}),
          flush=True)
    return artifact


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all", choices=["r", "a", "b", "all"])
    args = ap.parse_args()

    cfg = pipeline_config()
    legacy, legacy_val = legacy_corpus()
    if args.phase in ("r", "all"):
        phase_r_regen(cfg, sorted(legacy))
    new_objects = {}
    if args.phase in ("a", "all"):
        new_objects = phase_a_labels(cfg, new_roster(), DEADLINE_MIN)
    if args.phase in ("b", "all"):
        if not new_objects:
            with open(os.path.join(ART, "dataset300_labels.json")) as f:
                new_objects = json.load(f)["objects"]
        phase_b_dataset(cfg, legacy, legacy_val, new_objects)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
