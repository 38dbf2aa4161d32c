#!/usr/bin/env python3
"""Round-3 flagship: ~120-object wide-label PRV dataset + PRVNet retrain.

VERDICT r2 item 1 (the highest-leverage item): round 2's 24-object dataset
confined labels to [25,33] and produced a constant-30 predictor.  This run
generates 120 procedural objects (12 families x 10, hardness-swept — see
families.py; `nos`/`fan` are the pilot-2 tail anchors) through the full label protocol (modes 0->3->4->lognormal
fit->gradient@0.02), builds the mode-5 statistics table and the mode-6
dataset with the holdout split (>=15 val objects), then retrains PRVNet
with the two-stage recipe (pretrain -> encoder-init regression,
≙ --pre_train/--premodel_file, train_regression.py:578-581,617-630) and
records the kill-criterion metrics: prediction-vs-GT correlation and
per-object prediction spread on val (a constant predictor has r~0, std~0).

Shares /tmp/prv3_ws with exp_label_spread.py; every stage is guarded by
the pipeline's idempotence checks (≙ size.txt/N.json/metrics resume
guards, main.cpp:851-964, 2351-2352, 2472-2473) so the run is resumable
and the pilot's 17 objects are reused verbatim.

  nohup python -u experiments/exp_dataset100.py > /tmp/dataset100.log 2>&1 &

Phases (each flushes its artifact incrementally):
  A  labels for 120 objects          -> artifacts/dataset100_labels.json
  B  mode-5 stats + mode-6 dataset   -> artifacts/dataset100_stats.json
  C  two-stage PRVNet retrain        -> artifacts/prvnet_r3.json + ckpts
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
    "PRV3_ART",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts"))
PER_FAMILY = int(os.environ.get("PRV3_PER_FAMILY", 10))  # 12 families x 10
ARCH = "convnextv2_atto"  # measured-feasible on the tunneled chip;
CROP = int(os.environ.get("PRV3_CROP", 180))  # tiny@720 rate: exp_tiny720.py
PRETRAIN_EPOCHS = int(os.environ.get("PRV3_PRETRAIN_EPOCHS", 2))
                     # r2 measured ~3.7 s/step through the tunnel; at 120
                     # objects (64 samples each) 2 epochs sees 3x the total
                     # samples of r2's measured 3-epoch win
EPOCHS = int(os.environ.get("PRV3_EPOCHS", 40))
             # with the pretrained encoder r2 converged by epoch 15 of ~2.4
             # steps each; 40 epochs x ~11 steps is generous headroom
WS = os.environ.get("PRV3_WS")  # override workspace (CPU dry-runs)


def phase_a_labels(cfg, names):
    """Modes 3 -> 4 -> fit per object, incremental artifact flush."""
    from families import make_family_object
    from nerf_prv_tpu.labeling.labels import parse_label_file
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.pipeline import modes
    from nerf_prv_tpu.pipeline.coverage import get_coverage
    from nerf_prv_tpu.scene.object_setup import load_object

    model_dir = os.path.join(ROOT, "models", "ShapeNet")
    for name in names:
        make_family_object(name, model_dir)

    counts = [n for n in modes._coverage_counts(cfg) if n != 100]
    modes.mode_view_cover(cfg, sizes=counts + [64, 100])

    out_path = os.path.join(ART, "dataset100_labels.json")
    prev = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            prev = json.load(f).get("objects", {})

    nerf_cfg = NerfConfig(n_steps=cfg.n_steps)
    objects, times = dict(prev), {}
    for i, name in enumerate(names):
        t0 = time.perf_counter()
        obj_cfg = cfg.replace(name_of_pcd=name)
        label_path = os.path.join(obj_cfg.gt_path, "label.txt")
        fresh = not os.path.exists(label_path)
        modes.mode_get_coverage(cfg, [name])
        scene = load_object(obj_cfg, name)
        if scene.ok:  # 64-view PVB input space (≙ pvb_dataset images)
            get_coverage(scene, obj_cfg, 64)
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
            "distinct_labels": sorted({o["label"] for o in objects.values()
                                       if o["label"] > 0}),
            "n_done": len(objects),
            "seconds_per_object_median": (round(float(np.median(fresh_times)), 1)
                                          if fresh_times else None),
            "seconds_per_object": times,
        }
        os.makedirs(ART, exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(artifact, f, indent=1)
    return objects


def _jsonable(o):
    """Recursively convert numpy scalars (incl. dict KEYS — int64 keys make
    json.dump raise) so the artifact always serializes."""
    if isinstance(o, dict):
        return {(int(k) if isinstance(k, np.integer) else k): _jsonable(v)
                for k, v in o.items()}
    if isinstance(o, (list, tuple)):
        return [_jsonable(v) for v in o]
    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    return o


def phase_b_dataset(cfg, names):
    from nerf_prv_tpu.pipeline import modes

    stats = modes.mode_read_label(cfg, names)  # mode 5 (≙ main.cpp:2490-2638)
    info = modes.mode_get_dataset(cfg, names, split="holdout")
    labels = {k: int(v) for k, v in info["labels"].items()}
    artifact = {
        "stats": stats,
        "n_objects": len(names),
        "n_train": len(info["train"]),
        "n_val": len(info["val"]),
        "val": sorted(info["val"]),
        "label_min": min(labels.values()),
        "label_max": max(labels.values()),
        "distinct_labels": len(set(labels.values())),
    }
    with open(os.path.join(ART, "dataset100_stats.json"), "w") as f:
        json.dump(_jsonable(artifact), f, indent=1)
    print(json.dumps({k: v for k, v in artifact.items() if k != "stats"}),
          flush=True)
    return info


def phase_c_train(cfg, info):
    from nerf_prv_tpu.parallel.mesh import make_mesh
    from nerf_prv_tpu.prvnet import TrainConfig, train_regression
    from nerf_prv_tpu.prvnet.data import PVBDataset
    from nerf_prv_tpu.prvnet.model import IMG_PATTERN
    from nerf_prv_tpu.prvnet.train import (
        init_model, load_checkpoint, make_eval_step, pad_to_multiple, pretrain,
    )

    ds_root = os.path.join(cfg.workspace, "pvb_dataset")
    train_split = os.path.join(ds_root, "train_split.txt")
    val_split = os.path.join(ds_root, "val_split.txt")
    mesh = make_mesh()

    # stage 1: single-view pretrain (≙ --pre_train)
    pre_dir = os.path.join(ART, "prvnet_r3_pretrain_ckpt")
    pre_cfg = TrainConfig(arch=ARCH, batch_size=32, epochs=PRETRAIN_EPOCHS,
                          image_size=CROP)
    t0 = time.perf_counter()
    _, pre_best = pretrain(ds_root, train_split, val_split, cfg=pre_cfg,
                           checkpoint_dir=pre_dir, log_every=2, mesh=mesh)
    t_pre = time.perf_counter() - t0

    # stage 2: K-view regression from the pretrained encoder
    tcfg = TrainConfig(arch=ARCH, batch_size=8, epochs=EPOCHS, image_size=CROP)
    ckpt_dir = os.path.join(ART, "prvnet_r3_ckpt")
    t0 = time.perf_counter()
    params, best = train_regression(
        ds_root, train_split, val_split, cfg=tcfg, pattern=IMG_PATTERN[4],
        checkpoint_dir=ckpt_dir, log_every=5, mesh=mesh,
        premodel_file=os.path.join(pre_dir, "best_pretrain_checkpoint.msgpack"),
    )
    t_train = time.perf_counter() - t0

    # ---- kill-criterion metrics on val: per-object preds, corr, spread ----
    best_params, _ = load_checkpoint(os.path.join(ckpt_dir,
                                                  "best_checkpoint.msgpack"))
    model, _ = init_model(tcfg, len(IMG_PATTERN[4]))
    predict = make_eval_step(model, tcfg, mesh)
    ds = PVBDataset(ds_root, val_split, IMG_PATTERN[4], crop=CROP)
    n_dev = mesh.devices.size
    preds, gts = [], []
    for views, labels in ds.batches(tcfg.batch_size):
        views, n_real = pad_to_multiple(views, n_dev)
        preds.extend(np.asarray(predict(best_params, views))[:n_real].tolist())
        gts.extend(np.asarray(labels).tolist())
    preds, gts = np.asarray(preds), np.asarray(gts, dtype=np.float64)
    corr = (float(np.corrcoef(preds, gts)[0, 1])
            if preds.std() > 1e-9 and gts.std() > 1e-9 else 0.0)

    artifact = {
        "arch": ARCH,
        "image_size": CROP,
        "n_train": len(info["train"]),
        "n_val": len(info["val"]),
        "pretrain_epochs": PRETRAIN_EPOCHS,
        "pretrain_best_l1": round(pre_best["l1_mean"], 3),
        "pretrain_seconds": round(t_pre, 1),
        "epochs": EPOCHS,
        "best_val_accuracy": round(best["accuracy"], 4),
        "best_val_l1_mean": round(best["l1_mean"], 3),
        "best_val_l1_std": round(best["l1_std"], 3),
        "train_seconds": round(t_train, 1),
        "val_pred_gt_corr": round(corr, 4),
        "val_pred_std": round(float(preds.std()), 3),
        "val_gt_std": round(float(gts.std()), 3),
        "val_pred_min_max": [round(float(preds.min()), 1),
                             round(float(preds.max()), 1)],
        "val_per_object": {n: {"pred": round(float(p), 2), "gt": int(g)}
                           for n, p, g in zip(ds.names, preds, gts)},
        "checkpoint": os.path.join(ckpt_dir, "best_checkpoint.msgpack"),
    }
    with open(os.path.join(ART, "prvnet_r3.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps(artifact), flush=True)


def main():
    import argparse

    from families import object_roster

    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", default="all", choices=["a", "b", "c", "all"],
                    help="b/c restrict the roster to objects whose labels "
                         "phase A already recorded, so a truncated (but "
                         ">=100-object) phase A still yields a dataset")
    args = ap.parse_args()

    cfg = pipeline_config()
    if WS:
        cfg = cfg.replace(workspace=os.path.join(WS, "ws"),
                          model_path=os.path.join(WS, "models"),
                          viewspace_path=os.path.join(WS, "ws", "viewspace"))
    # index-major order (uni0, ell0, ..., fan0, uni1, ...): if the run is
    # cut short, every family is still represented at every completed
    # hardness step, so the dataset stays usable from ~60 objects up
    roster = object_roster(PER_FAMILY)
    names = [n for i in range(PER_FAMILY)
             for n in roster if int(n[3:]) == i]
    if args.phase in ("a", "all"):
        phase_a_labels(cfg, names)
    if args.phase in ("b", "c", "all"):
        with open(os.path.join(ART, "dataset100_labels.json")) as f:
            done = json.load(f)["objects"]
        names = [n for n in names if n in done]
        info = phase_b_dataset(cfg, names)
        if args.phase in ("c", "all"):
            phase_c_train(cfg, info)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
