#!/usr/bin/env python3
"""Round-4 PRVNet training: the REFERENCE configuration + the scaling curve.

VERDICT r3 next-steps #3-#4:

  --phase tiny   ConvNeXtV2-tiny @ CenterCrop(720), EFFECTIVE batch 64 via
                 8x gradient accumulation (micro-batch 8, the measured
                 compile-safe size — artifacts/tiny720.json), two-stage
                 (single-view pretrain -> encoder-init regression), trained
                 to convergence on the hd (1280x720) dataset
                 (≙ train_regression.py:258-260,497-500 exactly).
  --phase atto   the round-3 recipe (atto@180, qcam images) re-run on the
                 EXPANDED train split with the SAME fixed val set, so val
                 L1/accuracy are directly comparable across dataset scales:
                 r2 24 objects -> r3 86 train (L1 2.93, corr 0.73) -> r4.

Artifacts: prvnet_tiny720.json + prvnet_tiny720_ckpt/ (phase tiny),
prvnet_scaling.json + prvnet_r4_ckpt/ (phase atto).

  nohup python -u experiments/exp_prvnet_r4.py --phase tiny > /tmp/tiny720_train.log 2>&1 &
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from exp_dataset300 import HD_VIEWS
from exp_label_spread import ROOT

ART = os.environ.get(
    "PRV4_ART",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts"))


def _val_metrics(tcfg, ckpt_dir, ds_root, val_split, pattern, mesh):
    """Per-object val predictions + corr/spread (the r3 kill criteria)."""
    from nerf_prv_tpu.parallel.mesh import pad_to_multiple
    from nerf_prv_tpu.prvnet.data import PVBDataset
    from nerf_prv_tpu.prvnet.train import (
        init_model, load_checkpoint, make_eval_step,
    )

    best_params, _ = load_checkpoint(
        os.path.join(ckpt_dir, "best_checkpoint.msgpack"))
    model, _ = init_model(tcfg, len(pattern), image_size=64)
    predict = make_eval_step(model, tcfg, mesh)
    ds = PVBDataset(ds_root, val_split, pattern, crop=tcfg.image_size)
    n_dev = mesh.devices.size
    preds, gts = [], []
    for views, labels in ds.batches(tcfg.micro_batch):
        views, n_real = pad_to_multiple(views, n_dev)
        preds.extend(np.asarray(predict(best_params, views))[:n_real].tolist())
        gts.extend(np.asarray(labels).tolist())
    preds, gts = np.asarray(preds), np.asarray(gts, dtype=np.float64)
    corr = (float(np.corrcoef(preds, gts)[0, 1])
            if preds.std() > 1e-9 and gts.std() > 1e-9 else 0.0)
    return {
        "val_pred_gt_corr": round(corr, 4),
        "val_pred_std": round(float(preds.std()), 3),
        "val_gt_std": round(float(gts.std()), 3),
        "val_pred_min_max": [round(float(preds.min()), 1),
                             round(float(preds.max()), 1)],
        "val_per_object": {n: {"pred": round(float(p), 2), "gt": int(g)}
                           for n, p, g in zip(ds.names, preds, gts)},
    }


def run_two_stage(arch, crop, ds_root, tag, batch_size, accum_steps,
                  pretrain_epochs, epochs, pretrain_batch=None,
                  pretrain_accum=None, viewspace_size=64):
    from nerf_prv_tpu.parallel.mesh import make_mesh
    from nerf_prv_tpu.prvnet import TrainConfig, train_regression
    from nerf_prv_tpu.prvnet.model import IMG_PATTERN
    from nerf_prv_tpu.prvnet.train import pretrain

    train_split = os.path.join(ds_root, "train_split.txt")
    val_split = os.path.join(ds_root, "val_split.txt")
    n_train = len(open(train_split).read().split())
    n_val = len(open(val_split).read().split())
    mesh = make_mesh()

    pre_dir = os.path.join(ART, f"{tag}_pretrain_ckpt")
    # The pretrain stage substitutes for the reference's pretrained
    # encoder (ImageNet/FCMAE weights are unavailable in the zero-egress
    # env).  At 1/100th the reference's sample count, the reference's
    # FINE-TUNING lr (blr 1.5e-4 -> 3.75e-5) only drifts: measured this
    # round, from-scratch tiny@720 moved train loss 5.51->5.16 in 700
    # steps (~constant-predictor level).  So pretrain runs hotter with
    # the warmup+cosine schedule the reference defines (dormant,
    # train_regression.py:446-449); the REGRESSION stage keeps the
    # reference's exact constant-lr config.
    pre_cfg = TrainConfig(
        arch=arch, batch_size=pretrain_batch or batch_size,
        accum_steps=pretrain_accum or accum_steps,
        epochs=pretrain_epochs, image_size=crop,
        blr=float(os.environ.get("PRV4_PRETRAIN_BLR", "1.5e-3")),
        use_schedule=os.environ.get("PRV4_PRETRAIN_SCHEDULE", "1") == "1",
        warmup_epochs=max(pretrain_epochs // 20, 2),
    )
    t0 = time.perf_counter()
    _, pre_best = pretrain(ds_root, train_split, val_split, cfg=pre_cfg,
                           checkpoint_dir=pre_dir, log_every=1, mesh=mesh,
                           viewspace_size=viewspace_size)
    t_pre = time.perf_counter() - t0

    # regression defaults = the reference's exact config (constant
    # blr 1.5e-4, no schedule); the env knobs exist so a TUNED arm can
    # run under a different tag without code edits, clearly labeled in
    # its artifact
    tcfg = TrainConfig(arch=arch, batch_size=batch_size,
                       accum_steps=accum_steps, epochs=epochs,
                       image_size=crop,
                       blr=float(os.environ.get("PRV4_REG_BLR", "1.5e-4")),
                       use_schedule=os.environ.get(
                           "PRV4_REG_SCHEDULE", "0") == "1")
    ckpt_dir = os.path.join(ART, f"{tag}_ckpt")
    t0 = time.perf_counter()
    _, best = train_regression(
        ds_root, train_split, val_split, cfg=tcfg, pattern=IMG_PATTERN[4],
        checkpoint_dir=ckpt_dir, log_every=2, mesh=mesh,
        premodel_file=os.path.join(pre_dir, "best_pretrain_checkpoint.msgpack"),
    )
    t_train = time.perf_counter() - t0

    artifact = {
        "arch": arch,
        "encoder_init": "pvb_pretrain",  # ImageNet weights unavailable in
        # the zero-egress env; the torch->Flax ImageNet converter exists
        # (prvnet/infer.py:load_pretrained_encoder) but has no checkpoint
        # to load, so the single-view PVB pretrain stage provides the
        # encoder init (two-stage, ≙ --pre_train + --premodel_file)
        "image_size": crop,
        "viewspace_size": viewspace_size,
        "batch_size": batch_size,
        "accum_steps": accum_steps,
        "blr": tcfg.blr,
        "use_schedule": tcfg.use_schedule,
        "pretrain_blr": pre_cfg.blr,
        "pretrain_schedule": pre_cfg.use_schedule,
        "n_train": n_train,
        "n_val": n_val,
        "pretrain_epochs": pretrain_epochs,
        "pretrain_best_l1": round(pre_best["l1_mean"], 3),
        "pretrain_seconds": round(t_pre, 1),
        "epochs": epochs,
        "best_val_accuracy": round(best["accuracy"], 4),
        "best_val_l1_mean": round(best["l1_mean"], 3),
        "best_val_l1_std": round(best["l1_std"], 3),
        "train_seconds": round(t_train, 1),
        "checkpoint": os.path.join(ckpt_dir, "best_checkpoint.msgpack"),
    }
    artifact.update(
        _val_metrics(tcfg, ckpt_dir, ds_root, val_split, IMG_PATTERN[4], mesh))
    return artifact


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", required=True, choices=["tiny", "tiny180", "atto"])
    ap.add_argument("--epochs", type=int, default=None)
    args = ap.parse_args()
    ws = os.path.join(ROOT, "ws")

    if args.phase == "tiny":
        # PRV4_TINY_TAG gives a later corpus extension a FRESH scaling
        # point (new ckpt dir + artifact) instead of auto-resuming the
        # first tiny720 best checkpoint
        tiny_tag = os.environ.get("PRV4_TINY_TAG", "prvnet_tiny720")
        # STEP-COUNT reality (round-4 postmortem): at 90 train objects,
        # effective batch 64 is ONE optimizer application per epoch, so
        # "epochs" ~= optimizer steps.  Round 4 ran 34 steps at lr 3.75e-5
        # on a 28M-param from-scratch encoder — flat by construction.  The
        # reference default is --epochs 800 (train_regression.py:260);
        # with the device-resident trainer an epoch is seconds, so run the
        # actual reference protocol.  Pretrain gets ~22 steps/epoch
        # (1440 single-view samples / 64), so 100 epochs ~= 2200 steps.
        art = run_two_stage(
            arch="convnextv2_tiny", crop=720,
            ds_root=os.path.join(ws, "pvb_dataset_hd"), tag=tiny_tag,
            batch_size=64, accum_steps=8,          # ≙ batch 64 (8x8 micro)
            pretrain_epochs=int(os.environ.get(
                "PRV4_TINY_PRETRAIN_EPOCHS", "100")),
            epochs=args.epochs or 800,             # ≙ --epochs default
            # the hd set is HD_VIEWS wide (regen-cost tradeoff recorded in
            # exp_dataset300.HD_VIEWS); pattern [0..4] is a strict subset
            viewspace_size=HD_VIEWS,
        )
        out = os.path.join(ART, f"{tiny_tag}.json")
    elif args.phase == "tiny180":
        # the reference ARCHITECTURE at the r3-PROVEN input geometry:
        # convnextv2_tiny on the qcam 320x180 dataset (CenterCrop 180).
        # Motivation: exp_pool_collapse.py — at 720 the global mean pool
        # averages 529 patch vectors and the per-object signal dilutes
        # below what 90-sample training escapes; at 180 (36 positions)
        # the same encoder family demonstrably discriminates (r3 atto
        # corr 0.73).  Regression keeps the reference's exact optimizer
        # config (constant blr 1.5e-4, batch 64).
        tag = os.environ.get("PRV4_TINY180_TAG", "prvnet_tiny180")
        art = run_two_stage(
            arch="convnextv2_tiny", crop=180,
            ds_root=os.path.join(ws, "pvb_dataset"), tag=tag,
            batch_size=64, accum_steps=1, pretrain_batch=64,
            pretrain_epochs=int(os.environ.get(
                "PRV4_TINY180_PRETRAIN_EPOCHS", "50")),
            epochs=args.epochs or 800,
        )
        out = os.path.join(ART, f"{tag}.json")
    else:
        # PRV4_ATTO_TAG lets the end-of-queue corpus extension train a FRESH
        # scaling point (new ckpt dir + artifact) instead of resuming the
        # 240-corpus best — the scaling curve needs independent points
        tag = os.environ.get("PRV4_ATTO_TAG", "prvnet_r4")
        art = run_two_stage(
            arch="convnextv2_atto", crop=180,
            ds_root=os.path.join(ws, "pvb_dataset"), tag=tag,
            batch_size=8, accum_steps=1,           # the r3 recipe verbatim
            pretrain_batch=32, pretrain_epochs=2, epochs=args.epochs or 40,
        )
        art["scaling_reference"] = {
            "r2_24_objects": {"note": "constant predictor, corr ~0"},
            "r3_86_train": {"best_val_l1_mean": 2.927, "val_pred_gt_corr": 0.7265,
                            "best_val_accuracy": 0.2222},
        }
        name = "prvnet_scaling" if tag == "prvnet_r4" else f"{tag}_scaling"
        out = os.path.join(ART, f"{name}.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps({k: v for k, v in art.items() if k != "val_per_object"}),
          flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
