#!/usr/bin/env python3
"""Consolidate the PRVNet scaling measurements into one artifact.

Two axes were actually measured across rounds 3-5 (every point trains on
the SAME pinned 27-object val split, so val L1 / corr are comparable):

- corpus size (same recipe, convnextv2_atto@180, two-stage):
    r3  @ 86 train objects   vs   r5 @ 90 train objects
- architecture x resolution (same 90-object corpus):
    atto@180, tiny@180, tiny@720 (the reference config, 800-epoch
    protocol ≙ PRVNet/train_regression.py:258-260,497-500)

The honest read, recorded below: the corpus-size axis is FLAT between 86
and 90 (delta val L1 +0.046 is far inside the ±~0.3 seed noise measured
on this split) — 4 extra objects do not move a 28M-param predictor, so
the scaling *curve* needs the corpus growth that phase B was budgeted
for; the architecture axis shows the reference config (tiny@720) best on
val L1 (2.854) and tiny@180 best on corr (0.7425), consistent with the
pool-collapse account (exp_pool_collapse.py): resolution helps once the
800-epoch protocol escapes the init-time mean-pool feature collapse.

CPU-only; reads existing artifacts, writes artifacts/prvnet_scaling_curve.json.
"""
import json
import os

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def _j(name):
    p = os.path.join(ART, name)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def _point(art, round_tag, n_train_override=None):
    if art is None:
        return None
    return {
        "round": round_tag,
        "arch": art.get("arch"),
        "image_size": art.get("image_size"),
        "n_train": n_train_override or art.get("n_train"),
        "n_val": art.get("n_val"),
        "epochs": art.get("epochs"),
        "val_l1": art.get("best_val_l1_mean"),
        "val_acc": art.get("best_val_accuracy"),
        "val_corr": art.get("val_pred_gt_corr"),
    }


def main():
    corpus_axis = [p for p in (
        _point(_j("prvnet_r3.json"), "r3"),
        _point(_j("prvnet_r5_scaling.json"), "r5"),
    ) if p]
    arch_axis = [p for p in (
        _point(_j("prvnet_r5_scaling.json"), "r5"),
        _point(_j("prvnet_tiny180.json"), "r5"),
        _point(_j("prvnet_tiny720.json"), "r5"),
    ) if p]

    out = {
        "val_split": "pinned r3 27-object split (comparable across all points)",
        "corpus_size_axis_same_recipe": corpus_axis,
        "arch_resolution_axis_same_corpus": arch_axis,
        "reading": (
            "corpus axis FLAT 86->90 train (dL1 +0.046 « seed noise): "
            "label spend has not yet reached the scale that moves the "
            "predictor; arch axis: tiny@720 (reference config) best val "
            "L1 2.854, tiny@180 best corr 0.7425 — resolution pays only "
            "under the 800-epoch protocol that escapes init pool collapse"
        ),
    }
    path = os.path.join(ART, "prvnet_scaling_curve.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
