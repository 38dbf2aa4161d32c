#!/usr/bin/env python3
"""One-screen status of every round-4/5 deliverable (artifacts + queue logs).

Run anytime:  python experiments/r4_status.py
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


def main():
    d = _j("dataset300_labels.json")
    if d:
        spent = sum(d.get("seconds_per_object", {}).values()) / 60.0
        print(f"labels: {d['n_done']} new objects, "
              f"{len(d['distinct_labels'])} distinct, "
              f"median {d['seconds_per_object_median']}s/obj, "
              f"cumulative spend {spent:.0f} min "
              f"(PRV4_DEADLINE_MIN compares against this)")
    else:
        print("labels: not started")
    s = _j("dataset300_stats.json")
    if s:
        print(f"dataset: corpus {s['n_corpus']} (train {s['n_train']} / "
              f"val {s['n_val']} / test {s['n_test']}), "
              f"{s['distinct_labels']} distinct labels, "
              f"mean {s['label_mean']}±{s['label_std']}")
    else:
        print("dataset: phase B not run")
    t = _j("prvnet_tiny720.json")
    if t:
        print(f"tiny720: val L1 {t['best_val_l1_mean']}±{t['best_val_l1_std']} "
              f"acc {t['best_val_accuracy']} corr {t.get('val_pred_gt_corr')} "
              f"({t['train_seconds']:.0f}s train, {t['n_train']} objects)")
    else:
        print("tiny720: not trained")
    a = _j("prvnet_r5_scaling.json") or _j("prvnet_scaling.json")
    if a:
        print(f"atto scaling: val L1 {a['best_val_l1_mean']} "
              f"corr {a.get('val_pred_gt_corr')} (n_train {a['n_train']}; "
              f"r3 was L1 2.927 corr 0.7265 @ 86)")
    else:
        print("atto scaling: not trained")
    t180 = _j("prvnet_tiny180.json")
    if t180:
        print(f"tiny180: val L1 {t180['best_val_l1_mean']} "
              f"corr {t180.get('val_pred_gt_corr')} (n_train {t180['n_train']})")
    m7 = _j("mode7_r4.json")
    if m7:
        print(f"mode7: {m7['n_done']}/{m7['n_roster']} objects; "
              f"deltas: { {k: v['dPSNR_mean'] for k, v in m7['deltas'].items()} }")
    else:
        print("mode7: not run")
    al = _j("adam_lowp.json")
    if al:
        print(f"adam_lowp: {al.get('decision', 'running')[:100]}")
    else:
        print("adam_lowp: not run")
    rk = _j("real_object_calibration_knot.json")
    if rk:
        print(f"knot calibration: converged={rk['converged']} "
              f"label={rk['gradient_label_0.02']} "
              f"in_window={rk['label_in_clip_window']}")
    else:
        print("knot calibration: not run")
    m21 = _j("mode21_r4.json")
    if m21:
        done = len(m21.get("rows", {}))
        print(f"mode21: {done} (object,method) rows; "
              f"summary: { {k: v.get('PSNR', {}).get('mean') for k, v in m21.get('summary', {}).items()} }")
    else:
        print("mode21: not run")
    ws = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".workspace", "prv3_ws")
    cov = os.path.join(ws, "ws", "Coverage_images", "ShapeNet")
    n_cov = len(os.listdir(cov)) if os.path.isdir(cov) else 0
    print(f"workspace: {'PRESENT' if n_cov else 'MISSING'} "
          f"({n_cov} objects with coverage images at {cov})")
    for log in ("dataset300", "dataset300_ext", "tiny720_train",
                "atto_scaling", "mode7_r4", "mode21_r4", "label_topup",
                "r4_queue", "r4s2_queue", "r4s2b_queue",
                "r5_queue", "r5b_queue", "adam_lowp", "exp_real_knot"):
        p = f"/tmp/{log}.log"
        if os.path.exists(p):
            with open(p, "rb") as f:
                f.seek(max(0, os.path.getsize(p) - 300))
                last = f.read().decode(errors="replace").strip().splitlines()
            if last:
                print(f"  [{log}] {last[-1]}")


if __name__ == "__main__":
    main()
