"""Refuse to consume persistent comparison rows with a degenerate predictor.

mode7_r4.json / mode21_r4.json rows PIN their budgets forever (the roster
consumption rules in exp_dataset300.select_roster); a near-constant
predictor (round-4's partial tiny720: val corr ~0, pred span ~0) would
permanently poison the flagship tables with noise rows (VERDICT r4 weak
#2).  Gate on the training artifact's val diagnostics before any row is
written; PRV4_SKIP_PREDICTOR_GATE=1 overrides for debugging.
"""
import json
import os

ART = os.environ.get(
    "PRV4_ART",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts"))


def predictor_gate(artifact: str = None,
                   min_corr: float = 0.3, min_span: float = 5.0) -> dict:
    """Exit unless the predictor's val metrics clear the floor.

    min_corr: val pred-gt correlation floor (a constant predictor is ~0).
    min_span: minimum (pred_max - pred_min) in views — the VERDICT "pred
    range spanning >=10 views" criterion, relaxed to 5 as the hard floor.
    Returns the artifact dict on success so callers can log it."""
    if artifact is None:
        artifact = os.environ.get("PRV4_GATE_ARTIFACT", "prvnet_tiny720.json")
    if os.environ.get("PRV4_SKIP_PREDICTOR_GATE") == "1":
        return {}
    path = os.path.join(ART, artifact)
    if not os.path.exists(path):
        raise SystemExit(
            f"predictor gate: {path} missing — train the predictor first "
            "(exp_prvnet_r4.py --phase tiny); rows would be noise")
    with open(path) as f:
        a = json.load(f)
    corr = float(a.get("val_pred_gt_corr", 0.0))
    lo, hi = a.get("val_pred_min_max", [0.0, 0.0])
    span = float(hi) - float(lo)
    if corr < min_corr or span < min_span:
        raise SystemExit(
            f"predictor gate: val corr {corr:.3f} (need >= {min_corr}) / "
            f"pred span {span:.1f} views (need >= {min_span}) — refusing "
            "to burn persistent comparison rows with a degenerate "
            "predictor (set PRV4_SKIP_PREDICTOR_GATE=1 to override)")
    print(f"[gate] predictor ok: corr {corr:.3f}, span {span:.1f}",
          flush=True)
    return a
