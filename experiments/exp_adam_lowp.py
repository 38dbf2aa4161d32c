#!/usr/bin/env python3
"""bf16 Adam moments + scan-unroll 8: close the step residue or close the
book (VERDICT r4 next #7).

The 2.0 ms tight step carries ~0.44 ms Adam (direct ablation,
artifacts/step_residue.json) — ~6 HBM passes over params+moments.
``adam_moment_dtype="bfloat16"`` (train._scale_by_adam_lowp) stores both
moments in bf16, computed fp32: 24 -> 16 bytes/param/step of optimizer
traffic, casts fused into the same elementwise kernels.  unroll=8 is the
one unmeasured scan-unroll point now that u4 gated clean at 6 seeds.

Phase 1 (speed, ~4 min): tight + warmup ms/step for
  f32_u4 (shipped default baseline, re-measured in-session),
  bf16_u4, bf16_u8, f32_u8.
Phase 2 (quality, only if bf16 wins >=0.05 ms): 6 seeds x 2 scenes x
  {f32_u4, bf16 at winning unroll}, same protocol as
  exp_fused_rng_seeds.py.  Pre-registered decision rule: bf16 flips to
  default iff bf16_mean >= f32_mean - 0.05 dB AND bf16_min >= f32_min -
  0.10 dB on both scenes.

  nohup python -u experiments/exp_adam_lowp.py > /tmp/adam_lowp.log 2>&1 &
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
SEEDS = (0, 1, 2, 3, 4, 5)


def main():
    import numpy as np
    import jax.numpy as jnp

    from exp_fused_rng import measure_step
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.train import build_hit_pool
    from bench import _scene

    art_path = os.path.join(ART, "adam_lowp.json")
    out = {"steps": 500, "psnr": {}}
    if os.path.exists(art_path):
        with open(art_path) as f:
            out.update(json.load(f))

    def save():
        with open(art_path, "w") as f:
            json.dump(out, f, indent=1)

    # ---- phase 1: speed -------------------------------------------------
    camera = CameraConfig()
    train_js, _ = _scene(camera)
    ds = load_dataset(train_js, with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)
    pool, pool_n = build_hit_pool(rot, org, camera)

    variants = [
        ("f32_u4", dict()),
        ("bf16_u4", dict(adam_moment_dtype="bfloat16")),
        ("bf16_u8", dict(adam_moment_dtype="bfloat16", train_scan_unroll=8)),
        ("f32_u8", dict(train_scan_unroll=8)),
    ]
    for name, kw in variants:
        if f"tight_ms_{name}" in out:
            continue
        cfg = NerfConfig(**kw)
        warm = dataclasses.replace(cfg, train_coarse=0,
                                   n_samples=cfg.train_warmup_samples)
        out[f"tight_ms_{name}"] = round(
            measure_step(cfg, cfg, pixels, rot, org, camera, pool, pool_n), 3)
        out[f"warmup_ms_{name}"] = round(
            measure_step(cfg, warm, pixels, rot, org, camera, pool, pool_n), 3)
        print({k: v for k, v in out.items() if name in k}, flush=True)
        save()

    bf16_best = min(out["tight_ms_bf16_u4"], out["tight_ms_bf16_u8"])
    bf16_unroll = 4 if out["tight_ms_bf16_u4"] <= out["tight_ms_bf16_u8"] else 8
    win_ms = out["tight_ms_f32_u4"] - bf16_best
    out["bf16_win_ms"] = round(win_ms, 3)
    out["bf16_best_unroll"] = bf16_unroll
    save()
    if win_ms < 0.05:
        out["decision"] = (
            f"bf16 moments win only {win_ms:.3f} ms — below the 0.05 ms "
            "bar; default stays float32, quality phase skipped")
        save()
        print(json.dumps({k: v for k, v in out.items() if k != "psnr"}),
              flush=True)
        print("DONE", flush=True)
        return

    # ---- phase 2: 6-seed quality gate -----------------------------------
    from exp_hashgrid_r3 import make_scenes
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf

    qcam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scenes = make_scenes(qcam)
    ARMS = {
        "f32": NerfConfig(),
        "bf16": NerfConfig(adam_moment_dtype="bfloat16",
                           train_scan_unroll=bf16_unroll),
    }
    for mode, cfg in ARMS.items():
        for scene, (tr, te) in scenes.items():
            for seed in SEEDS:
                k = f"{mode}/{scene}/s{seed}"
                if k in out["psnr"]:
                    continue
                params, _ = train_nerf(tr, cfg, seed=seed)
                m = eval_nerf(params, te, cfg)
                out["psnr"][k] = round(float(m["PSNR"]), 3)
                print(f"{k}: {out['psnr'][k]} dB", flush=True)
                save()

    stats, flip = {}, True
    for scene in ("splat", "thin"):
        for mode in ARMS:
            v = np.array([out["psnr"][f"{mode}/{scene}/s{s}"] for s in SEEDS])
            stats[f"{mode}/{scene}"] = {
                "mean": round(float(v.mean()), 3),
                "std": round(float(v.std(ddof=1)), 3),
                "min": round(float(v.min()), 3),
            }
        fm, bm = stats[f"f32/{scene}"], stats[f"bf16/{scene}"]
        ok = (bm["mean"] >= fm["mean"] - 0.05
              and bm["min"] >= fm["min"] - 0.10)
        stats[f"gate_bf16_{scene}_ok"] = ok
        flip = flip and ok
    stats["flip_default_to_bf16"] = flip
    out["stats"] = stats
    out["decision"] = (
        f"bf16 moments (unroll {bf16_unroll}) win {win_ms:.3f} ms/step and "
        + ("PASS the 6-seed gate -> flip adam_moment_dtype default"
           if flip else "FAIL the 6-seed gate -> default stays float32"))
    save()
    print(json.dumps(stats), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
