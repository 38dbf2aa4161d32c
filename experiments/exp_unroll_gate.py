#!/usr/bin/env python3
"""Quality gate for the train_scan_unroll=4 default + fused+unroll ceiling.

unroll is semantically the identity (same step math, same RNG stream —
lax.scan unroll only changes XLA's scheduling), so quality MUST match the
shipped round-3 split-path numbers; this run pins that on the real chip for
the record (VERDICT r3 weak #1 asked for exactly this before flipping the
default).  Also measures the documented opt-in ceiling: train_rng="fused"
stacked with unroll=4 (exp_scan_unroll.json only has fused at unroll=1).

  nohup python -u experiments/exp_unroll_gate.py > /tmp/unroll_gate.log 2>&1 &
"""
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")


def main():
    import numpy as np
    import jax.numpy as jnp

    from exp_fused_rng import measure_step
    from exp_hashgrid_r3 import make_scenes
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.api import eval_nerf, train_nerf
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.train import build_hit_pool
    from bench import _scene

    art_path = os.path.join(ART, "unroll_gate.json")
    out = {}
    if os.path.exists(art_path):
        with open(art_path) as f:
            out.update(json.load(f))

    # ---- step time: fused + unroll=4 (the opt-in ceiling) ------------------
    if "tight_ms_fused_u4" not in out:
        camera = CameraConfig()
        train_js, _ = _scene(camera)
        ds = load_dataset(train_js, with_images=True)
        pixels = jnp.asarray(
            np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
        rot = jnp.asarray(ds.rotations, jnp.float32)
        org = jnp.asarray(ds.origins, jnp.float32)
        pool, pool_n = build_hit_pool(rot, org, camera)
        cfg = NerfConfig(train_rng="fused", train_scan_unroll=4)
        warm = dataclasses.replace(cfg, train_coarse=0,
                                   n_samples=cfg.train_warmup_samples)
        out["tight_ms_fused_u4"] = round(
            measure_step(cfg, cfg, pixels, rot, org, camera, pool, pool_n), 3)
        out["warmup_ms_fused_u4"] = round(
            measure_step(cfg, warm, pixels, rot, org, camera, pool, pool_n), 3)
        print({k: out[k] for k in ("tight_ms_fused_u4", "warmup_ms_fused_u4")},
              flush=True)
        with open(art_path, "w") as f:
            json.dump(out, f, indent=1)

    # ---- quality gate at the new default (unroll=4, split RNG) -------------
    qcam = CameraConfig(
        width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1, model=0
    )
    scenes = make_scenes(qcam)
    cfg = NerfConfig()  # production defaults incl. train_scan_unroll=4
    assert cfg.train_scan_unroll == 4, "gate must run the shipped default"
    quality = dict(out.get("quality_u4", {}))
    for scene, (tr, te) in scenes.items():
        for seed in (0, 1):
            k = f"{scene}/s{seed}"
            if k in quality:
                continue
            params, _ = train_nerf(tr, cfg, seed=seed)
            m = eval_nerf(params, te, cfg)
            quality[k] = round(float(m["PSNR"]), 2)
            print(f"u4 {k}: {quality[k]} dB", flush=True)
            out["quality_u4"] = quality
            with open(art_path, "w") as f:
                json.dump(out, f, indent=1)
    out["quality_u4"] = quality
    # round-3 split-path gates (PERF.md): splat worst seed >= 35.3, thin
    # worst >= 35.30; unroll is the identity so these must hold exactly
    out["gate_splat_ok"] = min(quality["splat/s0"], quality["splat/s1"]) >= 35.3
    out["gate_thin_ok"] = min(quality["thin/s0"], quality["thin/s1"]) >= 35.30

    with open(art_path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
