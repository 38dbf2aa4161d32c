#!/usr/bin/env python3
"""Measure the hoisted split-RNG path (round-3 default) on the real chip.

The fused-RNG rework (exp_fused_rng.py) bought -11%/-13% step time but
CHANGED the random stream and missed the worst-seed quality gates by
0.05-0.09 dB.  The hoisted path (train._hoisted_split_streams) removes the
same 5-6 per-step threefry kernels by batch-generating the split path's
exact derivation chain outside the scan — the STREAM is bit-identical
(tests/test_perf_paths.py::test_hoisted_rng_bit_identical), so only
fusion-level rounding (~1e-7 rel) differs from the round-2 split program.

Measured here: tight + warmup step time, hoisted ("split", the new
default) vs the in-loop oracle ("split_inloop" = round-2 behavior), plus
the full quality gates re-run on the hoisted path (splat worst seed
>= 35.3, thin worst >= 35.30) — they should land on the round-2 numbers
(35.43/35.38, 35.40/35.51) modulo rounding.

  nohup python -u experiments/exp_hoisted_rng.py > /tmp/hoisted_rng.log 2>&1 &
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

    art_path = os.path.join(ART, "hoisted_rng.json")
    out = {"steps": 500}
    if os.path.exists(art_path):
        with open(art_path) as f:
            out.update(json.load(f))

    # ---- step-time: hoisted (new "split") vs in-loop oracle ----------------
    if "warmup_ms_hoisted" not in out:
        camera = CameraConfig()
        train_js, _ = _scene(camera)
        ds = load_dataset(train_js, with_images=True)
        pixels = jnp.asarray(
            np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
        rot = jnp.asarray(ds.rotations, jnp.float32)
        org = jnp.asarray(ds.origins, jnp.float32)
        pool, pool_n = build_hit_pool(rot, org, camera)

        for name, mode in (("hoisted", "split"), ("inloop", "split_inloop")):
            cfg = NerfConfig(train_rng=mode)
            warm = dataclasses.replace(cfg, train_coarse=0,
                                       n_samples=cfg.train_warmup_samples)
            out[f"tight_ms_{name}"] = round(
                measure_step(cfg, cfg, pixels, rot, org, camera, pool, pool_n), 3)
            out[f"warmup_ms_{name}"] = round(
                measure_step(cfg, warm, pixels, rot, org, camera, pool, pool_n), 3)
            print({k: v for k, v in out.items() if name in k}, flush=True)
        with open(art_path, "w") as f:
            json.dump(out, f, indent=1)

    # ---- quality gates on the hoisted default ------------------------------
    if "quality_hoisted" not in out:
        qcam = CameraConfig(
            width=320, height=180, fx=228.9, fy=228.3, ppx=161.8, ppy=93.1,
            model=0,
        )
        scenes = make_scenes(qcam)
        cfg = NerfConfig()  # train_rng="split" -> hoisted
        quality = {}
        for scene, (tr, te) in scenes.items():
            for seed in (0, 1):
                params, _ = train_nerf(tr, cfg, seed=seed)
                m = eval_nerf(params, te, cfg)
                quality[f"{scene}/s{seed}"] = round(float(m["PSNR"]), 2)
                print(f"hoisted {scene}/s{seed}: "
                      f"{quality[f'{scene}/s{seed}']} dB", flush=True)
        out["quality_hoisted"] = quality
        out["gate_splat_ok"] = min(quality["splat/s0"], quality["splat/s1"]) >= 35.3
        out["gate_thin_ok"] = min(quality["thin/s0"], quality["thin/s1"]) >= 35.30
        with open(art_path, "w") as f:
            json.dump(out, f, indent=1)

    print(json.dumps(out), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
