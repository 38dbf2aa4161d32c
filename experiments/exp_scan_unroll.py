#!/usr/bin/env python3
"""Measure lax.scan unroll for the training loop on the real chip.

With the hoisted split-RNG pack in place (exp_hoisted_rng.py) the tight
step still carries per-iteration small-kernel overhead (the xs slice, the
baked-probe cond, Adam's update chain).  unroll>1 is semantically the
identity — the same step math in the same order — but lets XLA schedule
adjacent steps' small kernels together and drop loop-carry shuffles.
Measured here: tight + warmup ms/step at unroll 1/2/4, plus the fused
re-measure in the SAME session so cross-session chip variance can't
confound the hoisted-vs-fused comparison.

  nohup python -u experiments/exp_scan_unroll.py > /tmp/scan_unroll.log 2>&1 &
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
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.train import build_hit_pool
    from bench import _scene

    art_path = os.path.join(ART, "scan_unroll.json")
    out = {"steps": 500}
    if os.path.exists(art_path):
        with open(art_path) as f:
            out.update(json.load(f))

    camera = CameraConfig()
    train_js, _ = _scene(camera)
    ds = load_dataset(train_js, with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)
    pool, pool_n = build_hit_pool(rot, org, camera)

    variants = [
        ("u1", dict(train_scan_unroll=1)),
        ("u2", dict(train_scan_unroll=2)),
        ("u4", dict(train_scan_unroll=4)),
        ("fused_u1", dict(train_rng="fused")),
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
        with open(art_path, "w") as f:
            json.dump(out, f, indent=1)

    print(json.dumps(out), flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
