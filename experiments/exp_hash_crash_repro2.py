#!/usr/bin/env python3
"""Hash-crash repro, stage 3: the real train_chunk, escalating pieces.

exp_hash_crash_repro.py cleared the isolated sorted-backward (forward +
grad at M=33.5M rows pass on chip), so the fault lives in the composition:
render march + jax.checkpoint(field) + lax.scan + Adam.  This runs the
actual train_chunk on a real synthetic scene at the exact warmup and tight
phase configs, a few steps at a time, printing after each stage so the log
pins the faulting one.

  nohup python -u experiments/exp_hash_crash_repro2.py > /tmp/hash_repro3.log 2>&1 &
"""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import _scene
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk

    print("backend:", jax.default_backend(), flush=True)
    camera = CameraConfig()
    train_js, _ = _scene(camera)
    ds = load_dataset(train_js, with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)
    pool, pool_n = build_hit_pool(rot, org, camera)
    print("scene ready", flush=True)

    cfg = NerfConfig(field_impl="hash")
    warm = dataclasses.replace(cfg, train_coarse=0,
                               n_samples=cfg.train_warmup_samples)

    for label, phase, steps in (
        ("warmup-10", warm, 10),
        ("tight-10", cfg, 10),
        ("warmup-125", warm, 125),
        ("tight-375", cfg, 375),
    ):
        opt = make_optimizer(phase)
        p = init_params(jax.random.PRNGKey(0), cfg)
        s = opt.init(p)
        t0 = time.perf_counter()
        p, s, losses = train_chunk(p, s, jax.random.PRNGKey(1), pixels, rot,
                                   org, camera, phase, steps, None, pool, pool_n)
        val = float(np.asarray(losses)[-1])
        print(f"stage {label}: last loss {val:.5f} "
              f"({time.perf_counter() - t0:.1f}s)", flush=True)
    print("REPRO3_DONE", flush=True)


if __name__ == "__main__":
    main()
