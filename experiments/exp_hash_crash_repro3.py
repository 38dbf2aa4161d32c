#!/usr/bin/env python3
"""Hash-crash repro, stage 4: which backward survives a 125-step scan?

Stage 3 (exp_hash_crash_repro2.py) showed warmup-10 and tight-10 PASS but
warmup-125 CRASHES — the fault is probabilistic per step (every scan step
draws fresh data-dependent gather/scatter indices), which is also why the
one-shot 33.5M-row backward in stage 2 passed.  This pins the component by
running the same 125-step warmup chunk with three backends:

  A. encode_impl="xla"    — native autodiff duplicate scatter-add (the
                            voxel field's proven per-step pattern)
  B. "sorted" + HONEST scatter (unique_indices=False monkeypatch)
  C. "sorted" as shipped (unique_indices=True, OOB-dropped sentinels);
     124 steps so the jit cache cannot reuse B's program.  Runs last —
     expected to crash the worker.

  nohup python -u experiments/exp_hash_crash_repro3.py > /tmp/hash_repro4.log 2>&1 &
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
    from nerf_prv_tpu.ops import sorted_grad

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

    real_scatter = sorted_grad.segmented_scatter_add

    def honest_scatter(indices, updates, n_rows):
        m, f = updates.shape
        order = jnp.argsort(indices)
        sidx = indices[order]
        svals = updates[order]
        csum = jnp.cumsum(svals, axis=0)
        pos = jnp.arange(m, dtype=jnp.int32)
        is_last = jnp.concatenate([sidx[1:] != sidx[:-1], jnp.array([True])])
        last_marks = jnp.where(is_last, pos, -1)
        prev_last = jnp.concatenate(
            [jnp.array([-1], jnp.int32), jax.lax.cummax(last_marks)[:-1]])
        prev_csum = jnp.where(
            (prev_last >= 0)[:, None], csum[jnp.maximum(prev_last, 0)], 0.0)
        run_totals = csum - prev_csum
        scatter_idx = jnp.where(is_last, sidx, n_rows)
        out = jnp.zeros((n_rows, f), updates.dtype)
        return out.at[scatter_idx].add(
            jnp.where(is_last[:, None], run_totals, 0.0), mode="drop")

    def run(label, impl, steps, scatter):
        sorted_grad.segmented_scatter_add = scatter
        try:
            cfg = NerfConfig(field_impl="hash", encode_impl=impl)
            warm = dataclasses.replace(cfg, train_coarse=0,
                                       n_samples=cfg.train_warmup_samples)
            opt = make_optimizer(warm)
            p = init_params(jax.random.PRNGKey(0), cfg)
            s = opt.init(p)
            t0 = time.perf_counter()
            p, s, losses = train_chunk(p, s, jax.random.PRNGKey(1), pixels,
                                       rot, org, camera, warm, steps, None,
                                       pool, pool_n)
            val = float(np.asarray(losses)[-1])
            t_first = time.perf_counter() - t0
            # steady-state timing: same program, fresh state
            p2 = init_params(jax.random.PRNGKey(0), cfg)
            s2 = opt.init(p2)
            t0 = time.perf_counter()
            p2, s2, losses = train_chunk(p2, s2, jax.random.PRNGKey(2), pixels,
                                         rot, org, camera, warm, steps, None,
                                         pool, pool_n)
            float(np.asarray(losses)[-1])
            t_steady = time.perf_counter() - t0
            print(f"stage {label}: loss {val:.5f} first {t_first:.1f}s "
                  f"steady {t_steady / steps * 1e3:.2f} ms/step", flush=True)
        finally:
            sorted_grad.segmented_scatter_add = real_scatter

    run("A-xla-125", "xla", 125, real_scatter)
    run("B-honest-125", "sorted", 125, honest_scatter)
    run("C-unique-124", "sorted", 124, real_scatter)
    print("REPRO4_DONE", flush=True)


if __name__ == "__main__":
    main()
