#!/usr/bin/env python3
"""Decompose the train step's non-row-floor residue (VERDICT r2 item 3a/3b).

PERF.md's floor table covers the gather/scatter rows (1.7 ms of the
2.77 ms tight step) but labels the remaining ~1.07 ms "MLPs, sampling,
blend bwd, Adam" without measurements; the 5.70 ms warmup step has no
breakdown at all.  This measures both phases by ablation, each variant a
scan-jitted chunk timed exactly like bench.py (identical-shape warmup
call, scalar-readback sync, best of 2):

  full      value_and_grad + Adam            (the production step)
  sgd       value_and_grad + plain SGD       full - sgd      = Adam cost
  fwd       loss forward only                full - fwd - adam = backward
  fwd_fix   forward, pre-sampled fixed rays  fwd - fwd_fix   = sampling
  adam_only Adam update on frozen grads      cross-check of (full - sgd)

Backward's row floor is known (16 scatter rows/ray: 0.67 ms fixed +
9 ns/row); whatever 'backward - scatter_floor' leaves is MLP-bwd +
blend-bwd VPU work.  Output: artifacts/step_residue.json + a PERF.md
floor-table extension.

  nohup python -u experiments/exp_step_residue.py > /tmp/residue.log 2>&1 &
"""
import dataclasses
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

ART = os.path.join(os.path.dirname(os.path.abspath(__file__)), "artifacts")
STEPS = 500


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from bench import _scene
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.render import render_rays
    from nerf_prv_tpu.nerf.train import (
        _sample_batch_pooled, build_hit_pool, make_optimizer,
    )

    cfg = NerfConfig()
    camera = CameraConfig()
    train_js, _ = _scene(camera)
    ds = load_dataset(train_js, with_images=True)
    pixels = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot = jnp.asarray(ds.rotations, jnp.float32)
    org = jnp.asarray(ds.origins, jnp.float32)
    pool, pool_n = build_hit_pool(rot, org, camera)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    def make_chunk(phase_cfg, mode):
        """mode: full | sgd | fwd | fwd_fix"""

        def loss_fn(p, key, fixed):
            ks, km = jax.random.split(key)
            if fixed is None:
                o, d, target, bg = _sample_batch_pooled(
                    ks, pixels, rot, org, camera, phase_cfg.train_rays,
                    pool, pool_n)
            else:
                o, d, target, bg = fixed
            rgb, acc = render_rays(p, o, d, phase_cfg, key=km)
            rgb = rgb + bg * (1.0 - acc[:, None])
            err = rgb - target
            delta = phase_cfg.huber_delta
            abs_err = jnp.abs(err)
            huber = jnp.where(abs_err <= delta, 0.5 * err * err,
                              delta * (abs_err - 0.5 * delta))
            return jnp.mean(huber)

        opt = make_optimizer(phase_cfg)

        @partial(jax.jit, donate_argnums=(0, 1))
        def chunk(p, s, key, fixed):
            def step(carry, key):
                p, s = carry
                if mode in ("fwd", "fwd_fix"):
                    loss = loss_fn(p, key, fixed if mode == "fwd_fix" else None)
                    return (p, s), loss
                loss, grads = jax.value_and_grad(loss_fn)(
                    p, key, None)
                if mode == "sgd":
                    p = jax.tree.map(lambda a, g: a - 1e-9 * g, p, grads)
                else:
                    updates, s = opt.update(grads, s, p)
                    p = optax.apply_updates(p, updates)
                return (p, s), loss

            keys = jax.random.split(key, STEPS)
            (p, s), losses = jax.lax.scan(step, (p, s), keys)
            return p, s, losses

        return chunk, opt

    def measure(phase_cfg, mode, fixed=None):
        chunk, opt = make_chunk(phase_cfg, mode)
        p = init_params(jax.random.PRNGKey(0), cfg)
        s = opt.init(p)
        p, s, losses = chunk(p, s, jax.random.PRNGKey(1), fixed)
        sync(losses)  # compile
        best = np.inf
        for seed in (2, 3):
            p2 = init_params(jax.random.PRNGKey(0), cfg)
            s2 = opt.init(p2)
            t0 = time.perf_counter()
            p2, s2, losses = chunk(p2, s2, jax.random.PRNGKey(seed), fixed)
            sync(losses)
            best = min(best, time.perf_counter() - t0)
        return best / STEPS * 1e3  # ms/step

    # adam_only: optimizer update alone on frozen grads, same param tree
    def measure_adam_only():
        p = init_params(jax.random.PRNGKey(0), cfg)
        opt = make_optimizer(cfg)
        grads = jax.tree.map(lambda a: a * 1e-3, p)

        @partial(jax.jit, donate_argnums=(0, 1))
        def chunk(p, s):
            def step(carry, _):
                p, s = carry
                updates, s = opt.update(grads, s, p)
                p = optax.apply_updates(p, updates)
                return (p, s), jnp.float32(0)

            (p, s), losses = jax.lax.scan(step, (p, s), None, length=STEPS)
            return p, s, losses

        s = opt.init(p)
        p, s, losses = chunk(p, s)
        sync(losses)
        p = init_params(jax.random.PRNGKey(0), cfg)
        s = opt.init(p)
        t0 = time.perf_counter()
        p, s, losses = chunk(p, s)
        sync(losses)
        return (time.perf_counter() - t0) / STEPS * 1e3

    warm_cfg = dataclasses.replace(
        cfg, train_coarse=0, n_samples=cfg.train_warmup_samples)

    out = {"steps": STEPS}
    # fixed ray batch for the sampling ablation (sampled once, outside scan)
    import jax.random as jrandom
    fixed = _sample_batch_pooled(
        jrandom.PRNGKey(42), pixels, rot, org, camera, cfg.train_rays,
        pool, pool_n)
    fixed = jax.tree.map(lambda x: jnp.asarray(x), fixed)

    for phase, pc in (("tight", cfg), ("warmup", warm_cfg)):
        r = {}
        for mode in ("full", "sgd", "fwd", "fwd_fix"):
            r[mode] = round(measure(pc, mode, fixed=fixed), 3)
            print(f"{phase}/{mode}: {r[mode]} ms/step", flush=True)
        r["adam"] = round(r["full"] - r["sgd"], 3)
        r["backward"] = round(r["sgd"] - r["fwd"], 3)
        r["sampling"] = round(r["fwd"] - r["fwd_fix"], 3)
        out[phase] = r
    out["adam_only_direct"] = round(measure_adam_only(), 3)
    print(json.dumps(out), flush=True)
    with open(os.path.join(ART, "step_residue.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
