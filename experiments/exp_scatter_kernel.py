#!/usr/bin/env python3
"""Scatter-add strategy bench at production size + render phase breakdown.

The voxel-field train step is dominated by the grid-gradient scatter-add
(~6.4 ms of an 11.6 ms step at 4096 rays x 96 samples -> 393k rows of 64
floats into a (64000, 64) grid).  Candidates measured here:

  xla_f32      jnp.zeros.at[idx].add(upd)                (the current default)
  xla_bf16     same with bf16 updates/accumulator
  xla_w8       per-corner scatter: (64000*8, 8) rows     (narrow-wide tradeoff)
  pallas_vmem  grid-resident VMEM accumulator, serial row loop
  run_dedup    adjacent-duplicate pre-merge along the ray axis (samples step
               ~0.43 cells, so ~2.3 consecutive samples share a cell) then
               xla scatter of the merged rows (same row count, zeros dropped?)

Render side: time _hit_order / march / _scatter_back separately.

Run detached (never timeout-kill a TPU process):
  nohup python -u experiments/exp_scatter_kernel.py > /tmp/exp_scatter.log 2>&1 &
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print("device:", jax.devices()[0], flush=True)

    N = 4096 * 96          # production update count
    R = 40 * 40 * 40       # grid rows
    F = 64                 # row width (8 corners x 8 features)
    K = 50

    rng = np.random.default_rng(0)
    # realistic duplicate structure: indices from rays marching the sphere
    # (surface cells repeat heavily); emulate with clustered draws
    base = rng.integers(0, R, (4096, 1))
    step = rng.integers(1, 40, (4096, 96)).cumsum(axis=1) // 2
    idx_np = ((base + step) % R).astype(np.int32)
    idx = jnp.asarray(idx_np.reshape(-1))
    upd = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    def timeit(name, fn, *args, k=K):
        sync(fn(*args, k=k))
        t0 = time.perf_counter()
        sync(fn(*args, k=k))
        el = (time.perf_counter() - t0) / k
        print(f"{name:28s} {el*1e3:8.3f} ms", flush=True)
        return el

    @partial(jax.jit, static_argnames=("k",))
    def xla_f32(idx, upd, k):
        def body(c, i):
            out = jnp.zeros((R, F), jnp.float32).at[idx].add(upd + c)
            return c + out[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    @partial(jax.jit, static_argnames=("k",))
    def xla_bf16(idx, upd, k):
        u16 = upd.astype(jnp.bfloat16)
        def body(c, i):
            out = jnp.zeros((R, F), jnp.bfloat16).at[idx].add(u16 + c.astype(jnp.bfloat16))
            return c + out[0, 0].astype(jnp.float32) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    @partial(jax.jit, static_argnames=("k",))
    def xla_w8(idx, upd, k):
        # scatter each corner's 8-wide slice into its own row block
        idx8 = (idx[:, None] * 8 + jnp.arange(8)[None, :]).reshape(-1)
        u8 = upd.reshape(N * 8, 8)
        def body(c, i):
            out = jnp.zeros((R * 8, 8), jnp.float32).at[idx8].add(u8 + c)
            return c + out[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    @partial(jax.jit, static_argnames=("k",))
    def run_dedup(idx, upd, k):
        # merge runs of equal adjacent indices (ray-order locality):
        # cumsum trick along the flat axis, scatter only run-heads' totals
        def body(c, i):
            u = upd + c
            csum = jnp.cumsum(u, axis=0)
            is_last = jnp.concatenate([idx[1:] != idx[:-1], jnp.array([True])])
            pos = jnp.arange(N, dtype=jnp.int32)
            last_marks = jnp.where(is_last, pos, -1)
            prev_last = jnp.concatenate(
                [jnp.array([-1], jnp.int32), jax.lax.cummax(last_marks)[:-1]]
            )
            prev = jnp.where((prev_last >= 0)[:, None], csum[jnp.maximum(prev_last, 0)], 0.0)
            totals = jnp.where(is_last[:, None], csum - prev, 0.0)
            out = jnp.zeros((R, F), jnp.float32).at[idx].add(totals)
            return c + out[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    timeit("xla_f32", xla_f32, idx, upd)
    timeit("xla_bf16", xla_bf16, idx, upd)
    timeit("xla_w8", xla_w8, idx, upd)
    timeit("run_dedup", run_dedup, idx, upd)

    # ---- pallas vmem accumulator ------------------------------------------
    BLK = 4096

    def scatter_kernel(idx_ref, upd_ref, out_ref):
        step = pl.program_id(0)

        @pl.when(step == 0)
        def _():
            out_ref[:] = jnp.zeros_like(out_ref)

        def body(i, _):
            r = idx_ref[i]
            out_ref[pl.ds(r, 1), :] += upd_ref[i, :][None, :]
            return 0

        jax.lax.fori_loop(0, BLK, body, 0, unroll=4)

    def pallas_scatter(idx, upd):
        return pl.pallas_call(
            scatter_kernel,
            grid=(N // BLK,),
            in_specs=[
                pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.SMEM),
                pl.BlockSpec((BLK, F), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        )(idx, upd)

    @partial(jax.jit, static_argnames=("k",))
    def pallas_loop(idx, upd, k):
        def body(c, i):
            out = pallas_scatter(idx, upd + c)
            return c + out[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    try:
        # correctness first
        ref = np.zeros((R, F), np.float32)
        np.add.at(ref, idx_np.reshape(-1), np.asarray(upd))
        got = np.asarray(pallas_scatter(idx, upd))
        err = np.abs(got - ref).max()
        print(f"pallas_vmem max err: {err:.2e}", flush=True)
        timeit("pallas_vmem", pallas_loop, idx, upd, k=10)
    except Exception as e:
        print(f"pallas_vmem FAILED: {type(e).__name__}: {e}", flush=True)

    # ---- gather rate reference --------------------------------------------
    grid = jnp.asarray(rng.normal(size=(R, F)).astype(np.float32))

    @partial(jax.jit, static_argnames=("k",))
    def gather_loop(grid, idx, k):
        def body(c, i):
            return c + jnp.sum(grid[(idx + i) % R]) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    timeit("gather (N rows)", gather_loop, grid, idx)

    # ---- render phase breakdown -------------------------------------------
    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.pose import camera_to_world
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.render import _hit_order, _jit_render, render_views

    cfg = NerfConfig()
    camera = CameraConfig()
    h, w = camera.height, camera.width
    params = init_params(jax.random.PRNGKey(0), cfg)

    views = rng.normal(size=(8, 3)); views[:, 2] = np.abs(views[:, 2])
    views /= np.linalg.norm(views, axis=1, keepdims=True)
    c2w = camera_to_world(views * 0.3, np.zeros(3) + 1e-4)
    rot = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * 5.0 + 0.5, jnp.float32)

    from nerf_prv_tpu.nerf.rays import pixel_dirs_cam

    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32))
    d_cam = pixel_dirs_cam(camera, u.reshape(-1), v.reshape(-1))
    d_grid = jnp.einsum("fij,nj->fni", rot, d_cam)
    d_grid = d_grid / jnp.linalg.norm(d_grid, axis=-1, keepdims=True)
    d_all = d_grid.reshape(-1, 3)
    o_all = jnp.broadcast_to(org[:, None, :], (8, h * w, 3)).reshape(-1, 3)
    n = o_all.shape[0]
    print(f"render rays total: {n}", flush=True)

    def t_once(name, fn, reps=3):
        fn()  # warm
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        el = (time.perf_counter() - t0) / reps
        print(f"{name:28s} {el*1e3:8.1f} ms", flush=True)
        return el

    order, pos, n_hit = _hit_order(o_all, d_all)
    print(f"hit rays: {int(n_hit)} / {n} = {int(n_hit)/n:.3f}", flush=True)
    t_once("hit_order (7.4M rays)", lambda: sync(_hit_order(o_all, d_all)[0]))

    o_sorted = o_all[order]
    d_sorted = d_all[order]
    chunk = 1 << 17
    n_hit_i = int(n_hit)
    stop = ((n_hit_i + chunk - 1) // chunk) * chunk

    def march_all():
        outs = []
        for i in range(0, stop, chunk):
            rgb, a = _jit_render(params, o_sorted[i : i + chunk], d_sorted[i : i + chunk], cfg)
            outs.append(a)
        return sync(outs[-1])

    t_once(f"march hits ({stop} rays)", march_all)

    from nerf_prv_tpu.nerf.render import _gather_back

    rgba_hit = jnp.zeros((stop, 4))
    t_once("gather_back", lambda: sync(_gather_back(rgba_hit, pos, n)[1]))
    t_once("gather o_sorted=o[order]", lambda: sync(o_all[order]))

    def full():
        return sync(render_views(params, org, rot, camera, cfg)[..., 3])

    t_once("render_views full (8f)", full)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
