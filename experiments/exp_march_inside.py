#!/usr/bin/env python3
"""Inside the fine march: which stage owns the ~25 ms/chunk device cost?

exp_march_fixed put one 131k-ray chunk at ~25 ms device time for ns=24
(15.4M samples): wide-row gathers predict ~11 ms and the MLP FLOPs are
nominally sub-ms, so something else is charging.  Ablate the march stage
by stage on ONE chunk of real level-2 survivors:

  full          gather + blend + PE + density MLP + SH + color MLP + composite
  no_color      drop SH + color MLP (rgb = geo features)
  no_pe         density MLP on blended features only (PE zeroed width)
  no_mlp        sigma/rgb straight from blended features
  gather_only   row gather + reduce (no blend weights, no MLP)
  no_gather     everything but the gather (features faked from frac)

All timings single-call (includes one ~29 ms sync round-trip — compare
deltas, not absolutes).

  nohup python -u experiments/exp_march_inside.py > /tmp/exp_inside.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.rays import load_dataset, pixel_dirs_cam
    from nerf_prv_tpu.nerf.render import (
        _RENDER_TILE, _composite, _jit_partition_packed, _jit_probe_l2,
        _jit_probe_tiles_l1, _tile_order, build_render_aux,
    )
    from nerf_prv_tpu.nerf.train import make_optimizer, train_chunk
    from nerf_prv_tpu.nerf.voxelfield import (
        blend_rows, cell_and_frac, corner_weights, density_mlp, pe_encode,
    )
    from nerf_prv_tpu.nerf.model import radiance
    from synthetic import write_scene

    cfg = NerfConfig()
    camera = CameraConfig()
    scene_dir = "/tmp/bench_scene_v2"
    train_js = os.path.join(scene_dir, "train.json")
    if not os.path.exists(train_js):
        write_scene(scene_dir, n_train=16, n_test=8, camera=camera,
                    point_size=3, n_points=120000)
    ds = load_dataset(train_js, with_images=True)
    pixels_j = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8))
    rot_j = jnp.asarray(ds.rotations, jnp.float32)
    org_j = jnp.asarray(ds.origins, jnp.float32)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt_state = make_optimizer(cfg).init(params)
    params, opt_state, losses = train_chunk(
        params, opt_state, jax.random.PRNGKey(1), pixels_j, rot_j, org_j,
        camera, cfg, 1000)
    sync(losses)
    aux = build_render_aux(params, cfg)

    # one chunk of real level-2 survivors (same assembly as exp_march_fixed)
    n_render = 8
    h, w = camera.height, camera.width
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32),
                        jnp.arange(h, dtype=jnp.float32))
    d_cam = pixel_dirs_cam(camera, u.reshape(-1), v.reshape(-1))
    d_grid = jnp.einsum("fij,nj->fni", rot_j[:n_render], d_cam)
    d_grid = d_grid / jnp.linalg.norm(d_grid, axis=-1, keepdims=True)
    od = jnp.concatenate(
        [jnp.broadcast_to(org_j[:n_render, None, :],
                          (n_render, h * w, 3)).reshape(-1, 3),
         d_grid.reshape(-1, 3)], axis=-1)
    n = od.shape[0]
    t = _RENDER_TILE
    chunk = 1 << 17
    npad = (-n) % t
    if npad:
        od = jnp.concatenate(
            [od, jnp.tile(jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, 1.0]]), (npad, 1))])
    n_tiles = od.shape[0] // t
    od_t = od.reshape(n_tiles, 6 * t)
    order_t, n_act = _tile_order(od, t)
    n_act = int(n_act)
    ct = max(chunk // t, 1)
    stop_t = min(((n_act + ct - 1) // ct) * ct, ((n_tiles + ct - 1) // ct) * ct)
    order_pad = jnp.concatenate(
        [order_t, jnp.zeros((max(stop_t - n_tiles, 0),), jnp.int32)])
    packs = [_jit_probe_tiles_l1(od_t, order_pad[i:i + ct], cfg, aux)
             for i in range(0, stop_t, ct)]
    pack1, _, n1 = _jit_partition_packed(jnp.concatenate(packs), chunk)
    stop1 = ((int(n1) + chunk - 1) // chunk) * chunk
    packs2 = [_jit_probe_l2(pack1[i:i + chunk], cfg, aux)
              for i in range(0, stop1, chunk)]
    pack2, _, n2 = _jit_partition_packed(jnp.concatenate(packs2), chunk)
    one = pack2[:chunk]
    print(f"chunk of {chunk} rays ({int(n2)} survivors total)", flush=True)

    g = cfg.voxel_grid_size
    f = cfg.voxel_features
    ns = 24

    @partial(jax.jit, static_argnames=("mode",))
    def march(params, packed, mode):
        o, d = packed[:, :3], packed[:, 3:6]
        tlo, thi, occ = packed[:, 6], packed[:, 7], packed[:, 8] > 0.5
        span = (thi - tlo) / ns
        base = jnp.arange(ns, dtype=jnp.float32)[None, :]
        ts = tlo[:, None] + (base + 0.5) * span[:, None]
        pos = jnp.clip(o[:, None, :] + d[:, None, :] * ts[..., None], 0.0, 1.0 - 1e-6)
        m = pos.shape[0] * ns
        flat = pos.reshape(m, 3)
        row_idx, frac = cell_and_frac(flat, g)
        if mode == "no_gather":
            rows = jnp.tile(frac, (1, (8 * f) // 3 + 1))[:, : 8 * f].astype(jnp.bfloat16)
        else:
            rows = params["grid"].astype(jnp.bfloat16)[row_idx]
        if mode == "gather_only":
            sigma = jnp.sum(rows.astype(jnp.float32), axis=-1)
            rgb = rows[:, :3].astype(jnp.float32)
        else:
            feats = blend_rows(rows.astype(jnp.float32), frac, f)
            if mode == "no_mlp":
                sigma = jnp.sum(feats, axis=-1)
                rgb = feats[:, :3]
            else:
                if mode == "no_pe":
                    ct_ = cfg.compute_dtype
                    hdn = jnp.maximum(
                        feats.astype(ct_) @ params["sigma_w0"][: f].astype(ct_), 0)
                    raw = (hdn @ params["sigma_w1"].astype(ct_)).astype(jnp.float32)
                else:
                    raw = density_mlp(params, feats, flat, cfg)
                sigma = jnp.exp(raw[:, 0])
                geo = raw[:, 1:]
                if mode == "no_color":
                    rgb = geo[:, :3]
                else:
                    dirs_b = jnp.broadcast_to(d[:, None, :], (packed.shape[0], ns, 3)
                                              ).reshape(m, 3)
                    rgb = radiance(params, geo, dirs_b, cfg)
        sigma = sigma.reshape(-1, ns) * occ[:, None]
        rgb = rgb.reshape(-1, ns, 3)
        out_rgb, out_a, _ = _composite(
            sigma, rgb, jnp.broadcast_to(span[:, None], sigma.shape))
        return jnp.concatenate([out_rgb, out_a[:, None]], axis=-1)

    def timeit(fn, reps=5):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    for mode in ("full", "no_color", "no_pe", "no_mlp", "gather_only",
                 "no_gather"):
        dt = timeit(lambda mode=mode: sync(march(params, one, mode)))
        print(f"{mode:12s} {dt*1e3:7.1f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
