#!/usr/bin/env python3
"""Benchmark: flagship NeRF train+render throughput on one chip.

Prints ONE JSON line:
  {"metric": "nerf_rays_per_sec", "value": N, "unit": "rays/s", "vs_baseline": N}

Baseline: BASELINE.md's north star of 2e7 rays/sec/chip (train+render) for
instant-ngp-class workloads.  The value is throughput over the reference's
standard per-object protocol mix — 2,500 training steps x 4,096 rays
(DefaultConfiguration.yaml:19) plus 100 test-view renders at 1280x720
(run.py:213-277) — computed from separately measured train and render rates.

The workload is a production-representative object scene (a colored blob
spanning ~8% of the frame at the reference's camera/orbit geometry —
object pixel rates run 3-30%, DefaultConfiguration.yaml object_pixel_rate),
rendered through the real coverage pipeline into rgbaClip PNGs +
transforms.json.  Rendering a trained field on such a scene exercises the
tile compaction the production NBV loop relies on, exactly as instant-ngp's
occupancy grid exercises empty-space skipping in the reference protocol.
The `psnr` detail field guards against degenerate speed (an empty field
renders fast but scores ~11 dB).

Also measured: the batched dataset-generation rate — the PRV dataset
pipeline trains ~3000 objects x ~25 view counts, and the production path
trains K objects simultaneously on the dp axis (nerf/batch_train.py); the
single-object protocol underuses the chip.

Timing discipline (axon tunnel): block_until_ready does not synchronize, so
every phase is scan-amortized or batched and synchronized by a host readback;
warmup calls use the IDENTICAL static shapes as the measured calls, otherwise
the ~20 s remote compile pollutes the measurement.
"""

import dataclasses
import json
import os
import re
import sys
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 2e7

# processes that legitimately hold the single tunnel chip; bench must not
# measure while any is alive (round-4 postmortem: the official capture ran
# against a contended chip and recorded a -12% artifact)
_CHIP_JOB_RE = re.compile(r"experiments/exp_|train_server|infer_server")


def _chip_jobs():
    """PIDs of known chip-holding jobs (read-only /proc scan, never kills)."""
    me = os.getpid()
    jobs = []
    for d in os.listdir("/proc"):
        if not d.isdigit() or int(d) == me:
            continue
        try:
            with open(f"/proc/{d}/cmdline", "rb") as f:
                cmd = f.read().replace(b"\0", b" ").decode(errors="replace")
        except OSError:
            continue
        if "python" in cmd and _CHIP_JOB_RE.search(cmd):
            jobs.append((int(d), cmd.strip()[:120]))
    return jobs


def _wait_chip_idle(max_wait_s=900):
    """Block (bounded) until no known chip job is running, so the one
    emitted JSON line is a steady-state capture, not a contention artifact.
    Diagnostics go to stderr — stdout stays one JSON line."""
    t0 = time.time()
    while True:
        jobs = _chip_jobs()
        if not jobs:
            return True
        if time.time() - t0 > max_wait_s:
            print(f"[bench] WARNING: chip still busy after {max_wait_s}s: "
                  f"{jobs}", file=sys.stderr, flush=True)
            return False
        print(f"[bench] chip busy ({jobs[0][1]}...), waiting",
              file=sys.stderr, flush=True)
        time.sleep(15)

# the reference's per-object protocol
PROTOCOL_TRAIN_STEPS = 2500
PROTOCOL_EVAL_FRAMES = 100
N_CANDIDATES = 540  # largest hemisphere view space (PRV_simulation/Hemisphere)

SCENE_DIR = "/tmp/bench_scene_v2"
BATCH_OBJECTS = 4  # K simultaneously-trained NeRFs for the batched rate


def _scene(camera):
    """Production-res coverage scene (cached across runs)."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "tests"))
    from synthetic import write_scene

    train_js = os.path.join(SCENE_DIR, "train.json")
    test_js = os.path.join(SCENE_DIR, "test.json")
    if not (os.path.exists(train_js) and os.path.exists(test_js)):
        write_scene(
            SCENE_DIR, n_train=16, n_test=8, camera=camera, point_size=3,
            n_points=120000,
        )
    return train_js, test_js


def main():
    if os.environ.get("PRV_BENCH_TINY") != "1":
        _wait_chip_idle()

    import jax
    import jax.numpy as jnp

    from nerf_prv_tpu.core.config import CameraConfig
    from nerf_prv_tpu.core.transforms import scaled_camera
    from nerf_prv_tpu.nerf import NerfConfig, init_params
    from nerf_prv_tpu.nerf.api import eval_nerf
    from nerf_prv_tpu.nerf.rays import load_dataset
    from nerf_prv_tpu.nerf.render import render_views
    from nerf_prv_tpu.nerf.train import build_hit_pool, make_optimizer, train_chunk
    from nerf_prv_tpu.pipeline import score_candidates_rgb_density

    global SCENE_DIR
    tiny = os.environ.get("PRV_BENCH_TINY") == "1"
    if tiny:
        # control-flow smoke (CPU-runnable): validates the timing loops,
        # contention guard and JSON emit — NOT a performance measurement
        cfg = NerfConfig(
            voxel_grid_size=32, voxel_features=4, hidden=32, n_samples=32,
            render_probe_coarse=8, render_probe_fine=16, train_rays=256,
        )
        camera = scaled_camera(CameraConfig(), 8.0)
        SCENE_DIR = SCENE_DIR + "_tiny"
    else:
        cfg = NerfConfig()  # voxel field production defaults
        camera = CameraConfig()

    train_js, test_js = _scene(camera)
    ds = load_dataset(train_js, with_images=True)
    h, w = camera.height, camera.width
    n_frames = ds.n_frames
    pixels_j = jnp.asarray(
        np.clip(np.asarray(ds.pixels) * 255.0 + 0.5, 0, 255).astype(np.uint8)
    )
    rot_j = jnp.asarray(ds.rotations, jnp.float32)
    org_j = jnp.asarray(ds.origins, jnp.float32)

    key = jax.random.PRNGKey(0)
    params = init_params(key, cfg)
    opt_state = make_optimizer(cfg).init(params)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    # ---- training rate ---------------------------------------------------
    # the production trainer runs two phases (train.py): train_warmup_steps
    # of flat marching while geometry forms, then probe-tightened steps;
    # measure each phase's steady-state rate and combine per the protocol
    steps_meas = int(os.environ.get("PRV_BENCH_STEPS", "500"))
    warm_cfg = (
        dataclasses.replace(cfg, train_coarse=0, n_samples=cfg.train_warmup_samples)
        if cfg.train_coarse > 0 and cfg.train_warmup_steps > 0
        else cfg
    )

    # hit-pixel pool: the production train() path precomputes the sphere-hit
    # set once per scene (train.build_hit_pool) instead of oversampling +
    # partitioning per step
    pool, pool_n = (
        build_hit_pool(rot_j, org_j, camera)
        if cfg.bound == "sphere" else (None, None)
    )

    def measure_chunk(phase_cfg, key_seed):
        """Steady-state chunk time, contention-guarded (round-4 weak #1:
        the official capture recorded warmup 12.7 ms/step vs 4.7 steady on
        identical code).  One warm run pays the compile, then re-measure
        until the two best attempts agree within 5% (min is the steady
        state; a contended attempt only ever reads slower), up to 6 tries
        with a backoff when an attempt looks contended."""
        nonlocal params, opt_state
        params, opt_state, losses = train_chunk(
            params, opt_state, jax.random.PRNGKey(key_seed), pixels_j, rot_j,
            org_j, camera, phase_cfg, steps_meas, None, pool, pool_n
        )
        sync(losses)  # warm: pays compile for this exact scan length
        times = []
        for attempt in range(6):
            t0 = time.perf_counter()
            params, opt_state, losses = train_chunk(
                params, opt_state, jax.random.PRNGKey(key_seed + 1 + attempt),
                pixels_j, rot_j, org_j, camera, phase_cfg, steps_meas, None,
                pool, pool_n
            )
            sync(losses)
            times.append(time.perf_counter() - t0)
            if len(times) >= 2:
                best2 = sorted(times)[:2]
                if best2[1] / best2[0] < 1.05:
                    break
            if times[-1] > 1.5 * min(times):
                print(f"[bench] contended attempt {attempt}: "
                      f"{times[-1]:.3f}s vs best {min(times):.3f}s, backing "
                      f"off", file=sys.stderr, flush=True)
                time.sleep(5)
        return min(times)

    t_warm = measure_chunk(warm_cfg, 1)
    t_tight = measure_chunk(cfg, 30) if warm_cfg is not cfg else t_warm
    n_warm = min(cfg.train_warmup_steps, PROTOCOL_TRAIN_STEPS) if warm_cfg is not cfg else 0
    t_train = (
        n_warm * t_warm + (PROTOCOL_TRAIN_STEPS - n_warm) * t_tight
    ) / steps_meas
    train_rate = PROTOCOL_TRAIN_STEPS * cfg.train_rays / t_train  # rays/s

    # ---- render rate (batched frames, one ray stream) ---------------------
    # params now carry ~2000 steps of training on the bench object: the
    # render measures the eval protocol's true workload (trained field,
    # production camera orbit, tile compaction on the object silhouette)
    from nerf_prv_tpu.nerf.render import build_render_aux

    aux = build_render_aux(params, cfg)
    n_render = 8
    # warm TWICE: the first render runs the exact-count path and seeds the
    # speculative chunk-bound cache (render.py _SPEC_COUNTS); the second
    # compiles any slack-rounded speculative shapes.  The timed render then
    # measures the sync-free steady state the production eval loop runs in.
    for _ in range(2):
        imgs = render_views(params, org_j[:n_render], rot_j[:n_render], camera, cfg, aux=aux)
        sync(imgs[..., 3])
    # the production eval loop (api.eval_nerf) runs groups PIPELINED with
    # deferred speculation verification — each group dispatches before the
    # previous one's counts readback — so measure that: n_groups
    # back-to-back deferred renders, one sync at the end (device programs
    # execute in enqueue order, so the last group's alpha readback bounds
    # them all).  Best-of-3: single-shot timing through the axon tunnel
    # jitters 17.8-21.7 M rays/s on identical code.  8 groups ~ the
    # production eval's 12.5 (100 frames / 8), so the pipeline-fill cost
    # is amortized the way the real loop amortizes it.
    n_groups = int(os.environ.get("PRV_BENCH_GROUPS", "8"))

    def render_pipelined():
        t0 = time.perf_counter()
        pending = None
        for _ in range(n_groups):
            imgs, finish = render_views(
                params, org_j[:n_render], rot_j[:n_render], camera, cfg,
                aux=aux, defer=True,
            )
            if pending is not None:
                redo = pending[1]()
                assert redo is None, "bench render under-speculated"
            pending = (imgs, finish)
        redo = pending[1]()
        imgs = pending[0] if redo is None else redo
        sync(imgs[..., 3])
        return time.perf_counter() - t0

    render_pipelined()  # warm: compiles any deferred-path shapes
    t_render = min(render_pipelined() for _ in range(3)) / n_groups
    render_rate = n_render * h * w / t_render  # rays/s

    # ---- quality gate: the protocol eval on the held-out test views --------
    metrics = eval_nerf(params, test_js, cfg)

    # ---- candidate-view scoring (<1 s/object target) ----------------------
    from nerf_prv_tpu.core.pose import camera_to_world

    cam_lo = scaled_camera(camera, 16.0)
    rng = np.random.default_rng(0)
    v = rng.normal(size=(N_CANDIDATES, 3))
    v[:, 2] = np.abs(v[:, 2])
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    c2w = camera_to_world(v * 0.3, np.zeros(3) + 1e-4)
    scale, offset = 0.5 / 0.1, np.array([0.5, 0.5, 0.5])
    rot_c = jnp.asarray(c2w[:, :3, :3][:, [2, 0, 1], :], jnp.float32)
    org_c = jnp.asarray(c2w[:, :3, 3][:, [2, 0, 1]] * scale + offset, jnp.float32)

    def score_once():
        imgs = render_views(params, org_c, rot_c, cam_lo, cfg, aux=aux)
        u8 = jnp.clip(imgs * 255.0 + 0.5, 0, 255).astype(jnp.uint8)
        return sync(score_candidates_rgb_density(u8[:, None]))

    score_once()  # warm
    t0 = time.perf_counter()
    score_once()
    t_score = time.perf_counter() - t0

    # ---- batched dataset-generation rate (K objects at once) --------------
    from nerf_prv_tpu.nerf.batch_train import _train_chunk_batched

    k = BATCH_OBJECTS
    kp = jax.vmap(lambda kk: init_params(kk, cfg))(
        jax.random.split(jax.random.PRNGKey(7), k)
    )
    ks = jax.vmap(make_optimizer(cfg).init)(kp)
    # K copies of the scene stand in for K distinct objects: shapes (and
    # therefore rates) are identical, object content does not affect the
    # fixed-shape train step
    bpix = jnp.broadcast_to(pixels_j[None], (k,) + pixels_j.shape)
    brot = jnp.broadcast_to(rot_j[None], (k,) + rot_j.shape)
    borg = jnp.broadcast_to(org_j[None], (k,) + org_j.shape)
    bnf = jnp.full((k,), n_frames, jnp.int32)
    bpool = (
        jnp.broadcast_to(pool[None], (k,) + pool.shape) if pool is not None else None
    )
    bpool_n = jnp.full((k,), pool_n, jnp.int32) if pool is not None else None
    steps_b = int(os.environ.get("PRV_BENCH_BATCH_STEPS", "200"))
    kp, ks, bl = _train_chunk_batched(
        kp, ks, jax.random.PRNGKey(8), bpix, brot, borg, bnf, camera, cfg, steps_b,
        bpool, bpool_n
    )
    sync(bl)  # warm
    t0 = time.perf_counter()
    kp, ks, bl = _train_chunk_batched(
        kp, ks, jax.random.PRNGKey(9), bpix, brot, borg, bnf, camera, cfg, steps_b,
        bpool, bpool_n
    )
    sync(bl)
    t_batch = time.perf_counter() - t0
    batched_train_rate = k * steps_b * cfg.train_rays / t_batch

    # ---- combined protocol throughput --------------------------------------
    train_rays = PROTOCOL_TRAIN_STEPS * cfg.train_rays
    render_rays = PROTOCOL_EVAL_FRAMES * h * w
    protocol_time = train_rays / train_rate + render_rays / render_rate
    value = (train_rays + render_rays) / protocol_time

    out = {
        "metric": "nerf_rays_per_sec",
        "value": round(value, 1),
        "unit": "rays/s",
        "vs_baseline": round(value / BASELINE_RAYS_PER_SEC, 4),
        "detail": {
            "train_rays_per_sec": round(train_rate, 1),
            "render_rays_per_sec": round(render_rate, 1),
            "train_steps_per_sec": round(PROTOCOL_TRAIN_STEPS / t_train, 2),
            "train_warmup_ms_per_step": round(t_warm / steps_meas * 1e3, 3),
            "train_tight_ms_per_step": round(t_tight / steps_meas * 1e3, 3),
            "protocol_seconds_per_object": round(protocol_time, 2),
            "candidate_scoring_540_views_s": round(t_score, 3),
            "psnr": round(metrics["PSNR"], 2),
            "ssim": round(metrics["SSIM"], 4),
            "batched_objects": k,
            "batched_train_rays_per_sec": round(batched_train_rate, 1),
            # KNOWN-REGRESSION PROBE, not a headline: on ONE chip the
            # vmapped K>1 grid gather/scatter lowers ~1.5x slower per
            # object (exp_batched_train.py + PERF.md); the batched path
            # exists for multi-chip dp meshes (one object per device),
            # exercised end-to-end on the virtual 8-device mesh in
            # tests/test_pipeline.py::test_mode4_batched_dp_mesh.  Tracked
            # here only to detect lowering changes across jax releases.
            "batched_train_single_chip_probe_speedup": round(
                batched_train_rate / train_rate, 3
            ),
            "field": cfg.field_impl,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
