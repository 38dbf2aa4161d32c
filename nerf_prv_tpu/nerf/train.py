"""NeRF training loop.

Equivalent of the reference's ``testbed.frame()`` loop to ``n_steps=2500``
(``Instantngp_scripts/run.py:186-208``, ``DefaultConfiguration.yaml:19``),
rebuilt as one jitted ``lax.scan``: every step samples a fresh ray batch from
the training images on-device, marches, and applies Adam — zero host
round-trips between steps.  Huber loss and Adam(1e-2, 0.9/0.99, eps 1e-15)
follow instant-ngp's defaults.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .model import NerfConfig, init_params
from .rays import RayDataset, rays_from_pixels
from .render import render_rays


def _scale_by_adam_lowp(
    b1: float, b2: float, eps: float, moment_dtype
) -> optax.GradientTransformation:
    """Adam with both moments STORED in ``moment_dtype`` (bf16), computed
    in fp32.  The Adam update is HBM-bound — ~6 passes over params+moments
    per step (artifacts/step_residue.json: 0.436 ms direct of the 2.0 ms
    tight step) — so halving the moment bytes removes ~1/3 of that
    traffic; the casts fuse into the same elementwise kernels (no extra
    passes).  bf16's 8-bit mantissa puts ~0.4% relative error on the
    moments, ~0.2% on the sqrt(nu) denominator — far below the gradient
    noise the 6-seed quality gate resolves."""

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), moment_dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        cf = count.astype(jnp.float32)
        bc1 = 1.0 - b1**cf
        bc2 = 1.0 - b2**cf
        mu32 = jax.tree.map(
            lambda m, g: b1 * m.astype(jnp.float32)
            + (1.0 - b1) * g.astype(jnp.float32),
            state.mu, updates,
        )
        nu32 = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32)
            + (1.0 - b2) * jnp.square(g.astype(jnp.float32)),
            state.nu, updates,
        )
        out = jax.tree.map(
            lambda m, v, g: ((m / bc1) / (jnp.sqrt(v / bc2) + eps)).astype(
                g.dtype
            ),
            mu32, nu32, updates,
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda m: m.astype(moment_dtype), mu32),
            nu=jax.tree.map(lambda v: v.astype(moment_dtype), nu32),
        )
        return out, new_state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(cfg: NerfConfig) -> optax.GradientTransformation:
    def wd_mask(params):
        return {k: k not in ("table", "grid") for k in params}

    if cfg.adam_moment_dtype == "bfloat16":
        adam = _scale_by_adam_lowp(0.9, 0.99, 1e-15, jnp.bfloat16)
    else:
        adam = optax.scale_by_adam(b1=0.9, b2=0.99, eps=1e-15)
    return optax.chain(
        optax.add_decayed_weights(cfg.weight_decay, mask=wd_mask),
        adam,
        optax.scale(-cfg.lr),
    )


@partial(jax.jit, static_argnames=("camera",))
def build_hit_pool(rot, org, camera, n_frames=None):
    """Precompute the sphere-hitting pixel set for a training scene.

    The bounding-sphere hit set is static per scene (cameras are frozen
    during training), so instead of oversampling 4x candidate pixels and
    stable-partitioning per step (argsort over 16k candidates measured
    ~0.85 ms of a 3.9 ms step — experiments/exp_train_anatomy2.py), compute
    the hit set ONCE and sample uniformly from it every step.  The sampling
    distribution is unchanged: the oversample path was itself uniform over
    hit pixels.

    Returns (pool, n_hit): ``pool`` is a flat (F*H*W,) int32 array whose
    first ``n_hit`` entries are the flat indices (f*H*W + v*W + u) of
    sphere-hitting pixels, in raster order.
    """
    from .rays import pixel_dirs_cam, ray_sphere

    h, w = camera.height, camera.width
    u, v = jnp.meshgrid(
        jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32)
    )
    d_cam = pixel_dirs_cam(camera, u.reshape(-1), v.reshape(-1))  # (HW, 3)
    d = jnp.einsum("fij,nj->fni", rot, d_cam)  # rot orthonormal: stays unit
    _, _, valid = ray_sphere(org[:, None, :], d)
    if n_frames is not None:
        f_ids = jnp.arange(rot.shape[0], dtype=jnp.int32)
        valid = valid & (f_ids[:, None] < n_frames)
    valid_flat = valid.reshape(-1)
    n = valid_flat.shape[0]
    # iota-scatter partition (same trick as render._jit_partition_packed):
    # a 14.7M-element argsort would cost ~100 ms, the cumsum+scatter ~20 ms
    pos = jnp.cumsum(valid_flat.astype(jnp.int32)) - 1
    n_hit = pos[-1] + 1
    dest = jnp.where(valid_flat, pos, n)
    pool = jnp.zeros((n,), jnp.int32).at[dest].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop", unique_indices=True
    )
    return pool, n_hit


def _pool_ray_batch(flat_idx, pixels_u8, rot, org, camera):
    """Decode flat pool indices -> (origins, dirs, rgba).  Shared by the
    split, fused, and batched-multi-object samplers so their ray/pixel
    semantics cannot drift apart."""
    n_f, h, w = pixels_u8.shape[:3]
    f = flat_idx // (h * w)
    p = flat_idx % (h * w)
    vi, ui = p // w, p % w
    o, d = rays_from_pixels(rot, org, camera, f, ui.astype(jnp.float32), vi.astype(jnp.float32))
    flat = pixels_u8.reshape(n_f * h * w, pixels_u8.shape[3])
    rgba = flat[flat_idx].astype(jnp.float32) / 255.0
    return o, d, rgba


def _fused_streams(key, n_rays, n_hit, n_samples):
    """ONE random.bits dispatch -> (pool index, bg RGB, march jitter).
    24-bit-mantissa uniforms (jax.random.uniform's construction); modulo
    index bias < n_hit/2^32."""
    bits = jax.random.bits(key, (n_rays, 4 + n_samples), dtype=jnp.uint32)
    r = (bits[:, 0] % jnp.maximum(n_hit, 1).astype(jnp.uint32)).astype(jnp.int32)
    uni = (bits[:, 1:] >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return r, uni[:, :3], uni[:, 3:]


def _sample_batch_pooled(key, pixels_u8, rot, org, camera, n_rays, pool, n_hit):
    """Draw a ray batch uniformly from the precomputed hit-pixel pool."""
    kr, kb = jax.random.split(key)
    r = jax.random.randint(kr, (n_rays,), 0, jnp.maximum(n_hit, 1))
    o, d, rgba = _pool_ray_batch(pool[r], pixels_u8, rot, org, camera)
    bg = jax.random.uniform(kb, (n_rays, 3))
    target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
    return o, d, target, bg


def _sample_batch_pooled_fused(
    key, pixels_u8, rot, org, camera, n_rays, pool, n_hit, n_samples
):
    """One-dispatch variant of :func:`_sample_batch_pooled` that also returns
    the stratified march jitter.

    The split path costs 5-6 separate tiny threefry dispatches per step
    (2 splits + randint + bg uniform + render jitter), measured at ~0.5 ms
    of the 2.8 ms tight step (experiments/exp_step_residue.py) — pure
    launch overhead on rows this small.  ONE ``random.bits`` call yields
    every stream (see :func:`_fused_streams`).  Same distributions,
    different stream — gate via ``cfg.train_rng`` ("fused") with quality
    re-validation."""
    r, bg, jitter = _fused_streams(key, n_rays, n_hit, n_samples)
    o, d, rgba = _pool_ray_batch(pool[r], pixels_u8, rot, org, camera)
    target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
    return o, d, target, bg, jitter


def _hoisted_split_streams(keys, n_rays, n_hit, n_samples):
    """Batch-generate the split path's per-step random streams in ONE
    dispatch, bit-identical to the in-loop derivation.

    The split path's sampling block costs ~0.69 ms of the 2.8 ms tight step
    (artifacts/step_residue.json) — 5-6 tiny threefry kernels re-launched
    every scan iteration.  The "fused" variant removed the launches but
    CHANGED the stream and failed the worst-seed quality gate by 0.05-0.09 dB
    (artifacts/fused_rng.json).  This path removes the launches while keeping
    the stream: it vmaps the *same* pure split/randint/uniform derivation
    chain over the per-step keys —

        ks, km = split(k_i);  kr, kb = split(ks)
        r  = randint(kr, (n_rays,), 0, max(n_hit, 1))     (pool index)
        bg = uniform(kb, (n_rays, 3))                     (background)
        kj = split(km)[1];  jitter = uniform(kj, (n_rays, n_samples))

    — so every value equals what the in-loop path (train_rng="split_inloop")
    would draw at the same step, and the round-2 quality numbers transfer
    verbatim (asserted by tests/test_perf_paths.py::test_hoisted_rng_bit_identical).

    The three streams are PACKED into one (n_steps, n_rays, 4+n_samples)
    block so the scan reads them through ONE dynamic-slice per step.
    Measured on v5e: handing the scan three separate xs arrays re-spent the
    saved launches on three per-iteration slice kernels (tight step
    2.764 ms — no gain over the in-loop 2.759); the packed form is one
    slice (exp_hoisted_rng.py).  The pack dtype is uint32, NOT f32: small
    int32 pool indices bitcast into f32 lanes are denormal bit patterns,
    and the TPU's f32 data paths flush denormals to zero — every ray
    silently sampled pool[0] and full fits collapsed to ~19 dB (the CPU
    identity test can't see it; the on-chip gate run did).  Integer lanes
    are never flushed; bg/jitter travel as their f32 bit patterns and are
    bitcast back at the consumer.
    HBM cost: ~165 MB per 500-step tight chunk / ~98 MB per 125-step warmup
    chunk — two passes (write + scan read) ≈ 0.4 ms amortized, against
    ~0.3-0.7 ms/step of launch overhead removed."""
    ks_km = jax.vmap(jax.random.split)(keys)
    kr_kb = jax.vmap(jax.random.split)(ks_km[:, 0])
    nh = jnp.maximum(n_hit, 1)
    r = jax.vmap(lambda k: jax.random.randint(k, (n_rays,), 0, nh))(kr_kb[:, 0])
    bg = jax.vmap(lambda k: jax.random.uniform(k, (n_rays, 3)))(kr_kb[:, 1])
    kj = jax.vmap(jax.random.split)(ks_km[:, 1])[:, 1]
    jitter = jax.vmap(lambda k: jax.random.uniform(k, (n_rays, n_samples)))(kj)
    packed = jnp.concatenate(
        [
            jax.lax.bitcast_convert_type(r, jnp.uint32)[..., None],
            jax.lax.bitcast_convert_type(bg, jnp.uint32),
            jax.lax.bitcast_convert_type(jitter, jnp.uint32),
        ],
        axis=-1,
    )
    return packed


def _unpack_hoisted(x):
    """(n_rays, 4+n_samples) packed uint32 block -> (pool index, bg, jitter)."""
    r = jax.lax.bitcast_convert_type(x[:, 0], jnp.int32)
    f = jax.lax.bitcast_convert_type(x[:, 1:], jnp.float32)
    return r, f[:, :3], f[:, 3:]


def _sample_batch(key, pixels_u8, rot, org, camera, n_rays, oversample=1, n_frames=None):
    kf, ku, kv, kb = jax.random.split(key, 4)
    n_f, h, w = pixels_u8.shape[:3]
    n_cand = n_rays * max(oversample, 1)
    # n_frames may be a traced scalar < n_f: the frame axis is padded to a
    # bucket size so that every view count in a label sweep (3,5,...,100
    # coverage views) reuses one compiled program instead of paying the
    # ~25 s remote compile per distinct shape
    f = jax.random.randint(kf, (n_cand,), 0, n_f if n_frames is None else n_frames)
    ui = jax.random.randint(ku, (n_cand,), 0, w)
    vi = jax.random.randint(kv, (n_cand,), 0, h)
    o, d = rays_from_pixels(rot, org, camera, f, ui.astype(jnp.float32), vi.astype(jnp.float32))
    if oversample > 1:
        # hit-ray compaction: rays missing the bounding sphere have their
        # density masked to zero downstream, so their field evals and the
        # backward scatter are pure waste (object pixel rates run 3-30%,
        # DefaultConfiguration.yaml object_pixel_rate).  Oversample pixels,
        # keep sphere hits — every marched ray carries gradient signal.
        from .rays import ray_sphere

        _, _, valid = ray_sphere(o, d)
        order = jnp.argsort(~valid)[:n_rays]  # hits first, stable
        f, ui, vi = f[order], ui[order], vi[order]
        o, d = o[order], d[order]
    # single-axis flat gather: multi-axis advanced indexing lowers to a slow
    # multi-dim scatter/gather on TPU
    flat = pixels_u8.reshape(n_f * h * w, pixels_u8.shape[3])
    rgba = flat[(f * h + vi) * w + ui].astype(jnp.float32) / 255.0
    # random background color per ray (≙ ngp random_bg_color): supervises
    # opacity through the known alpha channel instead of leaving empty-space
    # density unconstrained on the black eval background
    bg = jax.random.uniform(kb, (n_rays, 3))
    target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
    return o, d, target, bg


def _huber_mean(err, cfg: NerfConfig):
    delta = cfg.huber_delta
    abs_err = jnp.abs(err)
    huber = jnp.where(
        abs_err <= delta, 0.5 * err * err, delta * (abs_err - 0.5 * delta)
    )
    return jnp.mean(huber)


@partial(jax.jit, static_argnames=("cfg", "camera", "n_steps"), donate_argnums=(0, 1))
def train_chunk(params, opt_state, key, pixels_u8, rot, org, camera, cfg: NerfConfig, n_steps: int, n_frames=None, pool=None, pool_n=None):
    opt = make_optimizer(cfg)
    # baked train probe (cfg.train_probe_refresh): carry a corner-sigma
    # table through the scan, rebake it every `refresh` steps from the live
    # grid, and probe the march interval against the table (one 16-byte
    # gather/sample) instead of running the field MLP per probe midpoint
    use_baked = (
        cfg.train_coarse > 0
        and cfg.train_probe_refresh > 0
        and cfg.field_impl == "voxel"
        and cfg.bound == "sphere"
    )
    if use_baked:
        from .voxelfield import lattice_corner_raw

    # the default pooled path hoists its per-step RNG out of the scan
    # (bit-identical stream, one dispatch — see _hoisted_split_streams);
    # "split_inloop" keeps the in-loop derivation for the identity test
    hoist = (
        pool is not None
        and cfg.train_rng == "split"
        and cfg.n_importance == 0
    )

    def loss_fn(p, inp, probe_raw):
        if hoist:
            r, bg, jitter = _unpack_hoisted(inp)
            o, d, rgba = _pool_ray_batch(pool[r], pixels_u8, rot, org, camera)
            target = rgba[:, :3] * rgba[:, 3:4] + bg * (1.0 - rgba[:, 3:4])
            rgb, acc = render_rays(p, o, d, cfg, jitter=jitter,
                                   probe_raw=probe_raw)
            return _huber_mean(rgb + bg * (1.0 - acc[:, None]) - target, cfg)
        key = inp
        if pool is not None and cfg.train_rng == "fused":
            o, d, target, bg, jitter = _sample_batch_pooled_fused(
                key, pixels_u8, rot, org, camera, cfg.train_rays, pool,
                pool_n, cfg.n_samples,
            )
            rgb, acc = render_rays(p, o, d, cfg, jitter=jitter,
                                   probe_raw=probe_raw)
            return _huber_mean(rgb + bg * (1.0 - acc[:, None]) - target, cfg)
        ks, km = jax.random.split(key)
        if pool is not None:
            o, d, target, bg = _sample_batch_pooled(
                ks, pixels_u8, rot, org, camera, cfg.train_rays, pool, pool_n
            )
        else:
            oversample = cfg.train_hit_oversample if cfg.bound == "sphere" else 1
            o, d, target, bg = _sample_batch(
                ks, pixels_u8, rot, org, camera, cfg.train_rays, oversample, n_frames
            )
        rgb, acc = render_rays(p, o, d, cfg, key=km, probe_raw=probe_raw)
        return _huber_mean(rgb + bg * (1.0 - acc[:, None]) - target, cfg)

    def step(carry, xs):
        p, s, praw = carry
        inp, i = xs
        if use_baked:
            praw = jax.lax.cond(
                i % cfg.train_probe_refresh == 0,
                lambda: lattice_corner_raw(p, cfg).astype(jnp.bfloat16),
                lambda: praw,
            )
        loss, grads = jax.value_and_grad(loss_fn)(p, inp, praw)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return (p, s, praw), loss

    if use_baked:
        g = cfg.voxel_grid_size
        # zeros = "all empty" -> step 0 (i % refresh == 0) rebakes before use
        praw0 = jnp.zeros((g * g * g, 8), jnp.bfloat16)
    else:
        praw0 = None
    keys = jax.random.split(key, n_steps)
    if hoist:
        inp = _hoisted_split_streams(
            keys, cfg.train_rays, pool_n, cfg.n_samples
        )
    else:
        inp = keys
    steps = jnp.arange(n_steps, dtype=jnp.int32)
    (params, opt_state, _), losses = jax.lax.scan(
        step, (params, opt_state, praw0), (inp, steps),
        unroll=cfg.train_scan_unroll,
    )
    return params, opt_state, losses


def train(
    dataset: RayDataset,
    cfg: Optional[NerfConfig] = None,
    seed: int = 0,
    chunk_steps: Optional[int] = None,
    init_from: Optional[dict] = None,
) -> Tuple[dict, np.ndarray]:
    """Train a NeRF on a loaded dataset; returns (params, per-step losses).

    ``init_from`` warm-starts from previously trained parameters (the
    label sweep's next view count, a loaded snapshot) instead of a fresh
    init; the flat warmup phase is skipped since geometry already exists.
    The tree is copied on entry — train_chunk donates its params/opt
    buffers, so the caller's copy stays valid.

    ``chunk_steps`` defaults per field: 500 for the voxel flagship
    (1.4 s/invocation), 5 for the hash field.  The axon tunnel kills the
    TPU worker when ONE XLA execution exceeds ~60 s wall (measured bracket:
    52 s survives, 78 s faults — experiments/exp_exec_watchdog.py).  A
    hash warmup step sorts ~25M gather rows in the backward; a 125-step
    scan in one invocation is far over the limit, and a 25-step chunk
    still faulted once (so the step is ~2-2.5 s, not the ~0.9 s first
    estimated).  5 steps bounds the worst observed cost at ~12 s per
    execution; the per-chunk host sync (~10-30 ms over the tunnel) is
    noise next to the step itself.  5 divides both the 125-step warmup
    and the 2375-step tight phase, so the hash field still compiles one
    program per phase.
    """
    cfg = cfg or NerfConfig()
    if chunk_steps is None:
        chunk_steps = 500 if cfg.field_impl == "voxel" else 5
    if cfg.n_steps <= chunk_steps:
        chunk_steps = cfg.n_steps  # single compile for short runs
    key = jax.random.PRNGKey(seed)
    key, kinit = jax.random.split(key)
    if init_from is not None:
        params = jax.tree.map(lambda x: jnp.array(x, copy=True), init_from)
    else:
        params = init_params(kinit, cfg)
    opt_state = make_optimizer(cfg).init(params)

    pixels_np = np.clip(
        np.asarray(dataset.pixels) * 255.0 + 0.5, 0, 255
    ).astype(np.uint8)
    rot_np = np.asarray(dataset.rotations, np.float32)
    org_np = np.asarray(dataset.origins, np.float32)

    # pad the frame axis to a bucket size so every coverage view count in a
    # label sweep shares one compiled train program (≙ per-shape remote
    # compiles would otherwise dominate mode-4 wall time)
    n_real = pixels_np.shape[0]
    bucket = _frame_bucket(n_real)
    if bucket > n_real:
        pad = bucket - n_real
        pixels_np = np.concatenate([pixels_np, np.zeros((pad,) + pixels_np.shape[1:], np.uint8)])
        rot_np = np.concatenate([rot_np, np.tile(np.eye(3, dtype=np.float32)[None], (pad, 1, 1))])
        org_np = np.concatenate([org_np, np.zeros((pad, 3), np.float32)])
    pixels_u8 = jnp.asarray(pixels_np)
    rot = jnp.asarray(rot_np)
    org = jnp.asarray(org_np)
    n_frames = jnp.int32(n_real)
    pool = pool_n = None
    if cfg.bound == "sphere":
        pool, pool_n = build_hit_pool(rot, org, dataset.camera, n_frames)

    # phase plan: with train_coarse on, geometry first forms during a flat
    # warmup march, then the probe-tightened march takes over (the probe
    # needs a meaningful density field to bound against)
    import dataclasses

    phases = []
    if cfg.train_coarse > 0 and cfg.train_warmup_steps > 0 and init_from is None:
        warm = dataclasses.replace(
            cfg,
            train_coarse=0,
            n_samples=cfg.train_warmup_samples,
            train_rays=cfg.train_warmup_rays or cfg.train_rays,
        )
        n_warm = min(cfg.train_warmup_steps, cfg.n_steps)
        phases.append((warm, n_warm))
        phases.append((cfg, cfg.n_steps - n_warm))
    else:
        phases.append((cfg, cfg.n_steps))

    losses = []
    for phase_cfg, phase_steps in phases:
        steps_left = phase_steps
        while steps_left > 0:
            n = min(chunk_steps, steps_left)
            key, kc = jax.random.split(key)
            params, opt_state, chunk_losses = train_chunk(
                params, opt_state, kc, pixels_u8, rot, org, dataset.camera,
                phase_cfg, n, n_frames, pool, pool_n
            )
            # keep chunk losses ON DEVICE: converting here would block on a
            # ~29 ms tunnel readback per chunk boundary (72 ms with the
            # dispatch gap), serializing chunks that otherwise pipeline
            # asynchronously — at hash's chunk_steps=5 that is ~36 s of pure
            # host-sync overhead per 2,500-step fit
            losses.append(chunk_losses)
            steps_left -= n
    all_losses = (
        np.concatenate([np.asarray(c) for c in losses]) if losses else np.zeros(0)
    )
    if all_losses.size and not np.isfinite(all_losses[-min(100, all_losses.size):]).all():
        # console-print QC in the reference's style (SURVEY.md §4): a
        # diverged fit would otherwise silently poison the PSNR curve and
        # every label derived from it downstream
        print(
            "[train] WARNING: non-finite losses in the final steps — "
            "fit diverged; downstream metrics for this scene are suspect"
        )
    return params, all_losses


def _frame_bucket(n: int) -> int:
    for b in (4, 8, 16, 32, 64, 128):
        if n <= b:
            return b
    return n
