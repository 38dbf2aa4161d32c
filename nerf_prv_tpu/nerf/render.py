"""Volume rendering: fixed-step marching + compositing.

The CUDA testbed the reference drives marches rays with per-ray variable step
counts, ray compaction, and an occupancy grid.  On TPU's dense-tiling model we
instead march a *fixed* number of stratified samples inside each ray's cube
intersection and mask dead samples with transmittance — shapes stay static,
XLA fuses the whole march, and "skipped" work costs nothing extra on the MXU
because the batch is already dense (SURVEY.md §7 hard part (a)).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .model import NerfConfig, field
from .rays import ray_aabb, ray_sphere

MIN_TRANSMITTANCE = 1e-4  # ≙ render_min_transmittance (run.py:235)


def _eval_field(params, pos, dirs_b, cfg):
    n, ns = pos.shape[:2]
    flat_pos = pos.reshape(n * ns, 3)
    flat_dirs = jnp.broadcast_to(dirs_b[:, None, :], (n, ns, 3)).reshape(n * ns, 3)
    if cfg.field_impl == "hash":
        # remat the hash field: recompute gathers + MLPs in the backward pass
        # instead of keeping per-level gather intermediates live in HBM —
        # trades ~2x field FLOPs for an order of magnitude less live memory
        sigma, rgb = jax.checkpoint(
            lambda p, x, d: field(p, x, d, cfg), static_argnums=()
        )(params, flat_pos, flat_dirs)
    else:
        # the voxel field's activations are small; remat would only re-pay
        # the gather latency
        sigma, rgb = field(params, flat_pos, flat_dirs, cfg)
    return sigma.reshape(n, ns), rgb.reshape(n, ns, 3)


def _composite(sigma, rgb, deltas):
    n = sigma.shape[0]
    alpha = 1.0 - jnp.exp(-sigma * deltas)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate([jnp.ones((n, 1)), trans[:, :-1]], axis=-1)
    # transmittance cutoff ≙ ngp's early ray termination
    weights = jnp.where(trans > MIN_TRANSMITTANCE, trans * alpha, 0.0)
    out_rgb = jnp.sum(weights[..., None] * rgb, axis=1)
    out_alpha = jnp.sum(weights, axis=1)
    return out_rgb, out_alpha, weights


def _coarse_density(params, pos, cfg):
    from .model import density

    n, ns = pos.shape[:2]
    return density(params, pos.reshape(n * ns, 3), cfg).reshape(n, ns)


def _tighten_interval(params, origins, dirs, tmin, tmax, valid, nc, cfg):
    """Probe density at ``nc`` midpoints and return the tightened
    (t_lo, t_hi, any_occ) of the occupied-and-visible interval.

    Saturation-aware: probe transmittance collapses a couple of segments
    past the front surface on solid objects, so everything between there
    and the back shell contributes nothing — clamping ``last`` to the
    saturation point concentrates the fine samples on the visible crust
    (a 24-sample tightened march matches a 96-sample full-chord march's
    quality; measured in experiments/exp_quality.py).

    No gradient flows out: the bounds come from comparisons/argmax, so
    XLA drops the probe from the backward pass entirely.
    """
    base_c = (jnp.arange(nc, dtype=jnp.float32)[None, :] + 0.5) / nc
    span_c = tmax - tmin
    ts_c = tmin[:, None] + base_c * span_c[:, None]
    pos_c = origins[:, None, :] + dirs[:, None, :] * ts_c[..., None]
    pos_c = jnp.clip(pos_c, 0.0, 1.0 - 1e-6)
    sigma_c = jax.lax.stop_gradient(
        _coarse_density(params, pos_c, cfg)
    ) * valid[:, None]
    alpha_c = 1.0 - jnp.exp(-sigma_c * (span_c[:, None] / nc))
    occ = alpha_c > 1e-3
    any_occ = jnp.any(occ, axis=-1)
    first = jnp.argmax(occ, axis=-1)
    last = nc - 1 - jnp.argmax(occ[:, ::-1], axis=-1)
    trans_probe = jnp.cumprod(1.0 - alpha_c + 1e-10, axis=-1)
    sat = trans_probe < MIN_TRANSMITTANCE
    first_sat = jnp.where(jnp.any(sat, axis=-1), jnp.argmax(sat, axis=-1), nc - 1)
    last = jnp.minimum(last, first_sat)
    # one-coarse-cell margin on both sides
    lo = jnp.maximum(first - 1, 0).astype(jnp.float32) / nc
    hi = jnp.minimum(last + 2, nc).astype(jnp.float32) / nc
    return tmin + lo * span_c, tmin + hi * span_c, any_occ


def _sample_cdf(ts, weights, n_fine, key):
    """Inverse-CDF sampling of fine ts from coarse weights (jaxnerf-style).

    ``ts`` (N, S) ascending coarse sample positions define S-1 bins; bin mass
    is the mean of its endpoint weights.
    """
    n, s = weights.shape
    w = 0.5 * (weights[:, :-1] + weights[:, 1:]) + 1e-5  # (N, S-1)
    cdf = jnp.cumsum(w, axis=-1)
    cdf = cdf / cdf[:, -1:]
    cdf = jnp.concatenate([jnp.zeros((n, 1)), cdf], axis=-1)  # (N, S)
    if key is not None:
        # no need to pre-sort u: the caller sorts the resulting t_fine
        u = jax.random.uniform(key, (n, n_fine))
    else:
        u = jnp.broadcast_to(
            (jnp.arange(n_fine, dtype=jnp.float32) + 0.5) / n_fine, (n, n_fine)
        )
    # branchless searchsorted: count cdf entries <= u with one (N, F, S)
    # comparison reduce — vmapped binary search lowers to serial while-loops
    # on TPU and costs ~10 ms/step; this is a trivial VPU reduction
    idx = jnp.clip(
        jnp.sum(cdf[:, None, :] <= u[:, :, None], axis=-1).astype(jnp.int32) - 1,
        0,
        s - 2,
    )
    c0 = jnp.take_along_axis(cdf, idx, axis=1)
    c1 = jnp.take_along_axis(cdf, idx + 1, axis=1)
    t0 = jnp.take_along_axis(ts, idx, axis=1)
    t1 = jnp.take_along_axis(ts, idx + 1, axis=1)
    frac = jnp.clip((u - c0) / jnp.maximum(c1 - c0, 1e-8), 0.0, 1.0)
    return t0 + (t1 - t0) * frac


def render_rays(
    params,
    origins: jnp.ndarray,
    dirs: jnp.ndarray,
    cfg: NerfConfig,
    key: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """March rays through the bounded volume; returns (rgb (N,3), alpha (N,)).

    Stratified jitter when ``key`` is given (training); midpoint samples
    otherwise (eval/screenshots — deterministic, spp-free analytic
    compositing instead of the reference's 8-spp averaging, run.py:232).
    With ``cfg.n_importance > 0`` *training* runs a density-only coarse pass
    and evaluates the full field at importance-resampled points; deterministic
    renders always use a flat ``cfg.render_n_samples`` march — importance
    machinery (CDF + per-ray sorts) costs more than it saves when there is
    no backward scatter to shrink (measured: flat-96 2.6 Mrays/s vs
    importance 1.3 Mrays/s at 1280x720 on v5e).
    """
    training = key is not None
    n = origins.shape[0]
    ns = cfg.n_samples if training else (cfg.render_n_samples or cfg.n_samples)
    if cfg.bound == "sphere":
        tmin, tmax, valid = ray_sphere(origins, dirs)
    else:
        tmin, tmax, valid = ray_aabb(origins, dirs)

    if not training and cfg.render_coarse > 0:
        # interval-tightened two-pass render: a cheap density probe at
        # render_coarse midpoints bounds the occupied t-interval, then the
        # flat march concentrates every render sample inside it.  No CDFs,
        # no per-ray sorts — just reductions, so unlike hierarchical
        # sampling this is profitable in the forward-only path.
        tmin, tmax, any_occ = _tighten_interval(
            params, origins, dirs, tmin, tmax, valid, cfg.render_coarse, cfg
        )
        valid = valid & any_occ
    elif training and cfg.train_coarse > 0:
        # same probe for training (no gradient flows through it: the
        # interval bounds come out of comparisons/argmax).  Rays whose
        # occupied probes vanished fall back to the full chord so density
        # can (re)grow anywhere — the probe threshold also guarantees any
        # floater that reaches visible alpha re-enters some ray's interval
        # and receives suppressing gradient.
        t_lo, t_hi, any_occ = _tighten_interval(
            params, origins, dirs, tmin, tmax, valid, cfg.train_coarse, cfg
        )
        tmin = jnp.where(any_occ, t_lo, tmin)
        tmax = jnp.where(any_occ, t_hi, tmax)

    span = (tmax - tmin) / ns
    base = jnp.arange(ns, dtype=jnp.float32)[None, :]
    if key is not None:
        key, kj = jax.random.split(key)
        jitter = jax.random.uniform(kj, (n, ns))
    else:
        jitter = 0.5
    ts = tmin[:, None] + (base + jitter) * span[:, None]
    pos = origins[:, None, :] + dirs[:, None, :] * ts[..., None]  # (N, S, 3)
    pos = jnp.clip(pos, 0.0, 1.0 - 1e-6)

    if cfg.n_importance > 0 and training:
        sigma_c = _coarse_density(params, pos, cfg) * valid[:, None]
        alpha_c = 1.0 - jnp.exp(-sigma_c * span[:, None])
        trans_c = jnp.cumprod(1.0 - alpha_c + 1e-10, axis=-1)
        trans_c = jnp.concatenate([jnp.ones((n, 1)), trans_c[:, :-1]], axis=-1)
        w_c = trans_c * alpha_c
        kf = None
        if key is not None:
            key, kf = jax.random.split(key)
        t_fine = _sample_cdf(ts, jax.lax.stop_gradient(w_c), cfg.n_importance, kf)
        t_fine = jnp.sort(t_fine, axis=-1)
        pos_f = origins[:, None, :] + dirs[:, None, :] * t_fine[..., None]
        pos_f = jnp.clip(pos_f, 0.0, 1.0 - 1e-6)
        sigma, rgb = _eval_field(params, pos_f, dirs, cfg)
        sigma = sigma * valid[:, None]
        deltas = jnp.diff(
            t_fine, axis=-1, append=t_fine[:, -1:] + span[:, None]
        )
        out_rgb, out_alpha, _ = _composite(sigma, rgb, deltas)
        return out_rgb, out_alpha

    sigma, rgb = _eval_field(params, pos, dirs, cfg)
    sigma = sigma * valid[:, None]
    out_rgb, out_alpha, _ = _composite(sigma, rgb, jnp.broadcast_to(span[:, None], sigma.shape))
    return out_rgb, out_alpha


def _default_chunk(cfg: NerfConfig) -> int:
    # the hash field's gather temps cap the chunk; the voxel field streams
    return 1 << 14 if cfg.field_impl == "hash" else 1 << 17


def render_image(
    params,
    origin: jnp.ndarray,
    rotation: jnp.ndarray,
    camera,
    cfg: NerfConfig,
    chunk: Optional[int] = None,
):
    """Full-frame render; returns (H, W, 4) float32 RGBA on black background.

    The alpha channel carries accumulated density, matching how the
    EnsembleRGBDensity baseline reads ngp's RGBA screenshots
    (``main.cpp:2112-2127``).
    """
    return render_views(
        params, origin[None], rotation[None], camera, cfg, chunk=chunk
    )[0]


def render_views(
    params,
    origins: jnp.ndarray,   # (F, 3) grid-space camera centers
    rotations: jnp.ndarray,  # (F, 3, 3)
    camera,
    cfg: NerfConfig,
    chunk: Optional[int] = None,
):
    """Batched multi-frame render -> (F, H, W, 4).

    All frames' rays are flattened into one stream and chunked through a
    single jitted program — one dispatch per chunk, not per frame, which
    matters when dispatch latency is high (remote TPU tunnels).
    """
    from .rays import pixel_dirs_cam

    chunk = chunk or _default_chunk(cfg)
    n_frames = origins.shape[0]
    h, w = camera.height, camera.width
    u, v = jnp.meshgrid(jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32))
    d_cam = pixel_dirs_cam(camera, u.reshape(-1), v.reshape(-1))  # (HW, 3)
    d_grid = jnp.einsum("fij,nj->fni", jnp.asarray(rotations), d_cam)
    d_grid = d_grid / jnp.linalg.norm(d_grid, axis=-1, keepdims=True)
    d_all = d_grid.reshape(-1, 3)
    o_all = jnp.broadcast_to(
        jnp.asarray(origins)[:, None, :], (n_frames, h * w, 3)
    ).reshape(-1, 3)

    n = n_frames * h * w
    # ray compaction: sort hit rays to the front (most coverage-image rays
    # miss the bounding sphere entirely — object pixel rates run 3-30%,
    # cf. object_pixel_rate in DefaultConfiguration.yaml) and march only the
    # chunks that contain hits; misses composite to black/alpha 0 exactly.
    if cfg.bound == "sphere":
        # one fused (N, 6) permutation gather + a gather-based un-permute
        # (vs two gathers + a scatter: scatters run ~60M rows/s on v5e where
        # gathers run ~250M — measured in experiments/exp_vmem_gather.py)
        od_sorted, pos, n_hit = _compact_rays(o_all, d_all)
        n_hit = int(n_hit)
        pad = (-n) % chunk
        od_pad = jnp.concatenate(
            [od_sorted, jnp.tile(jnp.asarray([[0.0, 0, 0, 1, 1, 1]]), (pad, 1))]
        )
        outs = []
        stop = min(n + pad, ((n_hit + chunk - 1) // chunk) * chunk)
        for i in range(0, stop, chunk):
            rgb, a = _jit_render(
                params, od_pad[i : i + chunk, :3], od_pad[i : i + chunk, 3:], cfg
            )
            outs.append(jnp.concatenate([rgb, a[:, None]], axis=-1))
        rgba_hit = (
            jnp.concatenate(outs) if outs else jnp.zeros((0, 4))
        )
        rgb, a = _gather_back(rgba_hit, pos, n)
    else:
        pad = (-n) % chunk
        d_pad = jnp.concatenate([d_all, jnp.ones((pad, 3))], axis=0)
        o_pad = jnp.concatenate([o_all, jnp.zeros((pad, 3))], axis=0)
        outs_rgb, outs_a = [], []
        for i in range(0, n + pad, chunk):
            rgb, a = _jit_render(params, o_pad[i : i + chunk], d_pad[i : i + chunk], cfg)
            outs_rgb.append(rgb)
            outs_a.append(a)
        rgb = jnp.concatenate(outs_rgb)[:n]
        a = jnp.concatenate(outs_a)[:n]
    rgb = rgb.reshape(n_frames, h, w, 3)
    a = a.reshape(n_frames, h, w)
    return jnp.concatenate([rgb, a[..., None]], axis=-1)


@jax.jit
def _hit_order(origins, dirs):
    # stable partition (hits first) without a multi-million-element sort:
    # two cumsums give each ray its destination slot, one unique-index
    # scatter of iota inverts that into a gather permutation
    _, _, valid = ray_sphere(origins, dirs)
    n = valid.shape[0]
    n_hit = jnp.sum(valid)
    pos_hit = jnp.cumsum(valid) - 1
    pos_miss = n_hit + jnp.cumsum(~valid) - 1
    pos = jnp.where(valid, pos_hit, pos_miss).astype(jnp.int32)
    order = jnp.zeros((n,), jnp.int32).at[pos].set(
        jnp.arange(n, dtype=jnp.int32), unique_indices=True
    )
    return order, pos, n_hit


@jax.jit
def _compact_rays(origins, dirs):
    """Partition rays hits-first; returns (od_sorted (N,6), pos, n_hit).

    ``pos`` is each original ray's destination slot in the compacted order,
    so un-permuting results is a plain gather (``_gather_back``) — no
    scatter anywhere on the multi-million-ray axis.
    """
    order, pos, n_hit = _hit_order(origins, dirs)
    od = jnp.concatenate([origins, dirs], axis=-1)
    return od[order], pos, n_hit


@jax.jit
def _gather_back(rgba_hit, pos, n):
    m = rgba_hit.shape[0]
    # rays whose slot is beyond the marched prefix (misses, or hits dropped
    # by a zero-frame edge case) read the zero pad row
    padded = jnp.concatenate([rgba_hit, jnp.zeros((1, 4), rgba_hit.dtype)])
    out = padded[jnp.minimum(pos, m)]
    return out[:, :3], out[:, 3]


@partial(jax.jit, static_argnames=("cfg",))
def _jit_render(params, origins, dirs, cfg):
    return render_rays(params, origins, dirs, cfg, key=None)
