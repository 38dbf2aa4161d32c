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
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .model import NerfConfig, field
from .rays import ray_aabb, ray_sphere

MIN_TRANSMITTANCE = 1e-4  # ≙ render_min_transmittance (run.py:235)

_PROBE_BLOCK = 2  # cells per pooled occupancy block (render aux level 1)

# NerfConfig.render_n_samples dataclass default; render_rays bumps only this
# value to 32 on the aux-less path (an explicit user setting is honored)
from .model import NerfConfig as _NC
_RENDER_NS_DEFAULT = _NC.__dataclass_fields__["render_n_samples"].default
del _NC


class RenderAux(NamedTuple):
    """Per-render-pass precomputed occupancy tables (see build_render_aux)."""

    cell_raw: jnp.ndarray  # (g^3, 8) bf16 — raw log-density at cell corners
    pooled: jnp.ndarray    # (nb, nb, nb) f32 — dilated block-max sigma


def build_render_aux(params, cfg: NerfConfig) -> Optional[RenderAux]:
    """Precompute the two-level occupancy tables for fast render probing.

    Level 2 is sigma at every cell corner (one dense pass, ~0.5M MLP rows);
    level 1 is its per-4^3-block max, dilated by one block so a
    nearest-block lookup is conservative for samples whose probe segment
    overhangs the block.  Rebuilt per render pass — the field is frozen
    while rendering.
    """
    if cfg.field_impl != "voxel" or cfg.bound != "sphere":
        return None
    return _build_render_aux_jit(params, cfg)


@partial(jax.jit, static_argnames=("cfg",))
def _build_render_aux_jit(params, cfg: NerfConfig) -> RenderAux:
    # one fused program: built eagerly this is ~50 tiny dispatches, which
    # costs seconds over a remote-TPU tunnel
    from .voxelfield import lattice_corner_raw

    g = cfg.voxel_grid_size
    cs = lattice_corner_raw(params, cfg)  # (g^3, 8) f32
    cell_max = jnp.exp(jnp.max(cs, axis=-1)).reshape(g, g, g)
    # cells with any index g-1 are never gathered (cell_and_frac caps the
    # cell at g-2); their clipped-corner sigmas would otherwise leak
    # phantom occupancy into the pooled volume at the +x/+y/+z boundary
    cell_max = cell_max.at[g - 1, :, :].set(0.0)
    cell_max = cell_max.at[:, g - 1, :].set(0.0)
    cell_max = cell_max.at[:, :, g - 1].set(0.0)
    nb = -(-g // _PROBE_BLOCK)
    pad = nb * _PROBE_BLOCK - g
    cm = jnp.pad(cell_max, ((0, pad),) * 3)
    pooled = cm.reshape(nb, _PROBE_BLOCK, nb, _PROBE_BLOCK, nb, _PROBE_BLOCK).max(
        axis=(1, 3, 5)
    )
    p = jnp.pad(pooled, 1, mode="edge")
    dil = pooled
    for dx in (0, 1, 2):
        for dy in (0, 1, 2):
            for dz in (0, 1, 2):
                dil = jnp.maximum(dil, p[dx : dx + nb, dy : dy + nb, dz : dz + nb])
    return RenderAux(cs.astype(jnp.bfloat16), dil)


def _pooled_lookup(pooled: jnp.ndarray, pos: jnp.ndarray, g: int) -> jnp.ndarray:
    """Nearest-block values for pos (N, S, 3) in [0,1] — as one-hot
    matmuls over the tiny pooled volume, not gathers (row-count is the
    gather bottleneck: a flat gather measured 72 M lookups/s where the
    one-hot forms run 177-208 M; experiments/exp_probe_l1_variants.py).
    The (x, y) axes fuse into one bf16 one-hot against a (nb^2, nb)
    matmul — the fastest variant measured, and its largest live tensor
    is the (M, nb^2) bf16 one-hot instead of an (M, nb^2) f32 product.
    bf16 rounding of the pooled sigmas is harmless here: the values only
    feed the occupancy threshold, whose margins the block dilation
    dominates."""
    nb = pooled.shape[0]
    n, s = pos.shape[:2]
    b = jnp.clip(
        (pos.reshape(-1, 3) * (g - 1) / _PROBE_BLOCK).astype(jnp.int32), 0, nb - 1
    )
    ar2 = jnp.arange(nb * nb, dtype=jnp.int32)
    oxy = ((b[:, 0] * nb + b[:, 1])[:, None] == ar2[None, :]).astype(jnp.bfloat16)
    vz = oxy @ pooled.reshape(nb * nb, nb).astype(jnp.bfloat16)  # (M, nb)
    ar = jnp.arange(nb, dtype=jnp.int32)
    oz = (b[:, 2:3] == ar[None, :]).astype(jnp.bfloat16)
    return jnp.sum(vz * oz, axis=1).astype(jnp.float32).reshape(n, s)


def _cell_sigma_at(cell_raw: jnp.ndarray, pos: jnp.ndarray, g: int) -> jnp.ndarray:
    """Sigma from trilinear RAW log-density interpolation at pos (N, S, 3):
    one 16-byte row gather per sample (exp after interpolation — the
    conservative side for saturation clamping, see lattice_corner_raw)."""
    from .voxelfield import cell_and_frac, corner_weights

    n, s = pos.shape[:2]
    row_idx, frac = cell_and_frac(pos.reshape(-1, 3), g)
    rows = cell_raw[row_idx].astype(jnp.float32)  # (M, 8)
    w = corner_weights(frac)
    return jnp.exp(jnp.sum(rows * w, axis=-1)).reshape(n, s)


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
    return _clamp_occupied(sigma_c, tmin, span_c, nc)


def _clamp_occupied(sigma_c, tmin, span_c, nc):
    """Saturation-aware occupied-interval clamp from probe sigmas (N, nc)."""
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


def _tighten_interval_baked(cell_raw, origins, dirs, tmin, tmax, valid, nc, cfg):
    """Train-time probe against a periodically-rebaked corner-sigma table.

    Identical clamp logic to ``_tighten_interval`` but sigma comes from
    trilinear interpolation of the baked (g^3, 8) raw table (ONE 16-byte
    row gather per probe sample, ``_cell_sigma_at``) instead of a full
    field-MLP evaluation — the same approximation the validated level-2
    render probe uses.  The table is rebaked every
    ``cfg.train_probe_refresh`` steps inside the train scan (train.py), so
    it lags the live field by at most that many steps; rays whose stale
    probes all read empty fall back to the full chord (render_rays), which
    bounds the cost of staleness to a few steps of delayed tightening.
    """
    g = cfg.voxel_grid_size
    base_c = (jnp.arange(nc, dtype=jnp.float32)[None, :] + 0.5) / nc
    span_c = tmax - tmin
    ts_c = tmin[:, None] + base_c * span_c[:, None]
    pos_c = jnp.clip(
        origins[:, None, :] + dirs[:, None, :] * ts_c[..., None], 0.0, 1.0 - 1e-6
    )
    sigma_c = _cell_sigma_at(cell_raw, pos_c, g) * valid[:, None]
    return _clamp_occupied(sigma_c, tmin, span_c, nc)


def _probe_level1(aux: RenderAux, origins, dirs, tmin, tmax, valid, cfg):
    """Level-1 render probe: render_probe_coarse samples against the
    dilated block-max volume via factorized one-hot matmuls — zero
    gathers.  Returns the tightened (t1min, t1max, any1).
    """
    g = cfg.voxel_grid_size
    # level-1 detection reach per sample is (1 + 2 dilation) * block
    # = 3 * _PROBE_BLOCK = 6 cells; keep sample spacing below it whatever
    # the grid size (a chord spans up to ~1.04 * (g-1) cells).  Note the
    # occupancy tables are *approximations* of the field, not conservative
    # bounds: block-max/trilinear values come from corner sigmas, and the
    # MLP's nonlinear blend can exceed them mid-cell.  The margins below
    # plus the thin-geometry stress test (experiments/exp_thin_geometry.py)
    # bound the miss risk empirically.
    reach = 3 * _PROBE_BLOCK
    n1 = max(cfg.render_probe_coarse, -(-int(1.04 * (g - 1)) // reach))
    span = tmax - tmin

    base1 = (jnp.arange(n1, dtype=jnp.float32)[None, :] + 0.5) / n1
    ts1 = tmin[:, None] + base1 * span[:, None]
    pos1 = jnp.clip(
        origins[:, None, :] + dirs[:, None, :] * ts1[..., None], 0.0, 1.0 - 1e-6
    )
    pool = _pooled_lookup(aux.pooled, pos1, g)
    delta1 = span[:, None] / n1
    occ1 = (1.0 - jnp.exp(-pool * delta1) > 1e-3) & valid[:, None]
    any1 = jnp.any(occ1, axis=-1)
    first1 = jnp.argmax(occ1, axis=-1).astype(jnp.float32)
    last1 = (n1 - 1 - jnp.argmax(occ1[:, ::-1], axis=-1)).astype(jnp.float32)
    # half-segment margin; the block dilation already covers overhang
    lo1 = jnp.maximum(first1 - 0.5, 0.0) / n1
    hi1 = jnp.minimum(last1 + 1.5, n1) / n1
    return tmin + lo1 * span, tmin + hi1 * span, any1


def _probe_level2(aux: RenderAux, origins, dirs, t1min, t1max, cfg):
    """Level-2 render probe: render_probe_fine samples of trilinear
    corner-sigma — one 16-byte row gather each, instead of the full field
    MLP probe (a ~64-byte-row gather + PE + MLP per sample).  Same
    saturation-aware clamping as ``_tighten_interval``.
    """
    g = cfg.voxel_grid_size
    n2 = cfg.render_probe_fine
    span2 = t1max - t1min
    base2 = (jnp.arange(n2, dtype=jnp.float32)[None, :] + 0.5) / n2
    ts2 = t1min[:, None] + base2 * span2[:, None]
    pos2 = jnp.clip(
        origins[:, None, :] + dirs[:, None, :] * ts2[..., None], 0.0, 1.0 - 1e-6
    )
    sig2 = _cell_sigma_at(aux.cell_raw, pos2, g)
    alpha2 = 1.0 - jnp.exp(-sig2 * (span2[:, None] / n2))
    occ2 = alpha2 > 1e-3
    any2 = jnp.any(occ2, axis=-1)
    first2 = jnp.argmax(occ2, axis=-1)
    last2 = n2 - 1 - jnp.argmax(occ2[:, ::-1], axis=-1)
    trans2 = jnp.cumprod(1.0 - alpha2 + 1e-10, axis=-1)
    sat = trans2 < MIN_TRANSMITTANCE
    first_sat = jnp.where(jnp.any(sat, axis=-1), jnp.argmax(sat, axis=-1), n2 - 1)
    last2 = jnp.minimum(last2, first_sat)
    lo2 = jnp.maximum(first2 - 1, 0).astype(jnp.float32) / n2
    hi2 = jnp.minimum(last2 + 2, n2).astype(jnp.float32) / n2
    return t1min + lo2 * span2, t1min + hi2 * span2, any2


def _tighten_interval_aux(aux: RenderAux, origins, dirs, tmin, tmax, valid, cfg):
    """Two-level render probe (level-1 pooled + level-2 corner-sigma) —
    the fused form; the three-phase tile render calls the levels
    separately with a compaction in between."""
    t1min, t1max, any1 = _probe_level1(aux, origins, dirs, tmin, tmax, valid, cfg)
    tlo, thi, any2 = _probe_level2(aux, origins, dirs, t1min, t1max, cfg)
    return tlo, thi, any1 & any2


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
    aux: Optional[RenderAux] = None,
    probe_raw: Optional[jnp.ndarray] = None,
    jitter: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """March rays through the bounded volume; returns (rgb (N,3), alpha (N,)).

    Stratified jitter when ``key`` is given (training); midpoint samples
    otherwise (eval/screenshots — deterministic, spp-free analytic
    compositing instead of the reference's 8-spp averaging, run.py:232).
    A precomputed ``jitter`` (N, n_samples) also selects the training
    march (cfg.train_rng="fused" hands the whole step's randomness in
    one block; requires cfg.n_importance == 0).
    With ``cfg.n_importance > 0`` *training* runs a density-only coarse pass
    and evaluates the full field at importance-resampled points; deterministic
    renders always use a flat ``cfg.render_n_samples`` march — importance
    machinery (CDF + per-ray sorts) costs more than it saves when there is
    no backward scatter to shrink (measured: flat-96 2.6 Mrays/s vs
    importance 1.3 Mrays/s at 1280x720 on v5e).
    """
    training = key is not None or jitter is not None
    if jitter is not None and cfg.n_importance > 0:
        raise ValueError("precomputed jitter requires cfg.n_importance == 0")
    n = origins.shape[0]
    if training:
        ns = cfg.n_samples
    else:
        ns = cfg.render_n_samples or cfg.n_samples
        if aux is None and cfg.render_n_samples == _RENDER_NS_DEFAULT:
            # the 24-fine-sample default is only lossless with the
            # two-level aux probe's tighter intervals (exp_pe.py); the
            # MLP-probe fallback (hash field / cube bound) measured
            # -0.08 dB at 24 vs 32 and gets the larger count.  Only the
            # *default* is bumped — an explicit render_n_samples is
            # honored on every path.
            ns = max(ns, 32)
    if cfg.bound == "sphere":
        tmin, tmax, valid = ray_sphere(origins, dirs)
    else:
        tmin, tmax, valid = ray_aabb(origins, dirs)

    if not training and cfg.render_coarse > 0:
        # interval-tightened two-pass render: a cheap density probe bounds
        # the occupied t-interval, then the flat march concentrates every
        # render sample inside it.  No CDFs, no per-ray sorts — just
        # reductions, so unlike hierarchical sampling this is profitable
        # in the forward-only path.  With a RenderAux the probe runs
        # against precomputed occupancy tables (two-level, far fewer and
        # narrower gathers); without, it evaluates the field MLP directly.
        if aux is not None:
            tmin, tmax, any_occ = _tighten_interval_aux(
                aux, origins, dirs, tmin, tmax, valid, cfg
            )
        else:
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
        # and receives suppressing gradient (with probe_raw, delayed by at
        # most cfg.train_probe_refresh steps until the next table bake).
        if probe_raw is not None:
            t_lo, t_hi, any_occ = _tighten_interval_baked(
                probe_raw, origins, dirs, tmin, tmax, valid, cfg.train_coarse, cfg
            )
        else:
            t_lo, t_hi, any_occ = _tighten_interval(
                params, origins, dirs, tmin, tmax, valid, cfg.train_coarse, cfg
            )
        tmin = jnp.where(any_occ, t_lo, tmin)
        tmax = jnp.where(any_occ, t_hi, tmax)

    span = (tmax - tmin) / ns
    base = jnp.arange(ns, dtype=jnp.float32)[None, :]
    if jitter is None:
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
    aux: Optional[RenderAux] = None,
    defer: bool = False,
):
    """Batched multi-frame render -> (F, H, W, 4).

    All frames' rays are flattened into one stream and chunked through a
    single jitted program — one dispatch per chunk, not per frame, which
    matters when dispatch latency is high (remote TPU tunnels).

    ``defer=True`` returns ``(rgba, finish)`` instead: the render is
    dispatched but its speculative chunk bounds are NOT yet verified.
    The caller should dispatch its next group (or any derived compute —
    eval metrics, scoring) and only then call ``finish()``, which
    returns None when the speculative output was valid, or a corrected
    rgba array the caller must re-derive from (rare; see
    ``_render_tiles_two_phase``).  Pipelining groups this way hides the
    per-group verification readback + dispatch gap (~72 ms through the
    axon tunnel) under the next group's device work.
    """
    chunk = chunk or _default_chunk(cfg)
    n_frames = origins.shape[0]
    h, w = camera.height, camera.width
    d_cam = _cached_pixel_dirs(camera)  # (HW, 3), device-resident

    if aux is None and cfg.render_coarse > 0:
        # callers rendering one frame group; multi-group callers (eval,
        # screenshots, video) build the aux once and pass it in — the
        # tables depend only on the frozen params
        aux = build_render_aux(params, cfg)
    n = n_frames * h * w
    # ray compaction: sort hit rays to the front (most coverage-image rays
    # miss the bounding sphere entirely — object pixel rates run 3-30%,
    # cf. object_pixel_rate in DefaultConfiguration.yaml) and march only the
    # chunks that contain hits; misses composite to black/alpha 0 exactly.
    if cfg.bound == "sphere" and w >= 512:
        # tile-level compaction: per-RAY permutation (hits-first gather +
        # un-permute) costs the big-table gather rate (~80M rows/s on
        # multi-hundred-MB ray sets — ~450 ms per 8 frames); grouping rays
        # into _RENDER_TILE-pixel tiles turns it into a few thousand
        # 3-KB-row block gathers and one unique block scatter (~free), at
        # the price of marching the partially-empty silhouette-edge tiles.
        # Narrow frames (candidate scoring at 80x45) inflate tile occupancy
        # past the permutation savings and take the per-ray path below.
        t = _RENDER_TILE
        npad = (-n) % t
        n_p = n + npad
        n_tiles = n_p // t
        od_t, order_t, n_act_dev = _jit_assemble_tiles(
            jnp.asarray(origins), jnp.asarray(rotations), d_cam, t, npad
        )
        ct = max(chunk // t, 1)
        finish_t = _finish_noop
        if aux is not None and cfg.render_coarse > 0:
            out = _render_tiles_two_phase(
                params, od_t, order_t, n_act_dev, n_tiles, t, cfg, aux, chunk,
                defer=defer,
            )
            if defer:
                out, finish_t = out
        else:
            n_act = int(n_act_dev)
            stop_t = min(
                ((n_act + ct - 1) // ct) * ct, ((n_tiles + ct - 1) // ct) * ct
            )
            order_pad = jnp.concatenate(
                [order_t, jnp.zeros((max(stop_t - n_tiles, 0),), jnp.int32)]
            )
            outs = []
            for i in range(0, stop_t, ct):
                outs.append(
                    _jit_render_tiles(params, od_t, order_pad[i : i + ct], cfg, aux)
                )
            if outs:
                rgba_t = jnp.concatenate(outs)
                out = _scatter_tiles(
                    rgba_t, order_pad[: rgba_t.shape[0]], n_tiles, n_act
                )
            else:
                out = jnp.zeros((n_tiles, 4 * t))
        rgba = out.reshape(n_p, 4)[:n]
        rgb, a = rgba[:, :3], rgba[:, 3]
        if defer:
            final = jnp.concatenate(
                [
                    rgb.reshape(n_frames, h, w, 3),
                    a.reshape(n_frames, h, w)[..., None],
                ],
                axis=-1,
            )

            def finish(_f=finish_t):
                redo = _f()
                if redo is None:
                    return None
                rgba2 = redo.reshape(n_p, 4)[:n]
                return jnp.concatenate(
                    [
                        rgba2[:, :3].reshape(n_frames, h, w, 3),
                        rgba2[:, 3].reshape(n_frames, h, w)[..., None],
                    ],
                    axis=-1,
                )

            return final, finish
    elif cfg.bound == "sphere":
        # per-ray compaction: one fused (N, 6) permutation gather + a
        # gather-based un-permute (scatters run ~60M rows/s on v5e where
        # gathers run ~80-250M; experiments/exp_vmem_gather.py)
        o_all, d_all = _jit_assemble_rays(
            jnp.asarray(origins), jnp.asarray(rotations), d_cam
        )
        od_sorted, pos, n_hit = _compact_rays(o_all, d_all)
        n_hit = int(n_hit)
        pad = (-n) % chunk
        od_pad = jnp.concatenate(
            [od_sorted, jnp.tile(jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, 1.0]]), (pad, 1))]
        )
        outs = []
        stop = min(n + pad, ((n_hit + chunk - 1) // chunk) * chunk)
        for i in range(0, stop, chunk):
            rgb, a = _jit_render(
                params, od_pad[i : i + chunk, :3], od_pad[i : i + chunk, 3:], cfg, aux
            )
            outs.append(jnp.concatenate([rgb, a[:, None]], axis=-1))
        rgba_hit = jnp.concatenate(outs) if outs else jnp.zeros((0, 4))
        rgb, a = _gather_back(rgba_hit, pos, n)
    else:
        o_all, d_all = _jit_assemble_rays(
            jnp.asarray(origins), jnp.asarray(rotations), d_cam
        )
        pad = (-n) % chunk
        d_pad = jnp.concatenate([d_all, jnp.ones((pad, 3))], axis=0)
        o_pad = jnp.concatenate([o_all, jnp.zeros((pad, 3))], axis=0)
        outs_rgb, outs_a = [], []
        for i in range(0, n + pad, chunk):
            rgb, a = _jit_render(params, o_pad[i : i + chunk], d_pad[i : i + chunk], cfg, aux)
            outs_rgb.append(rgb)
            outs_a.append(a)
        rgb = jnp.concatenate(outs_rgb)[:n]
        a = jnp.concatenate(outs_a)[:n]
    rgb = rgb.reshape(n_frames, h, w, 3)
    a = a.reshape(n_frames, h, w)
    rgba = jnp.concatenate([rgb, a[..., None]], axis=-1)
    # per-ray / aux-less / cube-bound paths verify inline (they sync on
    # their hit counts anyway) — the deferred contract is a no-op there
    return (rgba, _finish_noop) if defer else rgba


_RENDER_TILE = 128  # rays per compaction tile (render_views sphere path)

# per-camera pixel-direction cache: intrinsics never change within a run,
# and recomputing the (HW, 3) directions eagerly cost several dispatches
# over million-ray arrays per render group
_DCAM_CACHE: dict = {}


def _cached_pixel_dirs(camera):
    d = _DCAM_CACHE.get(camera)
    if d is None:
        from .rays import pixel_dirs_cam

        h, w = camera.height, camera.width
        u, v = jnp.meshgrid(
            jnp.arange(w, dtype=jnp.float32), jnp.arange(h, dtype=jnp.float32)
        )
        d = pixel_dirs_cam(camera, u.reshape(-1), v.reshape(-1))  # (HW, 3)
        d.block_until_ready()
        _DCAM_CACHE[camera] = d
    return d


@jax.jit
def _jit_assemble_rays(origins, rotations, d_cam):
    """(F,3) origins + (F,3,3) rotations + camera dirs -> flat ray stream."""
    n_frames = origins.shape[0]
    hw = d_cam.shape[0]
    d_grid = jnp.einsum("fij,nj->fni", rotations, d_cam)
    d_grid = d_grid / jnp.linalg.norm(d_grid, axis=-1, keepdims=True)
    o_all = jnp.broadcast_to(origins[:, None, :], (n_frames, hw, 3)).reshape(-1, 3)
    return o_all, d_grid.reshape(-1, 3)


@partial(jax.jit, static_argnames=("t", "npad"))
def _jit_assemble_tiles(origins, rotations, d_cam, t, npad):
    """One fused program for the tile path's whole ray-stream assembly:
    world-space directions, the (o | d) packing, miss-ray padding, the
    tile reshape and the active-tiles-first tile order.  Eagerly this was
    ~8 dispatches over multi-million-ray arrays per render group."""
    o_all, d_all = _jit_assemble_rays(origins, rotations, d_cam)
    od = jnp.concatenate([o_all, d_all], axis=-1)
    if npad:
        # pad rays point away from the volume -> sphere miss
        miss = jnp.tile(jnp.asarray([[0.5, 0.5, 2.0, 0.0, 0.0, 1.0]]), (npad, 1))
        od = jnp.concatenate([od, miss])
    n_tiles = od.shape[0] // t
    od_t = od.reshape(n_tiles, 6 * t)
    order_t, n_act = _tile_order(od, t)
    return od_t, order_t, n_act


@partial(jax.jit, static_argnames=("t",))
def _tile_order(od, t):
    """Active-tiles-first permutation over _RENDER_TILE-ray tiles.

    Same cumsum partition as ``_hit_order`` but over the tile axis — a few
    ten-thousand elements instead of millions, so it costs microseconds.
    """
    _, _, valid = ray_sphere(od[:, :3], od[:, 3:])
    th = jnp.any(valid.reshape(-1, t), axis=1)
    m = th.shape[0]
    n_act = jnp.sum(th)
    pos_hit = jnp.cumsum(th) - 1
    pos_miss = n_act + jnp.cumsum(~th) - 1
    pos = jnp.where(th, pos_hit, pos_miss).astype(jnp.int32)
    order = jnp.zeros((m,), jnp.int32).at[pos].set(
        jnp.arange(m, dtype=jnp.int32), unique_indices=True
    )
    return order, n_act


@partial(jax.jit, static_argnames=("n_tiles",))
def _scatter_tiles(rgba_t, tidx, n_tiles, n_act):
    # unique block scatter; rows beyond the active count are chunk padding
    # (tile 0 re-marched) and get dropped via an out-of-range index
    m = rgba_t.shape[0]
    safe = jnp.where(jnp.arange(m) < n_act, tidx, n_tiles)
    out = jnp.zeros((n_tiles, rgba_t.shape[1]), rgba_t.dtype)
    # no unique_indices promise: the padding rows all carry the same
    # out-of-range index, and a backend exploiting the hint could corrupt
    # tiles; drop-mode alone is sufficient and safe
    return out.at[safe].set(rgba_t, mode="drop")


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
def _jit_render(params, origins, dirs, cfg, aux=None):
    return render_rays(params, origins, dirs, cfg, key=None, aux=aux)


# speculative chunk bounds for the sync-free pipeline below, keyed by
# (n_tiles, t, chunk, bucket-config); values are the EXACT per-level
# chunk needs observed on the previous call
_SPEC_COUNTS: dict = {}


def _finish_noop():
    """Deferred-render finish for paths that verified inline: valid as-is."""
    return None


@jax.jit
def _jit_stack_counts(a, b, c, d):
    return jnp.stack([a, b, c, d]).astype(jnp.int32)


def _render_tiles_two_phase(
    params, od_t, order_t, n_act_dev, n_tiles, t, cfg, aux, chunk, defer=False
):
    """Probe-then-march tile render, three phases with compaction between
    each: A1 probes EVERY active-tile ray against the dilated block-max
    volume (one-hot matmuls, zero gathers); A2 probes ONLY the
    level-1-occupied rays against the corner-sigma table (24 narrow row
    gathers/ray); B fine-marches ONLY the level-2-occupied rays (24 wide
    rows + MLP per ray).  Each split moves the next, more expensive stage
    onto the smaller surviving subset; outputs are bit-identical to the
    fused path (rays dropped at any level composite to exact zeros either
    way).

    SYNC-FREE STEADY STATE: each stage's chunk count needs the previous
    stage's survivor count, and a host readback through the axon tunnel
    costs ~29 ms (experiments/exp_march_fixed.py) — three per render group
    was ~18% of the whole render.  Instead the chunk bounds are
    SPECULATED from the previous call's counts plus one chunk of margin
    (consecutive orbit views drift slowly), every stage is issued without
    blocking, and the actual counts come back in ONE readback that
    overlaps the still-executing march.  Over-speculation probes dead
    rays (occ=0 — harmless, bounded by the margin); under-speculation is
    detected by the readback and falls back to this same function in
    exact mode (rare).  First call per shape runs exact and seeds the
    cache.

    ``defer=True`` (speculative mode only) goes one step further: even
    the ONE verification readback blocks until the whole group's queued
    march drains (TPU programs execute in enqueue order, so the count
    stack enqueued after the march only completes after it), which
    serializes consecutive render groups on the host — measured ~29 ms
    readback + ~43 ms dispatch gap per 8-frame group
    (experiments/exp_render_anatomy4.py).  Instead of verifying inline,
    the function returns ``(out, finish)``: the caller dispatches the
    NEXT group first, then calls ``finish()`` — by which time this
    group's device work has completed underneath the next group's host
    assembly.  ``finish()`` verifies, updates the speculation cache, and
    returns None when the speculative output was valid, or a freshly
    exact-rendered replacement when it under-speculated (the caller must
    redo anything derived from the speculative array).  Note the next
    group then speculates from counts two groups back instead of one —
    the same slack bounds both (consecutive orbit views drift slowly).
    """
    ct = max(chunk // t, 1)
    cap_t = ((n_tiles + ct - 1) // ct) * ct
    ns_long = cfg.render_n_samples or cfg.n_samples
    bucket_on = cfg.render_span_bucket and cfg.render_short_samples < ns_long
    key = (n_tiles, t, chunk, bucket_on, cfg.render_short_samples)
    # slack below stays INSIDE the chunk quantization: speculative stops
    # land on the same chunk multiples the exact path produces, so both
    # paths share one set of compiled programs (a margin of +1 whole chunk
    # measured 35 s of fresh remote compiles on its first group).  When the
    # counts repeated exactly (re-rendering a fixed view set — the eval
    # and scoring loops do this), slack is dropped: near a chunk boundary
    # it would round up to a whole dead chunk of probe/march work per
    # level (~35 ms on the bench scene) for drift that is not happening.
    spec = _SPEC_COUNTS.get(key)
    stable = spec is not None and len(spec) == 5 and spec[4]
    slack_t = 0 if stable else max(1, ct // 8)
    slack = 0 if stable else chunk // 8
    for _attempt in range(2):
        exact = spec is None
        if exact:
            n_act = int(n_act_dev)
            stop_t = min(((n_act + ct - 1) // ct) * ct, cap_t)
        else:
            stop_t = min(((spec[0] + slack_t + ct - 1) // ct) * ct, cap_t)
        if stop_t == 0:
            out = jnp.zeros((n_tiles, 4 * t))
            return (out, _finish_noop) if defer else out
        order_pad = (
            jnp.concatenate(
                [order_t, jnp.zeros((stop_t - n_tiles,), jnp.int32)]
            )
            if stop_t > n_tiles
            else order_t
        )
        packs = []
        for i in range(0, stop_t, ct):
            packs.append(_jit_probe_tiles_l1(od_t, order_pad[i : i + ct], cfg, aux))
        pack1, pos1, n1_dev = _jit_partition_packed(jnp.concatenate(packs), chunk)
        if exact:
            n1 = int(n1_dev)
            stop1 = ((n1 + chunk - 1) // chunk) * chunk
            if stop1 == 0:
                _SPEC_COUNTS[key] = (n_act, 0, 0, 0, False)
                out = jnp.zeros((n_tiles, 4 * t))
                return (out, _finish_noop) if defer else out
        else:
            stop1 = min(
                ((spec[1] + slack + chunk - 1) // chunk) * chunk, pack1.shape[0]
            )
            stop1 = max(stop1, chunk)
        # stop1 > 0 on every path here (exact mode early-returns on 0;
        # speculative bounds are >= one chunk)
        if not bucket_on:
            # FUSED probe+march: level 2 culls only ~13% of level-1
            # survivors on production objects (l2-occ 642799 of l1-occ
            # 741677 on the bench scene — its value is interval
            # TIGHTENING, not culling), so compacting between probe and
            # march buys a ~16 ms smaller march at a ~36 ms cost
            # (partition2 + unpermute + the extra pipeline stage).
            # Probe and march run in one program per chunk instead; one
            # speculation level disappears with the partition.
            c0, stop2, cap2 = 0, stop1, pack1.shape[0]
            n2_dev, ns_dev = n1_dev, jnp.int32(0)
            outs = []
            for i in range(0, stop1, chunk):
                outs.append(_jit_probe_march(params, pack1[i : i + chunk], cfg, aux))
            rgba_l1 = jnp.concatenate(outs)
        else:
            packs2 = []
            for i in range(0, stop1, chunk):
                packs2.append(_jit_probe_l2(pack1[i : i + chunk], cfg, aux))
            pack2, pos2, n2_dev = _jit_partition_packed(
                jnp.concatenate(packs2), chunk
            )
            cap2 = pack2.shape[0]
            if exact:
                n2 = int(n2_dev)
                stop2 = ((n2 + chunk - 1) // chunk) * chunk
            else:
                stop2 = min(
                    ((spec[2] + slack + chunk - 1) // chunk) * chunk, cap2
                )
            pos3 = None
            c0 = 0
            ns_dev = jnp.int32(0)
            if stop2 > chunk:
                # variable step counts, TPU-style: a third stable partition
                # moves short-span rays to the front and whole chunks of
                # them march with render_short_samples; only full chunks
                # switch (the straddling chunk marches at the long count —
                # quality can only go up there)
                pack2b, pos3, ns_dev = _jit_partition_short(
                    pack2[:stop2], cfg.render_short_samples, ns_long
                )
                pack2 = pack2b
                if exact:
                    c0 = (int(ns_dev) // chunk) * chunk
                else:
                    # slack DOWNWARD here: marching a long ray at the short
                    # count is the one speculation error that silently
                    # degrades output, so keep c0 <= n_short with slack and
                    # verify against the readback
                    c0 = max(0, ((spec[3] - slack) // chunk) * chunk)
            outs = []
            for i in range(0, stop2, chunk):
                outs.append(
                    _jit_march_interval(
                        params,
                        pack2[i : i + chunk],
                        cfg,
                        ns=cfg.render_short_samples if i < c0 else None,
                    )
                )
            rgba_occ = jnp.concatenate(outs) if outs else jnp.zeros((0, 4))
            if pos3 is not None:
                rgba_occ = _jit_unpermute_rays(rgba_occ, pos3)  # pack2 order
            rgba_l1 = _jit_unpermute_rays(rgba_occ, pos2)  # (stop1, 4)
        rgba_act = _jit_unpermute_rays(rgba_l1, pos1)  # (stop_t * t, 4)
        out = _scatter_tiles(
            rgba_act.reshape(stop_t, 4 * t), order_pad[:stop_t], n_tiles, n_act_dev
        )
        # one readback for all counts (stacked: four separate scalar reads
        # would be four ~29 ms tunnel round trips)
        counts_dev = _jit_stack_counts(n_act_dev, n1_dev, n2_dev, ns_dev)

        def _verify(counts, _spec=spec, _stop_t=stop_t, _stop1=stop1,
                    _stop2=stop2, _c0=c0, _cap1=pack1.shape[0], _cap2=cap2):
            n_act, n1, n2, n_s = (int(x) for x in counts)
            need_t = min(((n_act + ct - 1) // ct) * ct, cap_t)
            need_1 = ((n1 + chunk - 1) // chunk) * chunk
            need_2 = ((n2 + chunk - 1) // chunk) * chunk
            ok = (
                _stop_t >= need_t
                and _stop1 >= min(need_1, _cap1)
                and _stop2 >= min(need_2, _cap2)
                and _c0 <= n_s
            )
            if ok:
                # remember the RAW counts: the next call re-quantizes with
                # its slack, so spec stops track the exact path's chunk
                # multiples; the stability flag marks counts that repeated
                repeat = _spec is not None and tuple(_spec[:4]) == (
                    n_act, n1, n2, n_s,
                )
                _SPEC_COUNTS[key] = (n_act, n1, n2, n_s, repeat)
            return ok

        if defer and not exact:
            def finish():
                if _verify(np.asarray(counts_dev)):
                    return None
                # under-speculated: the returned array was invalid — re-render
                # this group exactly and hand the replacement back
                _SPEC_COUNTS.pop(key, None)
                return _render_tiles_two_phase(
                    params, od_t, order_t, n_act_dev, n_tiles, t, cfg, aux,
                    chunk,
                )
            return out, finish
        if _verify(np.asarray(counts_dev)):
            return (out, _finish_noop) if defer else out
        # under-speculated: fall back to the exact path once
        spec = None
    return out  # unreachable: the exact attempt always verifies


@partial(jax.jit, static_argnames=("cfg",))
def _jit_probe_tiles_l1(od_t, tidx, cfg, aux):
    """Phase A1: level-1 pooled occupancy probe per ray.

    Emits PACKED rows ``[o(3) | d(3) | t_lo | t_hi | occ]`` (N, 9) — the
    whole per-ray state moves through the partition as ONE wide row (row
    count, not width, is what gathers/scatters charge for on this
    platform; see PERF.md)."""
    ct = tidx.shape[0]
    t = od_t.shape[1] // 6
    rays = od_t[tidx].reshape(ct * t, 6)
    o, d = rays[:, :3], rays[:, 3:]
    tmin, tmax, valid = ray_sphere(o, d)
    t1lo, t1hi, any1 = _probe_level1(aux, o, d, tmin, tmax, valid, cfg)
    occ = (any1 & valid).astype(rays.dtype)
    return jnp.concatenate(
        [rays, t1lo[:, None], t1hi[:, None], occ[:, None]], axis=-1
    )


@partial(jax.jit, static_argnames=("cfg",))
def _jit_probe_l2(packed, cfg, aux):
    """Phase A2: level-2 corner-sigma probe on level-1 survivors; returns
    packed rows with the tightened interval and combined occupancy."""
    o, d = packed[:, :3], packed[:, 3:6]
    tlo, thi, any2 = _probe_level2(aux, o, d, packed[:, 6], packed[:, 7], cfg)
    occ = (any2 & (packed[:, 8] > 0.5)).astype(packed.dtype)
    return jnp.concatenate(
        [packed[:, :6], tlo[:, None], thi[:, None], occ[:, None]], axis=-1
    )


@partial(jax.jit, static_argnames=("pad",))
def _jit_partition_packed(packed, pad):
    """Occupied-rays-first stable partition of packed rays (+ one dead
    chunk of padding so host-side chunking never overruns); ``pos`` maps
    each input ray to its partitioned slot.

    One narrow iota-scatter inverts the permutation, then ONE wide gather
    moves all payload: row gathers are width-free on this platform but
    wide-row scatters are NOT — scattering the (N, 9) rows directly to
    their slots measured 108 ms/1.2M rays vs 67 for the old
    scatter-iota-plus-four-gathers form (exp_render_anatomy3 across
    revisions); one payload gather instead of four keeps the packing win
    without the wide scatter."""
    m, width = packed.shape
    occ = packed[:, 8] > 0.5
    n_occ = jnp.sum(occ)
    pos_hit = jnp.cumsum(occ) - 1
    pos_miss = n_occ + jnp.cumsum(~occ) - 1
    pos = jnp.where(occ, pos_hit, pos_miss).astype(jnp.int32)
    order = jnp.zeros((m,), jnp.int32).at[pos].set(
        jnp.arange(m, dtype=jnp.int32), unique_indices=True
    )
    # dead pad rows: od 0, t_lo 0, t_hi 1, occ 0
    pad_rows = jnp.zeros((pad, width), packed.dtype).at[:, 7].set(1.0)
    out = jnp.concatenate([packed[order], pad_rows])
    return out, pos, n_occ


@partial(jax.jit, static_argnames=("ns_short", "ns_long"))
def _jit_partition_short(packed, ns_short, ns_long):
    """Short-span-first stable partition of the level-2 survivors.

    A ray is "short" when marching its tightened span with ``ns_short``
    samples keeps the sample spacing at or below the spacing the uniform
    ``ns_long`` march gives the LONGEST occupied span — i.e. span <=
    smax * ns_short / ns_long.  The input is already occupied-first
    (``_jit_partition_packed``), and a stable partition keeps every
    occupied ray ahead of the non-occupied stragglers, so the caller's
    "march only the first ceil(n_occ/chunk) chunks" invariant holds.
    No padding is appended: the input already carries a dead chunk.
    """
    occ = packed[:, 8] > 0.5
    spans = packed[:, 7] - packed[:, 6]
    smax = jnp.max(jnp.where(occ, spans, 0.0))
    short = occ & (spans <= smax * (ns_short / ns_long))
    n_short = jnp.sum(short)
    pos_s = jnp.cumsum(short) - 1
    pos_l = n_short + jnp.cumsum(~short) - 1
    pos = jnp.where(short, pos_s, pos_l).astype(jnp.int32)
    order = jnp.zeros((packed.shape[0],), jnp.int32).at[pos].set(
        jnp.arange(packed.shape[0], dtype=jnp.int32), unique_indices=True
    )
    return packed[order], pos, n_short


def _march_body(params, o, d, tlo, thi, occ, cfg, ns):
    """Deterministic fine march inside [t_lo, t_hi] -> (N, 4) rgba."""
    span = (thi - tlo) / ns
    base = jnp.arange(ns, dtype=jnp.float32)[None, :]
    ts = tlo[:, None] + (base + 0.5) * span[:, None]
    pos = jnp.clip(o[:, None, :] + d[:, None, :] * ts[..., None], 0.0, 1.0 - 1e-6)
    sigma, rgb = _eval_field(params, pos, d, cfg)
    sigma = sigma * occ[:, None]
    out_rgb, out_alpha, _ = _composite(
        sigma, rgb, jnp.broadcast_to(span[:, None], sigma.shape)
    )
    return jnp.concatenate([out_rgb, out_alpha[:, None]], axis=-1)


@partial(jax.jit, static_argnames=("cfg", "ns"))
def _jit_march_interval(params, packed, cfg, ns=None):
    """Phase B: deterministic fine march inside precomputed [t_lo, t_hi]."""
    o, d = packed[:, :3], packed[:, 3:6]
    tlo, thi, occ = packed[:, 6], packed[:, 7], packed[:, 8] > 0.5
    ns = ns or cfg.render_n_samples or cfg.n_samples
    return _march_body(params, o, d, tlo, thi, occ, cfg, ns)


@partial(jax.jit, static_argnames=("cfg",))
def _jit_probe_march(params, packed, cfg, aux):
    """Fused phases A2+B: corner-sigma probe, interval tightening, and the
    fine march in ONE program per chunk of level-1 survivors.

    Value-identical to probe -> partition -> march: rays the probe finds
    empty march with occ=0 and composite to exact zeros, the same result
    the compacted path writes through its zero pad row."""
    o, d = packed[:, :3], packed[:, 3:6]
    occ1 = packed[:, 8] > 0.5
    tlo, thi, any2 = _probe_level2(aux, o, d, packed[:, 6], packed[:, 7], cfg)
    occ = any2 & occ1
    ns = cfg.render_n_samples or cfg.n_samples
    return _march_body(params, o, d, tlo, thi, occ, cfg, ns)


@jax.jit
def _jit_unpermute_rays(rgba_occ, pos):
    """Un-permute phase-B results to original active-ray order; rays whose
    slot lies beyond the marched prefix (never-occupied tail when n_occ
    rounds under the marched chunks) read the zero pad row."""
    mlen = rgba_occ.shape[0]
    padded = jnp.concatenate([rgba_occ, jnp.zeros((1, 4), rgba_occ.dtype)])
    return padded[jnp.minimum(pos, mlen)]


@partial(jax.jit, static_argnames=("cfg",))
def _jit_render_tiles(params, od_t, tidx, cfg, aux=None):
    """One dispatch per chunk: tile-block gather + march + tile repack.

    Keeping the gather/reshape inside the jitted program matters on a
    remote-TPU tunnel where every eager op pays dispatch latency.
    """
    ct = tidx.shape[0]
    t = od_t.shape[1] // 6
    rays = od_t[tidx].reshape(ct * t, 6)
    rgb, a = render_rays(params, rays[:, :3], rays[:, 3:], cfg, key=None, aux=aux)
    return jnp.concatenate([rgb, a[:, None]], axis=-1).reshape(ct, 4 * t)
