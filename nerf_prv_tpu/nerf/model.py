"""The neural field: hash encoding + fused small MLPs.

Mirrors instant-ngp's base network (the CUDA ``pyngp`` testbed the reference
drives, ``Instantngp_scripts/run.py``): a 1-hidden-layer density MLP over hash
features producing (log-density, 15 geometry features), and a 2-hidden-layer
color MLP over (spherical-harmonics-encoded direction, geometry features).
Widths of 64 keep the matmuls MXU-shaped; activations run in bfloat16 with
float32 accumulation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .hashgrid import HashGridConfig, encode, init_table


@dataclass(frozen=True)
class NerfConfig:
    grid: HashGridConfig = field(default_factory=HashGridConfig)
    hidden: int = 64
    geo_features: int = 15
    sh_degree: int = 4  # 16 direction coefficients
    density_activation: str = "exp"
    # gradient-carrying samples per train ray, marched inside the
    # probe-tightened interval (train_coarse below); the short warmup
    # phase uses train_warmup_samples over the full chord instead.
    # 16 samples with 12 probes measured the BEST quality of the
    # {24/8, 20/8, 16/8, 16/12} sweep on BOTH quality scenes across two
    # seeds (splat 35.31/35.25 thin 35.35/35.43, vs 24/8's 35.14/35.17 and
    # 34.90/35.52 — experiments/exp_train16.py) at 2.81 vs 3.51 ms/step:
    # every remaining step cost is row-count-bound (gathers ~250 M rows/s,
    # the grad scatter ~9 ns/row + fixed — exp_scatter_drop), so fewer
    # samples cut fwd, bwd and scatter together.  The earlier 24/16 loss
    # (-0.20 dB, exp_train24) was the probe/sample RATIO over-tightening,
    # not probe count: 12 probes with 16 samples keep the clamped interval
    # sampled densely enough.
    n_samples: int = 16
    # hierarchical sampling (training only): when > 0, n_samples become a
    # density-only coarse pass and n_importance full-field samples are drawn
    # from its CDF; deterministic renders use a flat render_n_samples march.
    n_importance: int = 0
    # 16 wide-row fine samples with 20 fine probes beat the old 24/24 on
    # every (scene, seed) of the render sweep (splat 35.43/35.38 vs
    # 35.31/35.25, thin 35.40/35.51 vs 35.35/35.43 —
    # experiments/exp_render20.py, evaluated on identical trained fields so
    # deltas are exact) while marching a third fewer wide rows; rp16/rs16
    # was faster still but lost 0.15 dB on thin seed 0 and was rejected
    render_n_samples: int = 16
    # deterministic-render interval tightening: when > 0, probe density at
    # this many midpoints first and march render_n_samples inside the
    # occupied [t_lo, t_hi] interval only (render.py render_rays).
    # With the two-level aux probe (below), 24 fine samples are lossless:
    # 35.43 dB vs 35.41 at 32 on the splat scene (experiments/exp_pe.py);
    # the tighter interval from saturation clamping keeps per-cell sample
    # density high.  render_coarse (the aux-less fallback probe count)
    # keeps probe spacing under a single voxel's trilinear support.
    render_coarse: int = 24
    # two-level render probing against precomputed occupancy tables
    # (render.build_render_aux): render_probe_coarse samples of the dilated
    # block-max volume (one-hot matmuls, zero gathers) bound the occupied
    # range, then render_probe_fine samples of trilinear corner-sigma
    # (16-byte row gathers) tighten and saturation-clamp it
    render_probe_coarse: int = 8
    # 20 fine probes over 2-cell pooled blocks, paired with the 16-sample
    # fine march (exp_render20.py — see render_n_samples above).  History:
    # on thin geometry (1-2-cell rods/disks, exp_thin_geometry.py) 16
    # probes over 4-cell blocks measured -0.31 dB vs a flat-96 no-probe
    # reference; 2-cell level-1 blocks shorten the level-2 interval
    # enough that 24 probes recover to -0.07 (32: -0.05).  The blob scene
    # hid this — the probe interval, not train tightening, was the
    # quality knob (train_coarse=32 / n_samples=48 measured no gain)
    render_probe_fine: int = 20
    # span-bucketed fine march (the TPU answer to CUDA's per-ray variable
    # step counts): partition level-2 survivors by tightened-interval
    # length and march rays whose span fits render_short_samples at the
    # march's worst-case sample spacing with that count instead of
    # render_n_samples.  Every ray's spacing stays <= the longest ray's
    # spacing under the uniform march, so the march's resolution floor is
    # unchanged; typical-ray spacing coarsens toward that floor.
    render_span_bucket: bool = False
    render_short_samples: int = 12
    # training-time interval tightening: when > 0, every train step probes
    # density at this many no-gradient midpoints per ray and marches its
    # n_samples inside the occupied-and-visible [t_lo, t_hi] only (with a
    # full-chord fallback for rays with no occupied probe).  Combined with
    # a short flat warmup while geometry forms, this keeps flat-96 quality
    # at a quarter of the gradient samples (the backward scatter-add is the
    # dominant step cost).  12 probes pair with the 16-sample march
    # (exp_train16.py — see n_samples above); with 24 samples, 8 probes
    # beat 16 (exp_train24.py: over-tightening starves a sparse march, the
    # probe/sample ratio is what matters); smaller train batches
    # (2048/3072 rays) measured -0.1..-0.2 dB and were rejected
    train_coarse: int = 12
    # rebake the train probe's corner-sigma table every this many steps
    # inside the train scan and probe against IT (one 16-byte row gather
    # per probe sample, render._tighten_interval_baked) instead of
    # evaluating the full field MLP at every probe midpoint; 0 = live-MLP
    # probe.  MEASURED REJECTION on v5e at g=40 (experiments/
    # exp_baked_probe.py): 2.60 ms/step live vs 2.96/2.99/3.09/3.16 at
    # refresh 32/16/8/4 — probe cost is gather ROW-count-bound, not
    # byte-bound, and the tiny density MLP rides the MXU for free, so the
    # 16-byte rows save nothing while the per-step rebake cond adds
    # overhead; quality also drops 0.16-0.30 dB from probe staleness.
    # Kept as a flag for larger grids/fields where the wide-row gather
    # bytes would dominate; default OFF.
    train_probe_refresh: int = 0
    # warmup sweep on v5e (experiments/exp_warmup.py): 500x96 35.20 dB,
    # 250x48 35.22, 125x48 35.35, none 35.26 — the probe-tightened march
    # "peels" initial fog by itself, so warmup is insurance for thin
    # geometry, not a necessity, and short is best
    train_warmup_steps: int = 125
    train_warmup_samples: int = 48
    # ray batch for the warmup phase only (0 = train_rays).  The warmup
    # step is row-count-bound like the tight step, so fewer rays cut it
    # proportionally; quality effect measured in experiments/exp_warmup3.py
    train_warmup_rays: int = 0
    # training
    train_rays: int = 4096
    # per-step RNG strategy: "split" draws each stream (ray index, bg
    # color, stratified jitter) through its own key-split derivation; on
    # the pooled path (bound="sphere", n_importance=0) the whole
    # derivation is HOISTED out of the training scan into one batched
    # dispatch — bit-identical stream, none of the 5-6 tiny per-step
    # threefry kernels (exp_step_residue measured those at ~0.5 ms of the
    # 2.8 ms step — launch-bound, not compute-bound).  "split_inloop"
    # forces the original in-loop derivation (the identity oracle for
    # tests/test_perf_paths.py::test_hoisted_rng_bit_identical).  "fused"
    # derives all streams from ONE random.bits call — same distributions
    # (24-bit mantissa uniforms, modulo index) but a DIFFERENT stream; at
    # SIX seeds per scene it misses the splat mean by 0.069 dB (35.293 vs
    # 35.362, SEM ~0.05 — a resolved systematic, not 2-seed noise) while
    # its step win under unroll=4 is only 1.97 vs 2.00 ms, so it stays
    # opt-in (experiments/artifacts/fused_rng_seeds.json, the r3 2-seed
    # gate fused_rng.json superseded).
    train_rng: str = "split"
    # lax.scan unroll factor for the training loop — semantically identical
    # (same step math, same stream); >1 lets XLA schedule adjacent steps'
    # small kernels together.  Measured on v5e (exp_scan_unroll.py): tight
    # 2.004 ms/step at unroll=4 vs 2.438 at 1 (-18%), warmup 4.725 vs
    # 5.356.  Quality gated at SIX seeds per scene (the duplicate-index
    # grad scatter is order-nondeterministic, so single runs jitter
    # ~±0.1 dB): u4 means 35.362/35.445 vs u1 35.376/35.394 on splat/thin
    # — within ±0.05 dB both ways (artifacts/fused_rng_seeds.json).
    train_scan_unroll: int = 4
    # sample this multiple of train_rays candidate pixels per step and keep
    # the bounding-sphere hits (1 = disabled); see train._sample_batch
    train_hit_oversample: int = 4
    n_steps: int = 2500
    lr: float = 1e-2
    weight_decay: float = 1e-6
    # Adam moment storage dtype: "float32" (optax) or "bfloat16" (custom
    # transform, train._scale_by_adam_lowp — compute fp32, store bf16).
    # The update is HBM-bound (~6 passes over params+moments, ~0.44 ms of
    # the 2.0 ms step, artifacts/step_residue.json); bf16 moments cut the
    # moment traffic 2x (24 -> 16 bytes/param/step)
    adam_moment_dtype: str = "float32"
    huber_delta: float = 0.1
    compute_dtype: Any = jnp.bfloat16
    # encode implementation: "auto" (xla on cpu, sorted on tpu), "xla"
    # (autodiff scatter), "sorted" (sort-based unique-scatter backward),
    # "fused" (Pallas forward + sorted backward)
    encode_impl: str = "auto"
    # field backbone: "voxel" (wide-row corner-block grid — one gather per
    # sample, the TPU-fast flagship) or "hash" (instant-ngp-style multires
    # hash grid, kept for reference parity)
    field_impl: str = "voxel"
    # voxel-field hyperparameters
    voxel_grid_size: int = 40
    voxel_features: int = 8
    voxel_pe_freqs: int = 4
    # grid-gradient implementation: "xla" (native duplicate-index
    # scatter-add) or "sorted" (sort + segmented-sum + unique scatter)
    voxel_grad_impl: str = "xla"
    # NOTE on a rejected design (experiments/exp_share_march.py): row-shared
    # marching (one gather per pair of consecutive samples, trilinear
    # extrapolation within the pair) measured SLOWER despite halving gather
    # rows — the pair-axis broadcast/reshape relayouts cost as much memory
    # traffic as the saved rows — and lost 0.2-0.9 dB.  Row count cannot be
    # traded for minor-axis restructuring on this platform.
    # gather the grid rows through a bfloat16 view ("bf16") or at full
    # precision ("f32"); backward accumulation is float32 either way
    voxel_gather_dtype: str = "bf16"
    # ray bound: "sphere" clips sampling to the object's bounding sphere
    # (tight by the transforms.json scale convention); "cube" = unit AABB
    bound: str = "sphere"

    def __post_init__(self):
        # a typo'd train_rng would silently fall through to the in-loop
        # split path (missing the hoisted fast path); unroll < 1 reaches
        # lax.scan and dies with an opaque XLA tracing error
        if self.train_rng not in ("split", "split_inloop", "fused"):
            raise ValueError(
                f"train_rng must be one of 'split', 'split_inloop', 'fused';"
                f" got {self.train_rng!r}"
            )
        if self.train_scan_unroll < 1:
            raise ValueError(
                f"train_scan_unroll must be >= 1; got {self.train_scan_unroll}"
            )
        if self.adam_moment_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"adam_moment_dtype must be 'float32' or 'bfloat16'; "
                f"got {self.adam_moment_dtype!r}"
            )


def sh_encode_deg4(d: jnp.ndarray) -> jnp.ndarray:
    """Real spherical harmonics up to degree 3 (16 coeffs), unit dirs (N,3)."""
    x, y, z = d[..., 0], d[..., 1], d[..., 2]
    xx, yy, zz = x * x, y * y, z * z
    xy, yz, xz = x * y, y * z, x * z
    return jnp.stack(
        [
            jnp.full_like(x, 0.28209479177387814),
            -0.48860251190291987 * y,
            0.48860251190291987 * z,
            -0.48860251190291987 * x,
            1.0925484305920792 * xy,
            -1.0925484305920792 * yz,
            0.31539156525252005 * (3.0 * zz - 1.0),
            -1.0925484305920792 * xz,
            0.5462742152960396 * (xx - yy),
            -0.5900435899266435 * y * (3.0 * xx - yy),
            2.890611442640554 * xy * z,
            -0.4570457994644658 * y * (5.0 * zz - 1.0),
            0.3731763325901154 * z * (5.0 * zz - 3.0),
            -0.4570457994644658 * x * (5.0 * zz - 1.0),
            1.445305721320277 * (xx - yy) * z,
            -0.5900435899266435 * x * (xx - 3.0 * yy),
        ],
        axis=-1,
    )


def init_params(key, cfg: NerfConfig) -> Dict[str, Any]:
    if cfg.field_impl == "voxel":
        from .voxelfield import init_voxel_params

        return init_voxel_params(key, cfg)
    k_table, k1, k2, k3, k4 = jax.random.split(key, 5)
    in_dim = cfg.grid.out_dim
    h = cfg.hidden
    geo = cfg.geo_features + 1
    col_in = 16 + cfg.geo_features

    def dense(key, n_in, n_out):
        lim = jnp.sqrt(6.0 / (n_in + n_out))
        return jax.random.uniform(key, (n_in, n_out), minval=-lim, maxval=lim)

    return {
        "table": init_table(k_table, cfg.grid),
        "sigma_w0": dense(k1, in_dim, h),
        "sigma_w1": dense(k2, h, geo),
        "color_w0": dense(k3, col_in, h),
        "color_w1": dense(k4, h, h),
        "color_w2": dense(jax.random.fold_in(k4, 1), h, 3),
    }


def _encode(table, x, cfg: NerfConfig):
    impl = cfg.encode_impl
    if impl == "auto":
        # duplicate-index scatter-add serializes on TPU; the sort-based
        # backward wins there, while CPU prefers the native scatter
        impl = "xla" if jax.default_backend() == "cpu" else "sorted"
    if impl == "sorted":
        from ..ops.sorted_grad import encode_sorted

        return encode_sorted(table, x, cfg.grid)
    if impl == "fused":
        from ..ops.fused import encode_fused

        return encode_fused(table, x, cfg.grid)
    return encode(table, x, cfg.grid)


def density_raw(params, x, cfg: NerfConfig):
    """x (N,3) in [0,1]^3 -> (raw log-density (N,), geo features (N, G))."""
    feats = _encode(params["table"], x, cfg)
    ct = cfg.compute_dtype
    hmid = jnp.maximum(feats.astype(ct) @ params["sigma_w0"].astype(ct), 0)
    out = (hmid @ params["sigma_w1"].astype(ct)).astype(jnp.float32)
    return out[..., 0], out[..., 1:]


def radiance(params, geo_feats, dirs, cfg: NerfConfig):
    """Geometry features + unit view dirs -> rgb in [0,1]."""
    sh = sh_encode_deg4(dirs)
    ct = cfg.compute_dtype
    hcol = jnp.concatenate([sh, geo_feats], axis=-1).astype(ct)
    hcol = jnp.maximum(hcol @ params["color_w0"].astype(ct), 0)
    hcol = jnp.maximum(hcol @ params["color_w1"].astype(ct), 0)
    logits = (hcol @ params["color_w2"].astype(ct)).astype(jnp.float32)
    return jax.nn.sigmoid(logits)


def field(params, x, dirs, cfg: NerfConfig) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Positions + dirs -> (sigma (N,), rgb (N,3))."""
    if cfg.field_impl == "voxel":
        from .voxelfield import voxel_field

        return voxel_field(params, x, dirs, cfg)
    raw, geo = density_raw(params, x, cfg)
    rgb = radiance(params, geo, dirs, cfg)
    return jnp.exp(raw), rgb


def density(params, x, cfg: NerfConfig):
    if cfg.field_impl == "voxel":
        from .voxelfield import voxel_density_raw

        raw, _ = voxel_density_raw(params, x, cfg)
        return jnp.exp(raw)
    raw, _ = density_raw(params, x, cfg)
    return jnp.exp(raw)
