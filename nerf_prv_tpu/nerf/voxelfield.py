"""Wide-row voxel field — the TPU-fast NeRF backbone.

Measured on v5e: XLA gathers/scatters cost ~5-15 ns *per row* regardless of
row width (2 -> 128 floats fetch at the same rows/s), while the CUDA-style
multiresolution hash grid needs 8 corners x 16 levels = 128 rows per sample.
This field needs exactly ONE row per sample: each grid row stores the full
2x2x2 corner feature block of its cell (features x 8), the trilinear blend
happens in-register, and an MLP over (blended features, position encoding,
SH-encoded direction) supplies sub-voxel detail.  Gradients reach the grid
through the blend weights — instant-ngp-style direct supervision — and the
backward pass is ONE width-free scatter-add per sample.

Corner blocks are untied across neighboring cells (each corner value is
stored by up to 8 cells).  A consistency penalty is unnecessary in practice:
overlapping rows see near-identical gradients through matching trilinear
weights.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def _gather_rows_sorted(grid: jnp.ndarray, row_idx: jnp.ndarray, n_rows: int):
    """Row gather whose VJP uses the sort-based unique scatter.

    The natural VJP is a duplicate-index scatter-add (~6 in-flight samples
    per cell at production batch sizes) which serializes on TPU and is the
    single largest cost of a train step; the sorted backward reorganizes it
    into sort + segmented sums + a provably-unique scatter.
    """
    return grid[row_idx]


def _gr_fwd(grid, row_idx, n_rows):
    return grid[row_idx], row_idx


def _gr_bwd(n_rows, row_idx, g):
    from ..ops.sorted_grad import segmented_scatter_add

    return segmented_scatter_add(row_idx, g, n_rows), None


_gather_rows_sorted.defvjp(_gr_fwd, _gr_bwd)


@jax.custom_vjp
def _gather_rows_bf16(grid: jnp.ndarray, row_idx: jnp.ndarray):
    """Gather rows through a bfloat16 view of the grid.

    v5e gathers run ~15-25% faster on half-width rows (measured in
    experiments/exp_vmem_gather.py: 260 -> 300+ M rows/s); the one-time
    bf16 rounding of grid values is far below the field's noise floor.
    Precision note: the output is bf16, so each sample's cotangent arrives
    in the backward pass already bf16-rounded; only the *accumulation* of
    those per-contribution gradients (the scatter-add) runs in float32.
    tests/test_nerf.py::test_bf16_gather_grad_close_to_f32 bounds the
    resulting gradient error against the full-f32 path.
    """
    return grid.astype(jnp.bfloat16)[row_idx]


def _grb_fwd(grid, row_idx):
    return grid.astype(jnp.bfloat16)[row_idx], (row_idx, grid.shape[0])


def _grb_bwd(res, g):
    row_idx, n_rows = res
    d = jnp.zeros((n_rows, g.shape[1]), jnp.float32).at[row_idx].add(
        g.astype(jnp.float32)
    )
    return d, None


_gather_rows_bf16.defvjp(_grb_fwd, _grb_bwd)


def pe_encode(x: jnp.ndarray, n_freqs: int) -> jnp.ndarray:
    """Sin/cos positional encoding, (N, 3) -> (N, 6*n_freqs)."""
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=jnp.float32) * jnp.pi
    ang = x[..., None, :] * freqs[:, None]  # (N, F, 3)
    enc = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return enc.reshape(x.shape[:-1] + (6 * n_freqs,))


# the 2x2x2 corner enumeration every row stores, in row-slice order
CORNERS = tuple((i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1))


def cell_and_frac(x: jnp.ndarray, g: int):
    """[0,1]^3 positions -> (flat cell row index (N,), frac (N, 3))."""
    pos = jnp.clip(x, 0.0, 1.0 - 1e-6) * (g - 1)
    cell = jnp.floor(pos).astype(jnp.int32)
    row_idx = (cell[:, 0] * g + cell[:, 1]) * g + cell[:, 2]
    return row_idx, pos - cell


def corner_weights(frac: jnp.ndarray) -> jnp.ndarray:
    """Trilinear weights (N, 8) in CORNERS order."""
    fx, fy, fz = frac[:, 0], frac[:, 1], frac[:, 2]
    return jnp.stack(
        [
            (fx if di else 1.0 - fx)
            * (fy if dj else 1.0 - fy)
            * (fz if dk else 1.0 - fz)
            for di, dj, dk in CORNERS
        ],
        axis=-1,
    )


def blend_rows(rows: jnp.ndarray, frac: jnp.ndarray, f: int) -> jnp.ndarray:
    """Blend gathered corner-block rows (N, 8*F) -> features (N, F).

    One (N, 8, F) broadcast-multiply + corner-axis sum: bit-identical to
    the eight flat (N, F) slice-accumulates it replaced and 1.56x faster
    as an isolated op at production march shapes (2.1 M samples: 1.79 vs
    2.80 ms fwd — experiments/exp_blend_wide.py; a fully flat (N, 64)
    wide-fold variant measured SLOWER, the w @ E expansion and fold
    relayouts cost more than the saved lanes).  IN SITU the train step
    and render rates are unchanged (2.77 ms / 25.2 M rays/s) — XLA fuses
    the blend into the gather consumer either way — so this form is kept
    for being the simpler one, not as a speedup.
    """
    w = corner_weights(frac)
    return (w[:, :, None] * rows.reshape(-1, 8, f)).sum(axis=1)


def density_mlp(params, feats: jnp.ndarray, x: jnp.ndarray, cfg) -> jnp.ndarray:
    """(blended features, positions) -> raw (N, 1 + geo_features)."""
    pe = pe_encode(x, cfg.voxel_pe_freqs)
    ct = cfg.compute_dtype
    h = jnp.concatenate([feats, pe], axis=-1).astype(ct)
    h = jnp.maximum(h @ params["sigma_w0"].astype(ct), 0)
    return (h @ params["sigma_w1"].astype(ct)).astype(jnp.float32)


def init_voxel_params(key, cfg) -> Dict[str, Any]:
    """cfg: NerfConfig with voxel_grid_size / voxel_features set."""
    g = cfg.voxel_grid_size
    f = cfg.voxel_features
    h = cfg.hidden
    geo = cfg.geo_features + 1
    n_pe = 6 * cfg.voxel_pe_freqs
    keys = jax.random.split(key, 6)

    def dense(k, n_in, n_out):
        lim = jnp.sqrt(6.0 / (n_in + n_out))
        return jax.random.uniform(k, (n_in, n_out), minval=-lim, maxval=lim)

    return {
        "grid": jax.random.uniform(
            keys[0], (g * g * g, 8 * f), minval=-1e-4, maxval=1e-4
        ),
        "sigma_w0": dense(keys[1], f + n_pe, h),
        "sigma_w1": dense(keys[2], h, geo),
        "color_w0": dense(keys[3], 16 + cfg.geo_features, h),
        "color_w1": dense(keys[4], h, h),
        "color_w2": dense(keys[5], h, 3),
    }


def _gather(params, row_idx, cfg):
    g = cfg.voxel_grid_size
    if cfg.voxel_grad_impl == "sorted":
        return _gather_rows_sorted(params["grid"], row_idx, g * g * g)
    if cfg.voxel_gather_dtype == "bf16":
        # the single wide gather, through a half-width view of the grid
        return _gather_rows_bf16(params["grid"], row_idx).astype(jnp.float32)
    return params["grid"][row_idx]  # (N, 8*F) — the single wide gather


def _blend(params, x, cfg):
    """One gather per sample + in-register trilinear blend -> (N, F)."""
    row_idx, frac = cell_and_frac(x, cfg.voxel_grid_size)
    return blend_rows(_gather(params, row_idx, cfg), frac, cfg.voxel_features)


# (A row-shared blend — one gather per pair of consecutive samples with
# trilinear extrapolation inside the pair — was implemented and measured
# here in round 2: experiments/exp_share_march.py.  REJECTED: the pair-axis
# broadcast/reshape relayouts cost as much HBM traffic as the saved rows
# (render chunk 94.9 vs 62.4 ms, train step 4.79 vs 4.71 ms) and quality
# dropped 0.2-0.9 dB from cross-cell extrapolation on untied corner blocks.)


def lattice_corner_raw(params, cfg) -> jnp.ndarray:
    """Evaluate RAW log-density at every cell's 8 corners -> (g^3, 8) f32.

    One dense pass over the grid (g^3 x 8 MLP evaluations, ~0.5M rows —
    sub-millisecond) that render-time probing reads instead of running
    the field MLP per probe sample: probing then costs ONE 16-byte row
    gather + an in-register trilinear per sample.  Raw (pre-exp) values
    interpolate on the SAFE side: exp is convex, so exp(trilinear(raw))
    underestimates trilinear(exp(raw)) mid-cell — the probe then clamps
    the interval later, never earlier, than the true field would
    (interpolating sigma itself measured -7 dB from early saturation
    clamping; experiments/exp_aux_probe.py).
    """
    g = cfg.voxel_grid_size
    f = cfg.voxel_features
    rows = params["grid"]  # (g^3, 8*F)
    # corner positions of every cell, in [0,1]^3 field coordinates
    cell = jnp.stack(
        jnp.meshgrid(*([jnp.arange(g, dtype=jnp.float32)] * 3), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    sig = []
    for c, (di, dj, dk) in enumerate(CORNERS):
        corner = jnp.clip(
            (cell + jnp.asarray([di, dj, dk], jnp.float32)) / (g - 1), 0.0, 1.0
        )
        raw = density_mlp(params, rows[:, c * f : (c + 1) * f], corner, cfg)[:, 0]
        sig.append(raw)
    return jnp.stack(sig, axis=-1)  # (g^3, 8)


def voxel_density_raw(params, x, cfg):
    from .model import NerfConfig  # noqa: F401 (type reference)

    feats = _blend(params, x, cfg)
    out = density_mlp(params, feats, x, cfg)
    return out[..., 0], out[..., 1:]


def voxel_field(params, x, dirs, cfg) -> Tuple[jnp.ndarray, jnp.ndarray]:
    from .model import radiance

    raw, geo = voxel_density_raw(params, x, cfg)
    rgb = radiance(params, geo, dirs, cfg)
    return jnp.exp(raw), rgb
