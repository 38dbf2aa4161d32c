"""Ground-truth voxel scene — the OctoMap replacement.

The reference keeps three OctoMaps (``ground_truth_model`` at 2 mm,
``octo_model``/``GT_sample`` at the dynamic 2*size/32 resolution,
``main.cpp:966-1058``) and ray-casts per voxel on 20 CPU threads.  Here the
scene is two flat arrays (voxel centers + colors) plus a dense occupancy/color
grid in device memory, sized for jit-friendly fixed-shape ray marching.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def voxel_downsample(
    points: np.ndarray, colors: Optional[np.ndarray], resolution: float
) -> Tuple[np.ndarray, Optional[np.ndarray], np.ndarray]:
    """First-point-wins voxelization (≙ octomap insertion, main.cpp:1014-1023).

    Returns (voxel centers, colors, integer keys).
    """
    pts = np.asarray(points)
    keys = np.floor(pts / resolution).astype(np.int64)
    # first occurrence wins, matching the reference's "only if voxel == NULL"
    _, first_idx = np.unique(keys, axis=0, return_index=True)
    first_idx = np.sort(first_idx)
    vkeys = keys[first_idx]
    centers = (vkeys.astype(np.float64) + 0.5) * resolution
    vcolors = None if colors is None else np.asarray(colors)[first_idx]
    return centers, vcolors, vkeys


@dataclass
class GTSampleGrid:
    """32^3 occupancy summary around the object (≙ GT_sample, main.cpp:971-1051)."""

    occupancy: np.ndarray  # (32, 32, 32) bool
    origin: np.ndarray
    resolution: float

    @property
    def init_voxels(self) -> int:
        return int(np.prod(self.occupancy.shape))

    @property
    def occupied_voxels(self) -> int:
        return int(self.occupancy.sum())


def make_gt_sample(
    points: np.ndarray, center: np.ndarray, half_size: float, n: int = 32
) -> GTSampleGrid:
    res = 2.0 * half_size / n
    origin = np.asarray(center) - half_size
    idx = np.floor((np.asarray(points) - origin) / res).astype(np.int64)
    valid = ((idx >= 0) & (idx < n)).all(axis=1)
    occ = np.zeros((n, n, n), dtype=bool)
    occ[tuple(idx[valid].T)] = True
    return GTSampleGrid(occupancy=occ, origin=origin, resolution=res)


class VoxelScene:
    """Dense color/occupancy grid for the virtual depth camera.

    ``precept``-style ray casting (``main.cpp:98-284``) runs against this grid
    with fixed-step DDA marching in one jitted call over all pixels, replacing
    the reference's per-voxel std::thread fan-out.
    """

    def __init__(
        self,
        points: np.ndarray,
        colors: Optional[np.ndarray],
        resolution: float,
        pad_voxels: int = 2,
    ):
        pts = np.asarray(points, dtype=np.float64)
        self.resolution = float(resolution)
        self.centers, self.colors, keys = voxel_downsample(pts, colors, resolution)
        self.full_voxels = len(self.centers)  # ≙ share_data->full_voxels
        kmin = keys.min(axis=0) - pad_voxels
        kmax = keys.max(axis=0) + pad_voxels + 1
        self.origin = kmin.astype(np.float64) * resolution
        dims = kmax - kmin
        occ = np.zeros(dims, dtype=bool)
        col = np.zeros(tuple(dims) + (3,), dtype=np.float32)
        local = keys - kmin
        occ[tuple(local.T)] = True
        if self.colors is not None:
            col[tuple(local.T)] = self.colors.astype(np.float32) / 255.0
        self.occupancy = jnp.asarray(occ)
        self.color_grid = jnp.asarray(col)
        self.dims = np.asarray(dims)

    def cast_rays(
        self, origins, directions, max_range: float = 1.0, steps_per_voxel: float = 2.0
    ):
        """March rays to the first occupied voxel.

        Returns (hit mask, hit points (world), colors in [0,1]).
        """
        n_steps = int(
            np.ceil(max_range / self.resolution * steps_per_voxel)
        )
        return _cast_rays_grid(
            self.occupancy,
            self.color_grid,
            jnp.asarray(self.origin, jnp.float32),
            jnp.float32(self.resolution),
            jnp.asarray(origins, jnp.float32),
            jnp.asarray(directions, jnp.float32),
            jnp.float32(max_range),
            n_steps,
        )


from functools import partial


def precept(
    scene: "VoxelScene",
    cam_to_world: np.ndarray,
    intr,
    max_range: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Virtual depth camera: one point per pixel at the first occupied voxel.

    ≙ ``Perception_3D::precept`` (``main.cpp:98-284``): the reference
    re-projects every GT voxel to a pixel and re-casts a ray per voxel on a
    20-thread pool; here every pixel's ray marches the dense grid in one
    jitted call.  Returns (hit mask (H,W), points (H,W,3), colors (H,W,3)).
    """
    from ..core.camera import deproject_pixels

    h, w = intr.height, intr.width
    u, v = np.meshgrid(np.arange(w) + 0.5, np.arange(h) + 0.5)
    px = jnp.asarray(np.stack([u, v], axis=-1).reshape(-1, 2), jnp.float32)
    d_cam = deproject_pixels(px, jnp.ones(px.shape[0]), intr)
    c2w = np.asarray(cam_to_world)
    rot = jnp.asarray(c2w[:3, :3], jnp.float32)
    origin = jnp.asarray(c2w[:3, 3], jnp.float32)
    dirs = d_cam @ rot.T
    origins = jnp.broadcast_to(origin, dirs.shape)
    hit, pos, colr = scene.cast_rays(origins, dirs, max_range=max_range)
    return (
        np.asarray(hit).reshape(h, w),
        np.asarray(pos).reshape(h, w, 3),
        np.asarray(colr).reshape(h, w, 3),
    )


def colorize_depth(depth: np.ndarray) -> np.ndarray:
    """Jet-like depth colormap, (H, W) -> uint8 (H, W, 3)
    (≙ ``colorize_depth``, Share_Data.hpp)."""
    d = np.asarray(depth, np.float64)
    dmax = d.max() if d.max() > 0 else 1.0
    x = np.clip(d / dmax, 0.0, 1.0)
    r = np.clip(1.5 - np.abs(4.0 * x - 3.0), 0, 1)
    g = np.clip(1.5 - np.abs(4.0 * x - 2.0), 0, 1)
    b = np.clip(1.5 - np.abs(4.0 * x - 1.0), 0, 1)
    return (np.stack([r, g, b], axis=-1) * 255).astype(np.uint8)


@partial(jax.jit, static_argnames=("n_steps",))
def _cast_rays_grid(occ, col, grid_origin, res, origins, dirs, max_range, n_steps):
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    ts = (jnp.arange(n_steps, dtype=jnp.float32) + 0.5) * (max_range / n_steps)
    # (R, S, 3) sample positions; fixed shapes keep XLA on dense tiles
    pos = origins[:, None, :] + dirs[:, None, :] * ts[None, :, None]
    idx = jnp.floor((pos - grid_origin) / res).astype(jnp.int32)
    dims = jnp.asarray(occ.shape, jnp.int32)
    inside = jnp.all((idx >= 0) & (idx < dims), axis=-1)
    cidx = jnp.clip(idx, 0, dims - 1)
    hit = occ[cidx[..., 0], cidx[..., 1], cidx[..., 2]] & inside  # (R, S)
    any_hit = jnp.any(hit, axis=1)
    first = jnp.argmax(hit, axis=1)
    r = jnp.arange(origins.shape[0])
    hit_idx = cidx[r, first]
    hit_pos = (hit_idx.astype(jnp.float32) + 0.5) * res + grid_origin
    hit_col = col[hit_idx[:, 0], hit_idx[:, 1], hit_idx[:, 2]]
    return any_hit, hit_pos, hit_col
