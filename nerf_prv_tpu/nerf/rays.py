"""Ray generation and NeRF dataset loading from ``transforms.json``.

Consumes the exact schema the pipeline emits (``main.cpp:1584-1651``) and maps
everything into *grid space* — the axis-cycled, scaled/offset unit cube that
instant-ngp trains in — once, so the hot marching loop sees only unit-cube
geometry.  Training images are RGBA ``rgbaClip`` PNGs composited over a black
background (matching the eval protocol, ``run.py:226``).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ..core.config import CameraConfig
from ..core.transforms import TransformsFile, load_transforms

# world -> grid axis cycle: grid = (z, x, y) * scale + offset
_CYCLE = np.array([2, 0, 1])


@dataclass
class RayDataset:
    """Per-frame camera data + pixels, all device-ready arrays."""

    origins: np.ndarray       # (F, 3) grid-space camera centers
    rotations: np.ndarray     # (F, 3, 3) camera->grid rotation (unscaled)
    pixels: Optional[np.ndarray]  # (F, H, W, 4) float32 in [0,1], or None
    camera: CameraConfig
    scale: float
    offset: np.ndarray

    @property
    def n_frames(self) -> int:
        return len(self.origins)

    @property
    def hw(self) -> Tuple[int, int]:
        return self.camera.height, self.camera.width


def _load_png_rgba(path: str) -> np.ndarray:
    from PIL import Image

    if not os.path.exists(path) and not os.path.splitext(path)[1]:
        # instant-ngp's loader appends ".png" to extensionless file_path
        # entries (the NeRF-synthetic/Blender convention, e.g. "train/r_0");
        # accept both spellings (≙ Instantngp_scripts/run.py dataset inputs).
        path = path + ".png"
    img = Image.open(path).convert("RGBA")
    return np.asarray(img, dtype=np.float32) / 255.0


def grid_cameras(tf: TransformsFile):
    """Camera->grid rotations and grid-space origins for every frame."""
    c2w = tf.cam_to_world  # (F, 4, 4) OpenCV convention in world space
    rot_w = c2w[:, :3, :3]
    pos_w = c2w[:, :3, 3]
    rot_g = rot_w[:, _CYCLE, :]  # cycle world rows -> grid axes
    pos_g = pos_w[:, _CYCLE] * tf.scale + tf.offset[None, :]
    return pos_g.astype(np.float32), rot_g.astype(np.float32)


def load_dataset(json_path: str, with_images: bool = True) -> RayDataset:
    tf = load_transforms(json_path)
    origins, rotations = grid_cameras(tf)
    pixels = None
    if with_images:
        base = os.path.dirname(json_path)
        imgs = [
            _load_png_rgba(os.path.join(base, fp)) for fp in tf.file_paths
        ]
        pixels = np.stack(imgs, axis=0) if imgs else None
    return RayDataset(
        origins=origins,
        rotations=rotations,
        pixels=pixels,
        camera=tf.camera,
        scale=tf.scale,
        offset=tf.offset,
    )


def pixel_dirs_cam(camera: CameraConfig, u, v):
    """Camera-frame (OpenCV) unit directions through pixel centers.

    Distortion-free pinhole, consistent with the virtual camera's projection
    (the GT renderer and the NeRF must share one camera model; the reference
    mixes PCL's pinhole renders with ngp's distorted rays — we don't).
    """
    x = (u + 0.5 - camera.ppx) / camera.fx
    y = (v + 0.5 - camera.ppy) / camera.fy
    d = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)
    return d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def rays_from_pixels(dataset_rot, dataset_org, camera: CameraConfig, frame_idx, u, v):
    """Batched ray origins/dirs in grid space for pixel (u, v) of given frames.

    ``dataset_rot``/``dataset_org``: (F,3,3), (F,3) jnp arrays.
    Directions are unit-norm in grid space (uniform scale preserves norms up
    to the shared factor, which marching distances absorb).
    """
    d_cam = pixel_dirs_cam(camera, u, v)  # (N, 3)
    rot = dataset_rot[frame_idx]  # (N, 3, 3)
    d_grid = jnp.einsum("nij,nj->ni", rot, d_cam)
    d_grid = d_grid / jnp.linalg.norm(d_grid, axis=-1, keepdims=True)
    o_grid = dataset_org[frame_idx]
    return o_grid, d_grid


def ray_aabb(origins, dirs, lo=0.0, hi=1.0):
    """Entry/exit distances of rays with the [lo,hi]^3 grid cube."""
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9, 1e-9, dirs)
    t0 = (lo - origins) * inv
    t1 = (hi - origins) * inv
    tmin = jnp.minimum(t0, t1).max(axis=-1)
    tmax = jnp.maximum(t0, t1).min(axis=-1)
    tmin = jnp.maximum(tmin, 0.0)
    valid = tmax > tmin
    return tmin, jnp.maximum(tmax, tmin), valid


def ray_sphere(origins, dirs, center=0.5, radius=0.52):
    """Entry/exit distances with the object's bounding sphere.

    The transforms.json convention maps the object's bounding radius to 0.5
    grid units about the cube center (scale = 0.5/predicted_size,
    main.cpp:1599), so the inscribed sphere is a tight bound: rays that miss
    it contribute nothing, and hit rays get their samples concentrated on a
    <= 1.04-long segment instead of up to the sqrt(3) cube diagonal.
    """
    oc = origins - center
    b = jnp.sum(oc * dirs, axis=-1)
    c = jnp.sum(oc * oc, axis=-1) - radius * radius
    disc = b * b - c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    tmin = jnp.maximum(-b - sq, 0.0)
    tmax = jnp.maximum(-b + sq, 0.0)
    valid = (disc > 0.0) & (tmax > tmin)
    return tmin, jnp.maximum(tmax, tmin), valid
