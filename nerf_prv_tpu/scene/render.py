"""Virtual camera: batched point-splat rasterizer in JAX.

Replaces the reference's offscreen PCL/VTK viewer screenshots
(``Perception_3D::render``, ``main.cpp:68-96``; point size from
``points_size_cloud``, ``DefaultConfiguration.yaml:18``): each ground-truth
point is splatted as a ``point_size`` x ``point_size`` square with a z-buffer,
white background, via XLA scatter ops — one jitted call per image instead of a
GUI round-trip, and trivially vmappable over whole view sets.

The output orientation is the *final* ``rgbaClip`` orientation (the reference
rotates its screenshots 180°, ``main.cpp:1616``): pixel (u, v) is the
distortion-aware pinhole projection with +x right, +y down, consistent with
ray generation in :mod:`nerf_prv_tpu.nerf.rays` — the property PSNR parity
actually depends on.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import camera as cam


# points per scatter slab: scatters beyond ~6.2M rows (point_size 5)
# reproducibly fault the axon TPU worker (245,760 pts x 25 ok, 258,048
# crash — bisected 2026-08-17), so big clouds splat in two-pass chunks:
# pass 1 accumulates the global z-buffer slab by slab, pass 2 re-projects
# each slab and writes the depth-test winners.  Identical output to the
# single-pass version for any chunk count.
_SPLAT_CHUNK = 1 << 17


def _splat_core(points_cam, colors01, n_valid, fx, fy, ppx, ppy, coeffs, model, width, height, point_size):
    n = points_cam.shape[0]
    k = point_size * point_size
    drop = width * height
    inf = jnp.float32(jnp.inf)

    def proj(lo, hi):
        pc = points_cam[lo:hi]
        z = pc[:, 2]
        x = pc[:, 0] / jnp.maximum(z, 1e-9)
        y = pc[:, 1] / jnp.maximum(z, 1e-9)
        if model in (cam.DIST_MODIFIED_BROWN_CONRADY, cam.DIST_INVERSE_BROWN_CONRADY):
            x, y = cam._distort_brown_conrady(x, y, coeffs)
        ui = jnp.round(x * fx + ppx).astype(jnp.int32)
        vi = jnp.round(y * fy + ppy).astype(jnp.int32)
        valid = (z > 1e-6) & (ui >= -point_size) & (ui < width + point_size)
        valid &= (vi >= -point_size) & (vi < height + point_size)
        # bucket-padded point axis: pad rows beyond the real count are
        # masked by index (finite dummy coordinates)
        valid &= jnp.arange(lo, hi) < n_valid
        half = point_size // 2
        offs = jnp.arange(-half, point_size - half)
        du, dv = jnp.meshgrid(offs, offs, indexing="ij")
        uu = (ui[:, None] + du.reshape(-1)[None, :]).reshape(-1)
        vv = (vi[:, None] + dv.reshape(-1)[None, :]).reshape(-1)
        zz = jnp.repeat(z, k)
        ok = jnp.repeat(valid, k) & (uu >= 0) & (uu < width) & (vv >= 0) & (vv < height)
        flat = jnp.where(ok, vv * width + uu, drop)  # drop slot at end
        return flat, zz, ok

    slabs = [(lo, min(lo + _SPLAT_CHUNK, n)) for lo in range(0, n, _SPLAT_CHUNK)]
    zbuf = jnp.full((drop + 1,), inf, jnp.float32)
    for lo, hi in slabs:
        flat, zz, ok = proj(lo, hi)
        zbuf = zbuf.at[flat].min(jnp.where(ok, zz, inf))
    img = jnp.ones((drop + 1, 3), jnp.float32)  # white background
    for lo, hi in slabs:
        flat, zz, ok = proj(lo, hi)
        cc = jnp.repeat(colors01[lo:hi], k, axis=0)
        win = ok & (zz <= zbuf[flat] + 1e-7)
        img = img.at[jnp.where(win, flat, drop)].set(cc)
    alpha = (zbuf[:drop] < inf).astype(jnp.float32)
    rgb = img[:drop].reshape(height, width, 3)
    return rgb, alpha.reshape(height, width)


_splat = partial(jax.jit, static_argnames=("model", "width", "height", "point_size"))(
    _splat_core
)


@partial(jax.jit, static_argnames=("model", "width", "height", "point_size"))
def _splat_batch_u8(
    points_world, colors01, n_valid, w2c_batch, fx, fy, ppx, ppy, coeffs, model, width, height, point_size
):
    """All frames in one dispatch, packed uint8 RGBA on device.

    ``lax.map`` keeps one frame's splat temporaries live at a time; the
    packed u8 output is 4x fewer readback bytes than float rgb+alpha —
    the readback link, not the splat, dominates coverage generation on a
    tunneled TPU (~10 MB/s host link)."""

    def one(w2c):
        pts_cam = points_world @ w2c[:3, :3].T + w2c[:3, 3]
        rgb, alpha = _splat_core(
            pts_cam, colors01, n_valid, fx, fy, ppx, ppy, coeffs, model,
            width, height, point_size,
        )
        rgba = jnp.concatenate([rgb, alpha[..., None]], axis=-1)
        return jnp.round(jnp.clip(rgba, 0.0, 1.0) * 255.0).astype(jnp.uint8)

    return jax.lax.map(one, w2c_batch)


def render_pointcloud_views(
    points_world: np.ndarray,
    colors: Optional[np.ndarray],
    cam_to_world_batch: np.ndarray,  # (F, 4, 4)
    intr,
    point_size: Optional[int] = None,
) -> np.ndarray:
    """Batched GT renders -> uint8 RGBA (F, H, W, 4), one device dispatch."""
    pts = jnp.asarray(points_world, jnp.float32)
    col = _colors01(colors, len(pts))
    pts, col, n_valid = _pad_points_bucket(pts, col)
    c2w = np.asarray(cam_to_world_batch, np.float64)
    w2c = np.linalg.inv(c2w)
    # pad the frame axis to a bucket so every coverage view count shares a
    # compiled program (pad frames render behind the camera and are sliced
    # off on device before the readback)
    f = len(w2c)
    bucket = next((b for b in (4, 8, 16, 32, 64, 128) if f <= b), f)
    w2c34 = np.tile(np.eye(3, 4, dtype=np.float64), (bucket, 1, 1))
    w2c34[:f] = w2c[:, :3, :4]
    out = _splat_batch_u8(
        pts,
        col,
        n_valid,
        jnp.asarray(w2c34, jnp.float32),
        jnp.float32(intr.fx),
        jnp.float32(intr.fy),
        jnp.float32(intr.ppx),
        jnp.float32(intr.ppy),
        tuple(jnp.float32(c) for c in intr.coeffs),
        int(intr.model),
        int(intr.width),
        int(intr.height),
        int(point_size) if point_size else 5,
    )
    return np.asarray(out[:f])


def _colors01(colors, n):
    if colors is None:
        return jnp.zeros((n, 3), jnp.float32)
    col = jnp.asarray(colors, jnp.float32)
    if col.dtype != jnp.float32 or col.max() > 1.5:
        col = col.astype(jnp.float32) / 255.0
    return col


def _pad_points_bucket(pts, col):
    """Pad the point axis to a power-of-2 bucket; returns (pts, col, n_real).

    Every object has its own (arbitrary) point count after voxel thinning,
    and each distinct count would compile its own splat program (~25 s per
    shape on a remote TPU — dataset generation over dozens of objects spent
    more time compiling than rendering).  Pad rows are FINITE zeros and are
    masked by index inside _splat_core (``n_valid``) — NaN padding, though
    semantically exact, reproducibly faulted the axon TPU worker inside
    128-frame 1280x720 splat programs.
    """
    n = pts.shape[0]
    b = 1 << max(12, (int(n) - 1).bit_length())
    if b > n:
        pad = b - n
        pts = jnp.concatenate([pts, jnp.zeros((pad, 3), jnp.float32)])
        col = jnp.concatenate([col, jnp.zeros((pad, 3), jnp.float32)])
    return pts, col, jnp.int32(n)


def render_pointcloud(
    points_world: np.ndarray,
    colors: Optional[np.ndarray],
    cam_to_world: np.ndarray,
    intr,
    point_size: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Render a point cloud; returns (rgb float [0,1] HxWx3, alpha HxW).

    Background is white with alpha 0 (≙ PCL white background +
    ``convertToAlpha``, ``Share_Data.hpp:765-778``).
    """
    pts = jnp.asarray(points_world, jnp.float32)
    col = _colors01(colors, len(pts))
    pts, col, n_valid = _pad_points_bucket(pts, col)
    c2w = np.asarray(cam_to_world, np.float64)
    w2c = np.linalg.inv(c2w)
    pts_cam = pts @ jnp.asarray(w2c[:3, :3].T, jnp.float32) + jnp.asarray(
        w2c[:3, 3], jnp.float32
    )
    ps = int(point_size) if point_size else 5
    return _splat(
        pts_cam,
        col,
        n_valid,
        jnp.float32(intr.fx),
        jnp.float32(intr.fy),
        jnp.float32(intr.ppx),
        jnp.float32(intr.ppy),
        tuple(jnp.float32(c) for c in intr.coeffs),
        int(intr.model),
        int(intr.width),
        int(intr.height),
        ps,
    )


def rgba_from_render(rgb, alpha) -> np.ndarray:
    """uint8 RGBA image (white background kept under alpha=0, matching the
    reference's convertToAlpha output)."""
    rgb8 = np.asarray(jnp.round(jnp.clip(rgb, 0, 1) * 255)).astype(np.uint8)
    a8 = np.asarray(jnp.round(alpha * 255)).astype(np.uint8)
    return np.concatenate([rgb8, a8[..., None]], axis=-1)


def object_pixel_rate(alpha) -> float:
    """Fraction of non-background pixels (≙ size test, main.cpp:917-934)."""
    a = np.asarray(alpha)
    return float((a > 0).mean())


def colorfulness(rgb01: np.ndarray) -> float:
    """Hasler–Süsstrunk colorfulness metric (≙ ColorfulNess,
    ``Share_Data.hpp``): std/mean statistics of rg=R-G and yb=(R+G)/2-B."""
    img = np.asarray(rgb01, np.float64) * 255.0
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    rg = r - g
    yb = 0.5 * (r + g) - b
    std = np.sqrt(rg.std() ** 2 + yb.std() ** 2)
    mean = np.sqrt(rg.mean() ** 2 + yb.mean() ** 2)
    return float(std + 0.3 * mean)
