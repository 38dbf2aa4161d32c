"""Camera model: pinhole projection with RealSense-style distortion.

TPU-native re-design of the reference's scalar C helpers
(``rs2_project_point_to_pixel`` / ``rs2_deproject_pixel_to_point`` /
``project_pixel_to_ray_end``, ``Share_Data.hpp:92-196,719-726``): every
function here is written in ``jax.numpy`` over *batches* of points/pixels so
it vmaps/jits onto the VPU, with identical distortion-model semantics
(none, modified/inverse Brown-Conrady, F-theta, Kannala-Brandt 4).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# rs2_distortion enum values (≙ Share_Data.hpp:67-76)
DIST_NONE = 0
DIST_MODIFIED_BROWN_CONRADY = 1
DIST_INVERSE_BROWN_CONRADY = 2
DIST_FTHETA = 3
DIST_BROWN_CONRADY = 4
DIST_KANNALA_BRANDT4 = 5

_EPS = jnp.finfo(jnp.float32).eps


def _distort_brown_conrady(x, y, coeffs):
    """Forward Brown-Conrady distortion (≙ Share_Data.hpp:96-108)."""
    k1, k2, k3, p1, p2 = coeffs
    r2 = x * x + y * y
    f = 1.0 + k1 * r2 + k2 * r2 * r2 + p2 * r2 * r2 * r2
    xf = x * f
    yf = y * f
    dx = xf + 2.0 * k3 * xf * yf + p1 * (r2 + 2.0 * xf * xf)
    dy = yf + 2.0 * p1 * xf * yf + k3 * (r2 + 2.0 * yf * yf)
    return dx, dy


def _distort_ftheta(x, y, coeffs):
    """F-theta fisheye distortion (≙ Share_Data.hpp:109-119)."""
    k1 = coeffs[0]
    r = jnp.sqrt(x * x + y * y)
    r = jnp.maximum(r, _EPS)
    rd = (1.0 / k1) * jnp.arctan(2.0 * r * jnp.tan(k1 / 2.0))
    return x * rd / r, y * rd / r


def _distort_kb4(x, y, coeffs):
    """Kannala-Brandt 4-parameter distortion (≙ Share_Data.hpp:120-133)."""
    k1, k2, k3, k4 = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    r = jnp.sqrt(x * x + y * y)
    r = jnp.maximum(r, _EPS)
    theta = jnp.arctan(r)
    t2 = theta * theta
    series = 1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))
    rd = theta * series
    return x * rd / r, y * rd / r


def project_points(points, intr) -> jnp.ndarray:
    """Project camera-frame points (..., 3) to pixel coords (..., 2).

    ≙ ``rs2_project_point_to_pixel`` (``Share_Data.hpp:92-137``), batched.
    ``intr`` is a :class:`~nerf_prv_tpu.core.config.CameraConfig`.
    """
    points = jnp.asarray(points)
    x = points[..., 0] / points[..., 2]
    y = points[..., 1] / points[..., 2]
    model = int(intr.model)
    if model in (DIST_MODIFIED_BROWN_CONRADY, DIST_INVERSE_BROWN_CONRADY):
        x, y = _distort_brown_conrady(x, y, intr.coeffs)
    elif model == DIST_FTHETA:
        x, y = _distort_ftheta(x, y, intr.coeffs)
    elif model == DIST_KANNALA_BRANDT4:
        x, y = _distort_kb4(x, y, intr.coeffs)
    u = x * intr.fx + intr.ppx
    v = y * intr.fy + intr.ppy
    return jnp.stack([u, v], axis=-1)


def _undistort_inverse_brown_conrady(x, y, coeffs):
    """≙ Share_Data.hpp:147-155 (single forward-polynomial application)."""
    k1, k2, k3, p1, p2 = coeffs
    r2 = x * x + y * y
    f = 1.0 + k1 * r2 + k2 * r2 * r2 + p2 * r2 * r2 * r2
    ux = x * f + 2.0 * k3 * x * y + p1 * (r2 + 2.0 * x * x)
    uy = y * f + 2.0 * p1 * x * y + k3 * (r2 + 2.0 * y * y)
    return ux, uy


def _undistort_kb4(x, y, coeffs):
    """Newton inversion of the KB4 model (≙ Share_Data.hpp:156-180)."""
    k1, k2, k3, k4 = coeffs[0], coeffs[1], coeffs[2], coeffs[3]
    rd = jnp.sqrt(x * x + y * y)
    rd = jnp.maximum(rd, _EPS)

    def newton_step(theta, _):
        t2 = theta * theta
        f = theta * (1.0 + t2 * (k1 + t2 * (k2 + t2 * (k3 + t2 * k4)))) - rd
        df = 1.0 + t2 * (3.0 * k1 + t2 * (5.0 * k2 + t2 * (7.0 * k3 + 9.0 * t2 * k4)))
        return theta - f / df, None

    theta, _ = jax.lax.scan(newton_step, rd, None, length=4)
    r = jnp.tan(theta)
    return x * r / rd, y * r / rd


def _undistort_ftheta(x, y, coeffs):
    """≙ Share_Data.hpp:181-191."""
    k1 = coeffs[0]
    rd = jnp.sqrt(x * x + y * y)
    rd = jnp.maximum(rd, _EPS)
    r = jnp.tan(k1 * rd) / jnp.arctan(2.0 * jnp.tan(k1 / 2.0))
    return x * r / rd, y * r / rd


def deproject_pixels(pixels, depth, intr) -> jnp.ndarray:
    """Deproject pixel coords (..., 2) at given depth to camera-frame points.

    ≙ ``rs2_deproject_pixel_to_point`` (``Share_Data.hpp:140-196``), batched.
    """
    pixels = jnp.asarray(pixels)
    depth = jnp.asarray(depth)
    x = (pixels[..., 0] - intr.ppx) / intr.fx
    y = (pixels[..., 1] - intr.ppy) / intr.fy
    model = int(intr.model)
    if model == DIST_INVERSE_BROWN_CONRADY:
        x, y = _undistort_inverse_brown_conrady(x, y, intr.coeffs)
    elif model == DIST_KANNALA_BRANDT4:
        x, y = _undistort_kb4(x, y, intr.coeffs)
    elif model == DIST_FTHETA:
        x, y = _undistort_ftheta(x, y, intr.coeffs)
    depth = jnp.broadcast_to(depth, x.shape)
    return jnp.stack([depth * x, depth * y, depth], axis=-1)


def pixels_to_ray_ends(pixels, cam_to_world, intr, max_range=1.0) -> jnp.ndarray:
    """World-frame points at ``max_range`` depth through each pixel.

    ≙ ``project_pixel_to_ray_end`` (``Share_Data.hpp:719-726``), batched.
    ``cam_to_world`` is a (4, 4) camera-to-world matrix.
    """
    pts_cam = deproject_pixels(pixels, jnp.full(pixels.shape[:-1], max_range), intr)
    rot = cam_to_world[:3, :3]
    t = cam_to_world[:3, 3]
    return pts_cam @ rot.T + t
