"""Hemisphere view-space generation and IO.

Replaces the reference's mode-0 pipeline (``main.cpp:1117-1182``) which
derives hemisphere view sets by rotating precomputed Tammes-sphere point sets
and keeping the z>=0 half.  TPU-native re-design: we *solve the packing
problem directly* — N points on the upper hemisphere with one point pinned to
the +z pole (the pipeline's start view, cf. ``main.cpp:3642``), optimized by
Riesz-energy gradient descent, vmapped over random restarts so every size and
every restart runs as one batched JAX program.

File format stays byte-compatible with the shipped ``Hemisphere/N.txt``
(N rows of ``x y z``, consumed at ``Share_Data.hpp:517-526``).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def load_view_space(viewspace_dir: str, n: int) -> np.ndarray:
    """Read ``<dir>/<n>.txt`` -> (n, 3) float64 (≙ Share_Data.hpp:517-526)."""
    path = os.path.join(viewspace_dir, f"{n}.txt")
    pts = np.loadtxt(path, dtype=np.float64)
    pts = np.atleast_2d(pts)
    if pts.shape != (n, 3):
        raise ValueError(f"{path}: expected {(n, 3)}, got {pts.shape}")
    return pts


def save_view_space(viewspace_dir: str, pts: np.ndarray) -> str:
    os.makedirs(viewspace_dir, exist_ok=True)
    path = os.path.join(viewspace_dir, f"{len(pts)}.txt")
    with open(path, "w") as f:
        for p in pts:
            f.write(f"{p[0]:.8g} {p[1]:.8g} {p[2]:.8g}\n")
    return path


def load_path_order(viewspace_dir: str, n: int) -> np.ndarray:
    """Read ``<dir>/<n>_path.txt`` -> (n,) int visit order, start view first."""
    path = os.path.join(viewspace_dir, f"{n}_path.txt")
    return np.loadtxt(path, dtype=np.int64).reshape(-1)


def save_path_order(viewspace_dir: str, order: np.ndarray) -> str:
    os.makedirs(viewspace_dir, exist_ok=True)
    path = os.path.join(viewspace_dir, f"{len(order)}_path.txt")
    with open(path, "w") as f:
        for i in order:
            f.write(f"{int(i)}\n")
    return path


# --------------------------------------------------------------------------
# Hemisphere packing by Riesz-energy descent
# --------------------------------------------------------------------------


def _hemisphere_project(pts: jnp.ndarray) -> jnp.ndarray:
    """Project onto the unit upper hemisphere, pole pinned at row 0."""
    pts = pts.at[..., 2].set(jnp.abs(pts[..., 2]))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    return pts.at[0].set(jnp.array([0.0, 0.0, 1.0]))


def _riesz_energy(pts: jnp.ndarray, s: float = 2.0) -> jnp.ndarray:
    diff = pts[:, None, :] - pts[None, :, :]
    d2 = jnp.sum(diff * diff, axis=-1)
    n = pts.shape[0]
    mask = 1.0 - jnp.eye(n)
    inv = mask / jnp.maximum(d2, 1e-12) ** (s / 2.0)
    return 0.5 * jnp.sum(inv)


@partial(jax.jit, static_argnames=("n", "steps"))
def _optimize_one(key, n: int, steps: int = 800, lr: float = 3e-3):
    pts0 = jax.random.normal(key, (n, 3)).at[:, 2].set(0.5)
    pts0 = _hemisphere_project(pts0)

    grad_fn = jax.grad(_riesz_energy)

    def step(pts, i):
        g = grad_fn(pts)
        # tangent-plane projection keeps the update on the sphere manifold
        g = g - jnp.sum(g * pts, axis=-1, keepdims=True) * pts
        gnorm = jnp.linalg.norm(g, axis=-1, keepdims=True)
        g = g / jnp.maximum(gnorm, 1.0)  # clip exploding near-collision grads
        decay = lr * (1.0 - 0.9 * i / steps)
        return _hemisphere_project(pts - decay * g), None

    pts, _ = jax.lax.scan(step, pts0, jnp.arange(steps))
    return pts, _riesz_energy(pts)


def generate_hemisphere(n: int, seed: int = 0, restarts: int = 8, steps: int = 800) -> np.ndarray:
    """Optimize an n-point hemisphere view space; returns (n, 3) unit vectors
    with point (0,0,1) included (the NBV loop's start view)."""
    if n < 1:
        raise ValueError("n must be >= 1")
    if n == 1:
        return np.array([[0.0, 0.0, 1.0]])
    keys = jax.random.split(jax.random.PRNGKey(seed), restarts)
    pts, energy = jax.vmap(lambda k: _optimize_one(k, n, steps))(keys)
    best = int(jnp.argmin(energy))
    return np.asarray(pts[best], dtype=np.float64)


def min_pairwise_angle(pts: np.ndarray) -> float:
    """Packing quality: smallest pairwise central angle (radians)."""
    pts = np.asarray(pts)
    cos = np.clip(pts @ pts.T, -1.0, 1.0)
    np.fill_diagonal(cos, -1.0)
    return float(np.arccos(cos.max()))


def sum_pairwise_distance(pts: np.ndarray) -> float:
    """The reference's dispersion metric (≙ main.cpp:1164-1169)."""
    pts = np.asarray(pts)
    diff = pts[:, None, :] - pts[None, :, :]
    d = np.sqrt((diff**2).sum(-1))
    return float(np.triu(d, 1).sum())


def generate_all(
    viewspace_dir: str, sizes=range(3, 101), seed: int = 0, improve: bool = False
) -> None:
    """Mode-0 equivalent: write ``N.txt`` for every requested size
    (≙ main.cpp:1147-1177).

    Existing files are SKIPPED by default — the resume-guard style every
    other expensive mode uses (a re-run was paying the full Riesz-descent
    sweep, ~8 min of remote compiles, to regenerate identical spaces).
    ``improve=True`` restores the old behavior: regenerate and keep
    whichever of old/new has higher dispersion.
    """
    for n in sizes:
        path = os.path.join(viewspace_dir, f"{n}.txt")
        if os.path.exists(path) and not improve:
            continue
        pts = generate_hemisphere(n, seed=seed + n)
        if os.path.exists(path):
            old = load_view_space(viewspace_dir, n)
            if sum_pairwise_distance(old) >= sum_pairwise_distance(pts):
                continue
        save_view_space(viewspace_dir, pts)


class ViewSpace:
    """Candidate views placed around an object (≙ ``View_Space``,
    ``View_Space.hpp:492-728``): center = point centroid, bounding radius =
    max distance x 17/16, each z>=0 unit direction placed at
    ``view_space_radius`` from the center."""

    def __init__(self, unit_views: np.ndarray, object_points: np.ndarray, radius: float):
        unit_views = np.asarray(unit_views, dtype=np.float64)
        pts = np.asarray(object_points, dtype=np.float64)
        self.object_center = pts.mean(axis=0)
        self.predicted_size = float(
            np.linalg.norm(pts - self.object_center, axis=1).max() * 17.0 / 16.0
        )
        keep = unit_views[:, 2] >= 0  # ≙ View_Space.hpp:551
        pt_norm = np.linalg.norm(unit_views[0])  # ≙ Share_Data.hpp pt_norm
        scale = radius / pt_norm  # ≙ View_Space.hpp:552
        self.views = unit_views[keep] * scale + self.object_center
        self.radius = radius

    def __len__(self) -> int:
        return len(self.views)

    def top_view_id(self, radius: Optional[float] = None) -> int:
        """Index of the (0, 0, r) start view (≙ main.cpp:2211-2219)."""
        r = self.radius if radius is None else radius
        target = self.object_center + np.array([0.0, 0.0, r])
        d = np.linalg.norm(self.views - target, axis=1)
        i = int(np.argmin(d))
        if d[i] > 1e-5:
            raise ValueError("view space has no (0,0,r) start view")
        return i
