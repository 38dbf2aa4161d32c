"""Novel (held-out) view sampling — mode 1 equivalent.

The reference draws 10,000 candidate sets of 100 random hemisphere views
disjoint from all coverage view spaces and keeps the set with the largest
top-weighted pairwise dispersion (``main.cpp:1184-1413``), one set at a time
on the CPU.  Here all restarts are sampled and scored as one batched JAX
program.
"""

from __future__ import annotations

import os
from functools import partial
from typing import Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_views", "restarts"))
def _sample_and_score(key, num_views: int, restarts: int):
    # rejection-free hemisphere sampling: normal -> normalize -> |z|
    pts = jax.random.normal(key, (restarts, num_views, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)
    pts = pts.at[..., 2].set(jnp.abs(pts[..., 2]))
    diff = pts[:, :, None, :] - pts[:, None, :, :]
    d = jnp.sqrt(jnp.maximum(jnp.sum(diff * diff, axis=-1), 0.0))
    dis = 0.5 * jnp.sum(d, axis=(1, 2))
    # top-view weighting (≙ main.cpp:1271-1275): each view with z >= 0.8
    # adds dis / num_views to the score
    top = jnp.sum(pts[..., 2] >= 0.8, axis=-1)
    score = dis * (1.0 + top / num_views)
    return pts, score


def sample_novel_views(
    num_views: int = 100,
    seed: int = 0,
    restarts: int = 10000,
    exclude: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Max-dispersion random hemisphere view set (≙ main.cpp:1252-1280).

    ``exclude``: (M, 3) coverage directions that must not be duplicated
    (collisions are measure-zero for continuous sampling; asserted anyway,
    matching the reference's exact-tuple check at ``main.cpp:1260``).
    """
    pts, score = _sample_and_score(jax.random.PRNGKey(seed), num_views, restarts)
    best = np.asarray(pts[int(jnp.argmax(score))], dtype=np.float64)
    if exclude is not None and len(exclude):
        ex = np.asarray(exclude)
        ex = ex / np.linalg.norm(ex, axis=1, keepdims=True)
        d = np.linalg.norm(best[:, None, :] - ex[None, :, :], axis=-1)
        assert d.min() > 1e-9, "novel view collides with a coverage view"
    return best


def coverage_directions(viewspace_dir: str, sizes: Iterable[int] = range(3, 101)) -> np.ndarray:
    """All normalized coverage view directions (≙ main.cpp:1190-1201)."""
    from .hemisphere import load_view_space

    dirs = []
    for n in sizes:
        try:
            pts = load_view_space(viewspace_dir, n)
        except (OSError, ValueError):
            continue
        dirs.append(pts / np.linalg.norm(pts, axis=1, keepdims=True))
    return np.concatenate(dirs, axis=0) if dirs else np.zeros((0, 3))


def get_or_create_novel_views(
    workspace: str,
    viewspace_dir: str,
    num_views: int = 100,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """Idempotent train/test novel view sets (≙ main.cpp:1246-1330).

    Writes/reads ``<workspace>/novel_train_views.txt`` and
    ``novel_test_views.txt``.
    """
    os.makedirs(workspace, exist_ok=True)
    out = []
    exclude = coverage_directions(viewspace_dir)
    for i, name in enumerate(("novel_train_views.txt", "novel_test_views.txt")):
        path = os.path.join(workspace, name)
        if os.path.exists(path):
            views = np.loadtxt(path).reshape(-1, 3)
        else:
            views = sample_novel_views(num_views, seed=seed + i, exclude=exclude)
            np.savetxt(path, views)
        exclude = np.concatenate([exclude, views], axis=0) if len(exclude) else views
        out.append(views)
    return out[0], out[1]
