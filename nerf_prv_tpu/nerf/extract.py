"""Geometry export and camera-path video rendering.

≙ the ``run.py`` extras the pipeline exposes but rarely uses:
``--save_mesh`` (marching-cubes export, run.py:279-282) and
``--video_camera_path`` (run.py:319-353).  Geometry is exported as a colored
surface point cloud (density-thresholded voxel centers with field-queried
colors) in PLY — a drop-in for downstream tools that consumed the
reference's mesh; video frames render through the batched path and are
stitched with ffmpeg when available.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .model import NerfConfig, density, field


def extract_density_grid(params, cfg: NerfConfig, resolution: int = 128, chunk: int = 1 << 17):
    """Sample the field's density on a resolution^3 grid -> (R, R, R) array."""
    lin = (np.arange(resolution) + 0.5) / resolution
    pts = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), axis=-1).reshape(-1, 3)
    out = []
    for i in range(0, len(pts), chunk):
        out.append(np.asarray(density(params, jnp.asarray(pts[i : i + chunk], jnp.float32), cfg)))
    return np.concatenate(out).reshape(resolution, resolution, resolution)


def save_geometry(
    params,
    cfg: NerfConfig,
    out_ply: str,
    resolution: int = 128,
    density_threshold: float = 10.0,
    chunk: int = 1 << 17,
) -> int:
    """Export the density-thresholded surface as a colored PLY point cloud
    (≙ --save_mesh / compute_and_save_marching_cubes_mesh).  Returns the
    number of exported points."""
    from ..scene.ply import save_ply_binary

    grid = extract_density_grid(params, cfg, resolution, chunk)
    occ = grid > density_threshold
    # keep surface cells only: occupied with at least one empty neighbor
    # (outside the grid counts as empty — no periodic wrap)
    padded = np.pad(occ, 1, constant_values=False)
    interior = occ.copy()
    r = resolution
    for axis in range(3):
        sl_lo = [slice(1, r + 1)] * 3
        sl_hi = [slice(1, r + 1)] * 3
        sl_lo[axis] = slice(0, r)
        sl_hi[axis] = slice(2, r + 2)
        interior &= padded[tuple(sl_lo)] & padded[tuple(sl_hi)]
    surface = occ & ~interior
    idx = np.argwhere(surface)
    pts = (idx + 0.5) / resolution
    if len(pts) == 0:
        save_ply_binary(out_ply, np.zeros((0, 3)), np.zeros((0, 3), np.uint8))
        return 0
    dirs = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (len(pts), 1))
    cols = []
    for i in range(0, len(pts), chunk):
        _, rgb = field(
            params,
            jnp.asarray(pts[i : i + chunk], jnp.float32),
            jnp.asarray(dirs[i : i + chunk]),
            cfg,
        )
        cols.append(np.asarray(rgb))
    colors = (np.clip(np.concatenate(cols), 0, 1) * 255).astype(np.uint8)
    save_ply_binary(out_ply, pts, colors)
    return len(pts)


def render_video(
    params,
    camera_path_json: str,
    out_path: str,
    cfg: Optional[NerfConfig] = None,
    fps: int = 30,
) -> int:
    """Render every frame of a transforms-style camera path; writes
    ``frame_%04d.png`` next to ``out_path`` and stitches an mp4 with ffmpeg
    when available (≙ run.py:319-353).  Returns the frame count."""
    from PIL import Image

    from .rays import load_dataset
    from .render import render_views

    cfg = cfg or NerfConfig()
    ds = load_dataset(camera_path_json, with_images=False)
    frames_dir = os.path.splitext(out_path)[0] + "_frames"
    os.makedirs(frames_dir, exist_ok=True)
    from .render import build_render_aux

    aux = build_render_aux(params, cfg)  # once per video, not per group
    group = 8
    count = 0

    def _flush(u8, finish, start, stop):
        nonlocal count
        redo = finish()
        if redo is not None:
            u8 = jnp.clip(jnp.round(redo[..., :3] * 255), 0, 255).astype(jnp.uint8)
        arr = np.asarray(u8)
        for i in range(stop - start):
            Image.fromarray(arr[i], "RGB").save(
                os.path.join(frames_dir, f"frame_{start + i:04d}.png")
            )
            count += 1

    # pipelined like api.eval_nerf: frame encoding overlaps the next
    # group's device render (render_views defer contract)
    pending = None
    for start in range(0, ds.n_frames, group):
        stop = min(start + group, ds.n_frames)
        imgs, finish = render_views(
            params,
            jnp.asarray(ds.origins[start:stop]),
            jnp.asarray(ds.rotations[start:stop]),
            ds.camera,
            cfg,
            aux=aux,
            defer=True,
        )
        u8 = jnp.clip(jnp.round(imgs[..., :3] * 255), 0, 255).astype(jnp.uint8)
        if pending is not None:
            _flush(*pending)
        pending = (u8, finish, start, stop)
    if pending is not None:
        _flush(*pending)
    try:
        subprocess.run(
            [
                "ffmpeg", "-y", "-framerate", str(fps),
                "-i", os.path.join(frames_dir, "frame_%04d.png"),
                "-c:v", "libx264", "-pix_fmt", "yuv420p", out_path,
            ],
            check=True,
            capture_output=True,
        )
    except (OSError, subprocess.CalledProcessError):
        pass  # frames remain on disk when ffmpeg is unavailable
    return count
