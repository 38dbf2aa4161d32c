"""Device mesh and sharding helpers.

The reference's parallelism is std::thread fan-out + torch DataParallel +
file-IPC between processes (SURVEY.md §2.7).  TPU-native equivalent: one SPMD
program over a ``jax.sharding.Mesh``; rays/images/objects shard over ``dp``,
ensemble members over ``ep``, and XLA inserts the collectives over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_names: Sequence[str] = ("dp",),
    axis_sizes: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if axis_sizes is None:
        axis_sizes = [n] + [1] * (len(axis_names) - 1)
    if int(np.prod(axis_sizes)) != n:
        raise ValueError(f"mesh {axis_sizes} != {n} devices")
    arr = np.asarray(devices).reshape(axis_sizes)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (batch) dimension over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "dp"):
    """Device-put a pytree of arrays with the batch dim sharded over ``axis``."""
    sh = batch_sharding(mesh, axis)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> Tuple[np.ndarray, int]:
    """Pad the batch axis so it divides the mesh; returns (padded, n_real)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, mode="edge"), n


# ---------------------------------------------------------------------------
# Tensor parallelism: grid rows sharded over a "tp" mesh axis.
#
# The voxel field's parameters are one (g^3, 8F) row table; at production
# grid sizes it fits one chip, but larger grids (g >= 128 is ~128 MB f32)
# want the classic sharded-embedding layout: each device holds a contiguous
# row shard, gathers locally with out-of-shard rows masked to zero, and one
# psum over "tp" reconstructs every row (each global row lives on exactly
# one shard).  Gradients flow through automatically: psum's backward is a
# broadcast and the masked gather's backward is a scatter into the local
# shard only.  Pipeline parallelism is deliberately absent — the field is a
# 3-layer MLP over one lookup; there is no pipelineable depth.
# ---------------------------------------------------------------------------


def tp_gather_rows(grid_local: jax.Array, row_idx: jax.Array, axis: str = "tp"):
    """Inside ``shard_map``: gather global rows from a row-sharded table.

    grid_local: (rows_per_shard, W) — this device's contiguous row shard.
    row_idx: (N,) global row ids, replicated over ``axis``.
    Returns (N, W) fully-reconstructed rows (replicated over ``axis``).
    """
    import jax.numpy as jnp

    rows_per_shard = grid_local.shape[0]
    shard = jax.lax.axis_index(axis)
    local = row_idx - shard * rows_per_shard
    in_range = (local >= 0) & (local < rows_per_shard)
    rows = grid_local[jnp.clip(local, 0, rows_per_shard - 1)]
    rows = jnp.where(in_range[:, None], rows, 0.0)
    return jax.lax.psum(rows, axis)


def tp_voxel_field(
    mesh: Mesh, params, x, dirs, cfg, axis: str = "tp", batch_axis: Optional[str] = None
):
    """Voxel-field forward with the grid row-sharded over ``axis``.

    ``params['grid']`` must be sharded ``P(axis)`` on the row dimension;
    every other leaf is replicated.  When ``batch_axis`` names a second
    mesh axis the sample batch shards over it (tp x dp: weights split one
    way, rays the other — XLA keeps the psum on the tp sub-ring).
    """
    import jax.numpy as jnp

    from ..nerf.model import radiance
    from ..nerf.voxelfield import blend_rows, cell_and_frac, density_mlp

    g = cfg.voxel_grid_size

    def body(grid_local, others, x, dirs):
        row_idx, frac = cell_and_frac(x, g)
        rows = tp_gather_rows(grid_local, row_idx, axis)
        feats = blend_rows(rows, frac, cfg.voxel_features)
        raw = density_mlp(others, feats, x, cfg)
        sigma = jnp.exp(raw[..., 0])
        rgb = radiance(others, raw[..., 1:], dirs, cfg)
        return sigma, rgb

    others = {k: v for k, v in params.items() if k != "grid"}
    bspec = P(batch_axis) if batch_axis else P()
    import jax

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(axis), P(), bspec, bspec),
        out_specs=(bspec, bspec),
        check_vma=False,
    )(params["grid"], others, x, dirs)
