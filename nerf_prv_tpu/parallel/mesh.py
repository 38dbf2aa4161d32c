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
