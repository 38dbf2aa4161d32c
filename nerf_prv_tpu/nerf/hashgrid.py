"""Multiresolution hash encoding (instant-ngp style) in JAX.

This is the TPU rebuild of the reference's external CUDA dependency — the
NVlabs instant-ngp hash grid driven through ``pyngp``
(``Instantngp_scripts/run.py:25``).  Levels are stacked into one flat table so
a sample's 8*L corner lookups become a single gather; XLA turns the backward
pass into one fused scatter-add.  A Pallas kernel for the fused
gather+interpolate lives in :mod:`nerf_prv_tpu.ops` and is used on TPU for
large batches.

Defaults follow instant-ngp's base config: L=16 levels, F=2 features,
2^19-entry tables, resolutions 16 -> 2048 on the unit cube.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# spatial hash primes (Teschner et al.; same constants as instant-ngp)
_PRIMES = (1, 2654435761, 805459861)


@dataclass(frozen=True)
class HashGridConfig:
    levels: int = 16
    features: int = 2
    log2_table: int = 19
    n_min: int = 16
    n_max: int = 2048

    @property
    def table_size(self) -> int:
        return 1 << self.log2_table

    @property
    def out_dim(self) -> int:
        return self.levels * self.features

    def resolutions(self) -> np.ndarray:
        if self.levels == 1:
            return np.array([self.n_min])
        b = np.exp((np.log(self.n_max) - np.log(self.n_min)) / (self.levels - 1))
        return np.floor(self.n_min * b ** np.arange(self.levels)).astype(np.int32)


def init_table(key, cfg: HashGridConfig, scale: float = 1e-4) -> jnp.ndarray:
    """(levels * table_size, features), uniform +-scale like instant-ngp."""
    return jax.random.uniform(
        key,
        (cfg.levels * cfg.table_size, cfg.features),
        minval=-scale,
        maxval=scale,
        dtype=jnp.float32,
    )


def _corner_indices(cells: jnp.ndarray, res: int, table_size: int) -> jnp.ndarray:
    """Hash (or densely index) integer cell coords (..., 3) -> (...,) table idx."""
    n_dense = (res + 1) ** 3
    if n_dense <= table_size:
        idx = (
            cells[..., 0]
            + cells[..., 1] * (res + 1)
            + cells[..., 2] * (res + 1) * (res + 1)
        )
        return idx
    c = cells.astype(jnp.uint32)
    idx = (
        c[..., 0] * jnp.uint32(_PRIMES[0])
        ^ c[..., 1] * jnp.uint32(_PRIMES[1])
        ^ c[..., 2] * jnp.uint32(_PRIMES[2])
    ) & jnp.uint32(table_size - 1)
    return idx.astype(jnp.int32)


# the 8 cube corners as (8, 3) offsets
_CORNERS = np.array(
    [[i, j, k] for i in (0, 1) for j in (0, 1) for k in (0, 1)], dtype=np.int32
)


@partial(jax.jit, static_argnames=("cfg",))
def encode(table: jnp.ndarray, x: jnp.ndarray, cfg: HashGridConfig) -> jnp.ndarray:
    """Encode positions x (N, 3) in [0,1]^3 -> features (N, levels*features).

    Layout note: gathers run with flat 1-D index vectors, one per cube
    corner.  A combined (levels, N, 8) index array puts 8- and F-sized axes
    minormost, which tiles onto the TPU's (8, 128) registers with ~40x
    padding waste — measured 346 ms vs 1.5 ms for the same 50M gathers.
    """
    resolutions = cfg.resolutions()
    feats = []
    for level, res in enumerate(resolutions):
        pos = x * res
        # clamp to the last cell so boundary samples (x == 1.0) interpolate
        # within the grid (frac == 1.0) instead of indexing corner res+1 —
        # out of the (res+1)^3 dense range.  XLA silently clamps that
        # gather (masking the bug as slight boundary aliasing); Mosaic's
        # dynamic take in the Pallas kernel has no such safety net.
        cell = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, int(res) - 1)
        frac = pos - cell
        acc = jnp.zeros((x.shape[0], cfg.features), table.dtype)
        base = level * cfg.table_size
        for di, dj, dk in ((i, j, k) for i in (0, 1) for j in (0, 1) for k in (0, 1)):
            corner = cell + jnp.array([di, dj, dk], jnp.int32)
            idx = _corner_indices(corner, int(res), cfg.table_size) + base
            vals = table[idx]  # (N, F) flat gather
            wx = frac[:, 0] if di else 1.0 - frac[:, 0]
            wy = frac[:, 1] if dj else 1.0 - frac[:, 1]
            wz = frac[:, 2] if dk else 1.0 - frac[:, 2]
            acc = acc + vals * (wx * wy * wz)[:, None]
        feats.append(acc)
    return jnp.concatenate(feats, axis=-1)
