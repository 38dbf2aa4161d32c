#!/usr/bin/env python3
"""Gather rate for very wide rows (block/'super-row' fetches) at small
tables — feasibility numbers for segment-level marching where one gather
serves many samples.

  nohup python -u experiments/exp_wide_gather.py > /tmp/exp_wide.log 2>&1 &
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)
    K = 30

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    @partial(jax.jit, static_argnames=("k",))
    def g_loop(table, idx, k):
        r = table.shape[0]
        def body(c, i):
            return c + jnp.sum(table[(idx + i) % r].astype(jnp.float32)) * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k, dtype=jnp.int32))
        return c

    cases = [
        # (rows, width, dtype, n_gathers)  -> bytes/row, table MB
        (8000, 343, "bfloat16", 1_572_864),   # 12 probe anchors x 131k rays
        (8000, 343, "float32", 1_572_864),
        (8000, 1728, "bfloat16", 524_288),    # 4 fine anchors x 131k rays
        (8000, 1728, "float32", 524_288),
        (8000, 512, "bfloat16", 1_572_864),
        (1000, 1728, "bfloat16", 524_288),
        (64000, 216, "bfloat16", 524_288),    # cell-anchor window, dens only
    ]
    for rows, width, dt, n in cases:
        table = jnp.asarray(rng.normal(size=(rows, width)).astype(np.float32))
        if dt == "bfloat16":
            table = table.astype(jnp.bfloat16)
        idx = jnp.asarray(rng.integers(0, rows, n).astype(np.int32))
        mb = rows * width * (2 if dt == "bfloat16" else 4) / 1e6
        sync(g_loop(table, idx, k=K))
        t0 = time.perf_counter()
        sync(g_loop(table, idx, k=K))
        el = (time.perf_counter() - t0) / K
        gb = n * width * (2 if dt == "bfloat16" else 4) / 1e9
        print(
            f"r{rows} w{width} {dt:8s} ({mb:6.1f} MB) {n} gathers: "
            f"{el*1e3:8.2f} ms  {n/el/1e6:7.1f} M rows/s  {gb/el:6.1f} GB/s",
            flush=True,
        )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
