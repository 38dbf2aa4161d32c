#!/usr/bin/env python3
"""What is the grid scatter's ~0.67 ms FIXED cost made of?

exp_scatter_drop measured the production scatter at ~0.67 ms + ~9 ns/row
(12k rows: 0.737, 98k: 1.563).  The fixed part costs the protocol ~1.7 s
per object (2500 steps).  This micro varies every structural knob one at
a time to find what the fixed cost scales with:

  - output rows R      (8k / 64k / 512k)       -> zeros-init / table handling?
  - row width F        (8 / 32 / 64 / 128)     -> lane padding?
  - update dtype       (f32 / bf16 accumulate) -> RMW width?
  - tiny N             (1k / 4k rows)          -> the pure fixed floor
  - scatter vs .at[].set on unique iota rows   -> add-RMW vs plain write
  - two scatters in one program (N/2 each)     -> per-op or per-program?

  nohup python -u experiments/exp_scatter_fixed.py > /tmp/exp_sfix.log 2>&1 &
"""
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    print("device:", jax.devices()[0], flush=True)
    rng = np.random.default_rng(0)

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    def timeit(name, fn, *args, k=50):
        try:
            sync(fn(*args, k=k))
            best = 1e9
            for _ in range(2):
                t0 = time.perf_counter()
                sync(fn(*args, k=k))
                best = min(best, (time.perf_counter() - t0) / k)
            print(f"{name:36s} {best*1e3:8.3f} ms", flush=True)
        except Exception as e:
            print(f"{name:36s} FAILED: {str(e).splitlines()[0][:100]}", flush=True)

    def make(R, F, dtype=jnp.float32, two=False, set_mode=False):
        @partial(jax.jit, static_argnames=("k",))
        def f(idx, upd, k):
            def body(c, _):
                u = (upd + c).astype(dtype)
                if two:
                    h = idx.shape[0] // 2
                    o1 = jnp.zeros((R, F), dtype).at[idx[:h]].add(u[:h])
                    o2 = jnp.zeros((R, F), dtype).at[idx[h:]].add(u[h:])
                    return c + (o1[0, 0] + o2[0, 0]).astype(jnp.float32) * 1e-30, None
                if set_mode:
                    out = jnp.zeros((R, F), dtype).at[idx].set(
                        u, unique_indices=True)
                else:
                    out = jnp.zeros((R, F), dtype).at[idx].add(u)
                return c + out[0, 0].astype(jnp.float32) * 1e-30, None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
            return c
        return f

    N = 4096 * 16
    for R in (8192, 64000, 512000):
        idx = jnp.asarray(rng.integers(0, R, N).astype(np.int32))
        upd = jnp.asarray(rng.normal(size=(N, 64)).astype(np.float32))
        timeit(f"R={R:6d} F=64 N=65k", make(R, 64), idx, upd)

    R = 64000
    idx = jnp.asarray(rng.integers(0, R, N).astype(np.int32))
    for F in (8, 32, 128):
        upd = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))
        timeit(f"R=64k F={F:3d} N=65k", make(R, F), idx, upd)

    upd = jnp.asarray(rng.normal(size=(N, 64)).astype(np.float32))
    timeit("R=64k F=64 N=65k bf16", make(R, 64, jnp.bfloat16), idx, upd)
    timeit("R=64k F=64 N=65k two-half-scatters", make(R, 64, two=True), idx, upd)

    iota = jnp.arange(N, dtype=jnp.int32) % R
    timeit("R=64k F=64 N=65k SET unique iota", make(R, 64, set_mode=True),
           iota, upd)

    for n_small in (1024, 4096, 16384):
        idxs = idx[:n_small]
        upds = upd[:n_small]
        timeit(f"R=64k F=64 N={n_small//1024}k", make(R, 64), idxs, upds)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
