#!/usr/bin/env python3
"""A1 pooled-probe lookup variants.

The level-1 probe costs ~62 ms per 8-frame group (exp_render_anatomy3) for
1.18M rays x 8 samples — far above any compute floor.  Suspect: the
factorized one-hot matmul materializes an (M, nb^2) f32 intermediate
(~15 GB of HBM traffic at production M).  Variants:

  a. current factorized one-hot (f32)
  b. bf16 one-hots + bf16 pooled (halves intermediate bytes)
  c. flat-index narrow gather (9.4M rows @ ~250M rows/s floor = ~37 ms)
  d. one-hot on (x*nb+y) pairs then z — (M, nb) largest intermediate

  nohup python -u experiments/exp_probe_l1_variants.py > /tmp/exp_l1.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "tests"))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from functools import partial

    g = 40
    block = 2
    nb = -(-g // block)  # 20
    m = 1 << 20  # ~1M sample positions per call (1.18M rays x 8 / 9 chunks)
    s = 8

    key = jax.random.PRNGKey(0)
    pooled = jax.random.uniform(key, (nb, nb, nb))
    pos = jax.random.uniform(jax.random.PRNGKey(1), (m, s, 3))

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    def timeit(fn, reps=10):
        fn()
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        return (time.perf_counter() - t0) / reps

    def blocks(pos):
        return jnp.clip(
            (pos.reshape(-1, 3) * (g - 1) / block).astype(jnp.int32), 0, nb - 1
        )

    @jax.jit
    def v_current(pooled, pos):
        b = blocks(pos)
        ar = jnp.arange(nb, dtype=jnp.int32)
        ox = (b[:, 0:1] == ar[None, :]).astype(jnp.float32)
        oy = (b[:, 1:2] == ar[None, :]).astype(jnp.float32)
        oz = (b[:, 2:3] == ar[None, :]).astype(jnp.float32)
        vx = ox @ pooled.reshape(nb, nb * nb)
        vy = jnp.sum(vx.reshape(-1, nb, nb) * oy[:, :, None], axis=1)
        return jnp.sum(vy * oz, axis=1)

    @jax.jit
    def v_bf16(pooled, pos):
        b = blocks(pos)
        ar = jnp.arange(nb, dtype=jnp.int32)
        ox = (b[:, 0:1] == ar[None, :]).astype(jnp.bfloat16)
        oy = (b[:, 1:2] == ar[None, :]).astype(jnp.bfloat16)
        oz = (b[:, 2:3] == ar[None, :]).astype(jnp.bfloat16)
        vx = ox @ pooled.reshape(nb, nb * nb).astype(jnp.bfloat16)
        vy = jnp.sum(vx.reshape(-1, nb, nb) * oy[:, :, None], axis=1)
        return jnp.sum(vy * oz, axis=1).astype(jnp.float32)

    @jax.jit
    def v_gather(pooled, pos):
        b = blocks(pos)
        flat = (b[:, 0] * nb + b[:, 1]) * nb + b[:, 2]
        return pooled.reshape(-1)[flat]

    @jax.jit
    def v_pairs(pooled, pos):
        # one-hot over the fused (x, y) axis: (M, nb^2) @ (nb^2, nb) matmul
        # -> (M, nb), then the z contraction; biggest live tensor is the
        # (M, nb^2) one-hot (bf16)
        b = blocks(pos)
        ar2 = jnp.arange(nb * nb, dtype=jnp.int32)
        oxy = ((b[:, 0] * nb + b[:, 1])[:, None] == ar2[None, :]).astype(
            jnp.bfloat16
        )
        vz = oxy @ pooled.reshape(nb * nb, nb).astype(jnp.bfloat16)  # (M, nb)
        ar = jnp.arange(nb, dtype=jnp.int32)
        oz = (b[:, 2:3] == ar[None, :]).astype(jnp.bfloat16)
        return jnp.sum(vz * oz, axis=1).astype(jnp.float32)

    ref = np.asarray(v_current(pooled, pos))
    for name, fn in [("current f32", v_current), ("bf16", v_bf16),
                     ("flat gather", v_gather), ("pair one-hot", v_pairs)]:
        got = np.asarray(fn(pooled, pos))
        err = np.abs(got - ref).max()
        dt = timeit(lambda fn=fn: sync(fn(pooled, pos)))
        rate = m * s / dt / 1e6
        print(f"{name:14s} {dt*1e3:7.2f} ms  ({rate:6.1f} M lookups/s)  "
              f"max err {err:.2e}", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
