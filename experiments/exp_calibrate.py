#!/usr/bin/env python3
"""Chip sanity: repeat a known-rate matmul + one fixed workload 5x to see
run-to-run variance (contention / throttling detector)."""
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

    @partial(jax.jit, static_argnames=("k",))
    def mm_loop(a, b, k):
        def body(c, _):
            return c @ b, None
        out, _ = jax.lax.scan(body, a, None, length=k)
        return jnp.sum(out[:1, :1])

    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)
    b = jnp.eye(n, dtype=jnp.bfloat16) * 0.999
    flops = 2 * n * n * n

    @partial(jax.jit, static_argnames=("k", "t"))
    def gather_loop(table, idx, k, t):
        def body(acc, i):
            rows = table[(idx + i) % t]
            return acc + rows[0, 0], None  # consume w/o full reduce
        acc, _ = jax.lax.scan(body, jnp.float32(0), jnp.arange(k))
        return acc

    rng = np.random.default_rng(0)
    t = 13824
    table = jnp.asarray(rng.normal(size=(t, 64)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, t, 393216), jnp.int32)

    float(np.asarray(mm_loop(a, b, k=4)))
    float(np.asarray(gather_loop(table, idx, k=4, t=t)))
    for rep in range(5):
        t0 = time.perf_counter()
        float(np.asarray(mm_loop(a, b, k=50)))
        el = time.perf_counter() - t0
        tf = 50 * flops / el / 1e12
        t0 = time.perf_counter()
        float(np.asarray(gather_loop(table, idx, k=50, t=t)))
        el2 = time.perf_counter() - t0
        print(f"rep {rep}: matmul {tf:7.1f} TF/s   gather {50*393216/el2/1e6:7.1f} Mrows/s",
              flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
