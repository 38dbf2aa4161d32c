#!/usr/bin/env python3
"""Grid scatter-add with CONCENTRATED duplicate indices (the in-situ case).

exp_train_anatomy2 row H measured the production-shape scatter at 0.19 ms
with uniform-random indices, yet in-situ grid gradients cost ~1.3 ms
(rows A/D).  Hypothesis: in-situ row indices concentrate on the occupied
cells (~10% of the grid after probe tightening), and XLA's scatter-add
serializes on in-flight duplicates — the duplicate factor, not the row
count, sets the rate.  If so, K scatter BANKS (sample i -> bank i%K, fold
at the end) divide the duplicate factor by K for one extra K*R*F zeros
init + fold.

  nohup python -u experiments/exp_scatter_conc.py > /tmp/exp_sconc.log 2>&1 &
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
    N = 4096 * 24  # production tight-step sample count
    R = 40 * 40 * 40
    F = 64
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
            print(f"{name:30s} {best*1e3:8.3f} ms  ({N/best/1e6:6.1f} M rows/s)",
                  flush=True)
        except Exception as e:
            print(f"{name:30s} FAILED: {str(e).splitlines()[0][:110]}", flush=True)

    @partial(jax.jit, static_argnames=("k",))
    def xla_f32(idx, upd, k):
        def body(c, _):
            out = jnp.zeros((R, F), jnp.float32).at[idx].add(upd + c)
            return c + out[0, 0] * 1e-30, None
        c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
        return c

    def make_banked(n_banks):
        bank = jnp.arange(N, dtype=jnp.int32) % n_banks

        @partial(jax.jit, static_argnames=("k",))
        def banked(idx, upd, k):
            def body(c, _):
                out = jnp.zeros((n_banks, R, F), jnp.float32).at[bank, idx].add(
                    upd + c
                )
                return c + out.sum(0)[0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
            return c
        return banked

    def make_banked_blocked(n_banks):
        # contiguous blocks instead of strided: sample i -> bank i//(N/K).
        # Ray-major sample order keeps a ray's own samples (often the same
        # cell) in ONE bank; different rays land in different banks.
        blk = N // n_banks
        bank = jnp.arange(N, dtype=jnp.int32) // blk

        @partial(jax.jit, static_argnames=("k",))
        def banked(idx, upd, k):
            def body(c, _):
                out = jnp.zeros((n_banks, R, F), jnp.float32).at[bank, idx].add(
                    upd + c
                )
                return c + out.sum(0)[0, 0] * 1e-30, None
            c, _ = jax.lax.scan(body, 0.0, jnp.arange(k))
            return c
        return banked

    # ---- index distributions ------------------------------------------------
    upd = jnp.asarray(rng.normal(size=(N, F)).astype(np.float32))

    # uniform-random over the whole grid (exp_train_anatomy2 row H)
    idx_uni = jnp.asarray(rng.integers(0, R, N).astype(np.int32))

    # concentrated: 10% of cells occupied, Zipf-weighted visit counts, and
    # ray-major ordering (24 consecutive samples share a ray -> nearby cells)
    occ = rng.choice(R, R // 10, replace=False)
    w = 1.0 / np.arange(1, occ.size + 1) ** 0.7
    w /= w.sum()
    n_rays = N // 24
    ray_cell = rng.choice(occ, n_rays, p=w)
    # each ray's 24 samples walk a short line of neighboring cells
    step = rng.integers(-1, 2, (n_rays, 24)).cumsum(1)
    idx_conc = np.clip(ray_cell[:, None] + step, 0, R - 1).astype(np.int32)
    idx_conc = jnp.asarray(idx_conc.reshape(-1))

    # extreme: all samples in 64 cells (silhouette-interior worst case)
    idx_hot = jnp.asarray(rng.choice(occ[:64], N).astype(np.int32))

    for dist_name, idx in (("uniform", idx_uni), ("concentrated", idx_conc),
                           ("hot64", idx_hot)):
        print(f"-- {dist_name}", flush=True)
        timeit(f"xla f32 {dist_name}", xla_f32, idx, upd)
        for K in (2, 4, 8):
            timeit(f"banked K={K} strided", make_banked(K), idx, upd)
        timeit("banked K=8 blocked", make_banked_blocked(8), idx, upd)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
