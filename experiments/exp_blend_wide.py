#!/usr/bin/env python3
"""Full-width trilinear blend: can blend_rows stop wasting VPU lanes?

blend_rows currently does 8 slice multiply-accumulates of width F=8 —
8-lane ops on the TPU's (8,128) vector registers, ~6% lane efficiency —
and the march anatomy (exp_breakdown2) blamed ~15 ms of a 23 ms
131k-ray chunk on exactly this blend.  Variants measured here:

  A  current 8x (N,8) slice MACs
  B  wide:  prod = rows * (w @ E), E the constant (8,64) 0/1 expansion;
     fold-tree reduce (N,64)->(N,32)->(N,16)->(N,8) — everything full-width
  C  3D:    (w[:,:,None] * rows.reshape(N,8,8)).sum(1) — XLA's choice

at production march shapes (131k rays x 16 samples = 2.1M samples),
forward and forward+backward (the train step's grid cotangent is the
same narrow pattern mirrored), plus the (N,8)x(N,8) probe trilinear of
_cell_sigma_at at 20-probe shapes.

  nohup python -u experiments/exp_blend_wide.py > /tmp/exp_blendw.log 2>&1 &
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    def sync(x):
        return float(np.asarray(jnp.sum(x)))

    F = 8
    N = 131072 * 16  # production march samples per chunk
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.normal(size=(N, 8 * F)).astype(np.float32))
    frac = jnp.asarray(rng.uniform(size=(N, 3)).astype(np.float32))

    from nerf_prv_tpu.nerf.voxelfield import corner_weights

    E = jnp.asarray(np.kron(np.eye(8), np.ones((1, F))), jnp.float32)

    def blend_a(rows, frac):
        w = corner_weights(frac)
        out = jnp.zeros((rows.shape[0], F), rows.dtype)
        for c in range(8):
            out = out + rows[:, c * F : (c + 1) * F] * w[:, c : c + 1]
        return out

    def blend_b(rows, frac):
        w = corner_weights(frac)
        x = rows * (w @ E)
        m = 8 * F
        while m > F:
            m //= 2
            x = x[:, :m] + x[:, m:]
        return x

    def blend_c(rows, frac):
        w = corner_weights(frac)
        return (w[:, :, None] * rows.reshape(-1, 8, F)).sum(axis=1)

    K = 50  # scan-amortized: each sync pays one ~29 ms tunnel readback

    def timed(fn, grad):
        def run(rows, frac):
            def body(acc, _):
                r = rows + acc * 1e-12
                if grad:
                    v, g = jax.value_and_grad(
                        lambda r: jnp.sum(fn(r, frac) ** 2))(r)
                    return acc + g[0, 0], None
                return acc + fn(r, frac)[0, 0], None

            return jax.lax.scan(body, 0.0, None, length=K)[0]

        f = jax.jit(run)
        sync(f(rows, frac))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(rows, frac))
            best = min(best, time.perf_counter() - t0)
        return best / K

    fns = {"A slices": blend_a, "B wide-fold": blend_b, "C 3d-sum": blend_c}
    outs = {}
    for name, fn in fns.items():
        outs[name] = np.asarray(jax.jit(fn)(rows, frac))
        tf = timed(fn, False)
        tg = timed(fn, True)
        print(f"{name:12s} fwd {tf * 1e3:7.2f} ms   fwd+bwd "
              f"{tg * 1e3:7.2f} ms", flush=True)
    for name in ("B wide-fold", "C 3d-sum"):
        print(f"   max|{name[0]} - A| = "
              f"{np.abs(outs[name] - outs['A slices']).max():.2e}", flush=True)

    # probe trilinear (N, 8)·(N, 8) -> (N,)
    Np = 131072 * 20
    prows = jnp.asarray(rng.normal(size=(Np, 8)).astype(np.float32))
    pw = corner_weights(jnp.asarray(rng.uniform(size=(Np, 3)).astype(np.float32)))

    def probe_a(r, w):
        return jnp.exp(jnp.sum(r * w, axis=-1))

    def probe_b(r, w):
        x = r * w
        m = 8
        while m > 1:
            m //= 2
            x = x[:, :m] + x[:, m:]
        return jnp.exp(x[:, 0])

    K = 50
    for name, fn in (("P sum", probe_a), ("P fold", probe_b)):
        def run(prows, pw, fn=fn):
            def body(acc, _):
                return acc + fn(prows + acc * 1e-12, pw)[0], None

            return jax.lax.scan(body, 0.0, None, length=K)[0]

        f = jax.jit(run)
        sync(f(prows, pw))
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            sync(f(prows, pw))
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s} fwd {best / K * 1e3:7.2f} ms", flush=True)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()
