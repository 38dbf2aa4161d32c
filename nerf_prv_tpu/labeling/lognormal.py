"""Batched lognormal-CDF curve fitting.

TPU-native replacement for the OriginPro 2023b dependency: the reference fits
``LognormalCDF`` to each object's PSNR(views) samples by orthogonal distance
regression in Origin's NLFit (``Origin_scripts/NeRF_fit_curve.cpp:119-147``),
one object at a time in a GUI app.  Here the model

    y = y0 + A * Phi((ln x - mu) / sigma)

is fit by damped Gauss-Newton (Levenberg-Marquardt) written in JAX and
``vmap``-ed over objects — thousands of curve fits run as one XLA program.
The x values are exact integer view counts, so ordinary least squares is the
statistically appropriate objective (ODR differs only in its x-error model).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FitResult(NamedTuple):
    params: jnp.ndarray      # (..., 4): y0, A, mu, sigma
    cost: jnp.ndarray        # (...,) final SSE
    converged: jnp.ndarray   # (...,) bool — LM reached a stationary point


def _phi(z):
    return 0.5 * (1.0 + jax.lax.erf(z / jnp.sqrt(2.0)))


def lognormal_cdf(x, params):
    """y0 + A * Phi((ln x - mu) / |sigma|)."""
    y0, a, mu, sigma = params[..., 0], params[..., 1], params[..., 2], params[..., 3]
    z = (jnp.log(x) - mu[..., None]) / jnp.abs(sigma[..., None])
    return y0[..., None] + a[..., None] * _phi(z)


def _init_params(x, y):
    y0 = y.min()
    a = y.max() - y.min() + 1e-3
    # median-crossing heuristic: x where y crosses the midpoint
    mid = y0 + 0.5 * a
    idx = jnp.argmin(jnp.abs(y - mid))
    mu = jnp.log(x[idx])
    sigma = jnp.array(1.0)
    return jnp.stack([y0, a, mu, sigma])


@partial(jax.jit, static_argnames=("n_iter",))
def fit_lognormal(x, y, n_iter: int = 100) -> FitResult:
    """LM fit of a single curve; jit/vmap-friendly (fixed iteration count with
    acceptance masking — no data-dependent control flow)."""
    x = jnp.asarray(x, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    theta0 = _init_params(x, y)

    def residuals(theta):
        return lognormal_cdf(x, theta[None])[0] - y

    def cost(theta):
        r = residuals(theta)
        return jnp.sum(r * r)

    def step(carry, _):
        theta, lam, prev = carry
        r = residuals(theta)
        jac = jax.jacfwd(residuals)(theta)  # (n, 4)
        h = jac.T @ jac
        g = jac.T @ r
        h_damped = h + lam * jnp.diag(jnp.diag(h)) + 1e-9 * jnp.eye(4)
        delta = jnp.linalg.solve(h_damped, g)
        cand = theta - delta
        c_new = cost(cand)
        accept = (c_new < prev) & jnp.all(jnp.isfinite(cand))
        theta = jnp.where(accept, cand, theta)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 3.0, 1e7))
        newc = jnp.where(accept, c_new, prev)
        return (theta, lam, newc), (newc, jnp.linalg.norm(g))

    init = (theta0, jnp.float32(1e-3), cost(theta0))
    (theta, _, final_cost), (_, gnorms) = jax.lax.scan(step, init, None, length=n_iter)
    converged = jnp.isfinite(final_cost) & jnp.all(jnp.isfinite(theta)) & (
        gnorms[-1] < 1e-1 * (1.0 + jnp.sqrt(final_cost))
    )
    theta = theta.at[3].set(jnp.abs(theta[3]))
    return FitResult(theta, final_cost, converged)


def fit_batch(x, ys, n_iter: int = 100) -> FitResult:
    """vmapped fit: ``ys`` (B, n) against shared ``x`` (n,)."""
    fn = jax.vmap(lambda y: fit_lognormal(x, y, n_iter))
    return fn(jnp.asarray(ys, jnp.float32))


def eval_curve(params, x_eval) -> np.ndarray:
    """Evaluate fitted curves at x_eval (shared grid)."""
    p = jnp.atleast_2d(jnp.asarray(params))
    return np.asarray(lognormal_cdf(jnp.asarray(x_eval, jnp.float32), p))
