"""Gauss-Newton fit of the UMAP curve parameters (a, b).

Fits 1/(1 + a d^(2b)) to the target psi(d) = 1 if d <= min_dist else
exp(-(d - min_dist)) over 200 sample distances on linspace(1e-4, 3),
50 iterations of beta <- beta - pinv(J) @ r -- the reference's exact
procedure (reference impl/model.py:587-618). Golden anchor: min_dist=0.1
yields (a, b) = (1.5770, 0.8951), umap-learn's canonical fit.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_iters",))
def _fit(min_dist: jax.Array, num_iters: int = 50) -> jax.Array:
    distances = jnp.linspace(1e-4, 3.0, 200, dtype=jnp.float32)
    target = jnp.where(
        distances <= min_dist, 1.0, jnp.exp(-(distances - min_dist))
    )

    def residuals(betas):
        a = jnp.abs(betas[0]) + 1e-6
        b = jnp.abs(betas[1]) + 1e-6
        return target - 1.0 / (1.0 + a * jnp.power(distances, 2.0 * b))

    jac_fn = jax.jacfwd(residuals)

    def step(_, betas):
        res = residuals(betas)
        jac = jac_fn(betas)
        return betas - jnp.linalg.pinv(jac) @ res

    betas = jax.lax.fori_loop(
        0, num_iters, step, jnp.array([1.0, 1.0], dtype=jnp.float32)
    )
    return jnp.abs(betas) + 1e-6


def get_ab_coeffs(min_dist: float, num_iters: int = 50) -> tuple[float, float]:
    """Returns the fitted (a, b) UMAP curve coefficients."""
    betas = _fit(jnp.float32(min_dist), num_iters=num_iters)
    return float(betas[0]), float(betas[1])
