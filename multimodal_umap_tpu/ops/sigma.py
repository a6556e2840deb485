"""Per-point bandwidth (sigma) solver.

Solves, per row i, for sigma_i such that

    sum_j exp(-(d_ij - rho_i) / sigma_i) = log2(k)

via Newton's method -- the same fixed point and iteration count as the
reference, which differentiates through ``torch.autograd``
(reference impl/model.py:33-61). Here the derivative is analytic and
the whole solve is one fused vectorized jit: for f(s) = sum_j e_j - t
with e_j = exp(-(d_j - rho)/s),  f'(s) = sum_j e_j (d_j - rho) / s^2.

Matching quirks preserved: the +1e-6 regularizer is added to the
*gradient* (impl/model.py:59), sigma is clamped >= 1e-6, and the
initial guess is 1.0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("num_iters",))
def solve_sigmas(
    dists: jax.Array,
    rhos: jax.Array,
    num_iters: int = 20,
) -> jax.Array:
    """Newton solve for fuzzy-set bandwidths.

    Args:
        dists: (N, k) neighbor distances.
        rhos: (N,) distance to the nearest neighbor.
        num_iters: Newton iterations (reference default 20).

    Returns:
        (N,) sigma values, clamped >= 1e-6.
    """
    dists = dists.astype(jnp.float32)
    k = dists.shape[1]
    target = jnp.log2(jnp.float32(k))
    shifted = jnp.maximum(dists - rhos.astype(jnp.float32)[:, None], 0.0)

    def newton_step(_, sigmas):
        e = jnp.exp(-shifted / sigmas[:, None])
        f = jnp.sum(e, axis=1) - target
        df = jnp.sum(e * shifted, axis=1) / (sigmas * sigmas)
        return jnp.maximum(sigmas - f / (df + 1e-6), 1e-6)

    sigmas = jnp.ones(dists.shape[0], dtype=jnp.float32)
    return jax.lax.fori_loop(0, num_iters, newton_step, sigmas)
