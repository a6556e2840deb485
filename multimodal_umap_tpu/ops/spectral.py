"""Spectral initialization: smallest eigenvectors of the normalized
Laplacian of the symmetric fuzzy graph.

The reference builds sparse torch tensors and runs ``torch.lobpcg``
(reference impl/model.py:211-234). Here the Laplacian never needs to be
materialized: its matvec is a ``segment_sum`` over the fixed-shape edge
list, and we run ``jax.experimental.sparse.linalg.lobpcg_standard`` on
the spectrally *shifted* operator c*I - L (eigenvalues of the
normalized Laplacian lie in [0, 2]), whose largest eigenpairs are L's
smallest. A dense ``eigh`` path covers small problems and serves as the
robust fallback.

The reference's exact operator is reproduced: L = I - D^{-1/2} A D^{-1/2}
+ 1e-6*I with degrees clamped >= 1e-6 (impl/model.py:223-229), and the
trivial first eigenvector is dropped (impl/model.py:232-234).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.sparse.linalg import lobpcg_standard

from .graph import EdgeGraph, to_dense

_EPS_SHIFT = 1e-6
_LOBPCG_SHIFT = 2.0 + 2.0 * _EPS_SHIFT


def _degrees(graph: EdgeGraph) -> jax.Array:
    w = jnp.where(graph.valid, graph.weights, 0.0)
    deg = jax.ops.segment_sum(w, graph.rows, num_segments=graph.num_rows)
    return jnp.maximum(deg, 1e-6)


def _laplacian_matvec(graph: EdgeGraph, d_inv_sqrt: jax.Array, x: jax.Array):
    """(c*I - L) @ x for x of shape (N, B); L = I - D^-1/2 A D^-1/2 + eps*I."""
    w = jnp.where(graph.valid, graph.weights, 0.0)
    scaled = (d_inv_sqrt[:, None] * x)[graph.cols] * w[:, None]
    ax = jax.ops.segment_sum(scaled, graph.rows, num_segments=graph.num_rows)
    lx = (1.0 + _EPS_SHIFT) * x - d_inv_sqrt[:, None] * ax
    return _LOBPCG_SHIFT * x - lx


@functools.partial(jax.jit, static_argnames=("out_dim", "max_iters"))
def _spectral_lobpcg(graph: EdgeGraph, out_dim: int, max_iters: int = 64):
    n = graph.num_rows
    d_inv_sqrt = _degrees(graph) ** -0.5
    matvec = functools.partial(_laplacian_matvec, graph, d_inv_sqrt)

    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(key, (n, out_dim + 1), dtype=jnp.float32)
    # Seed with the known trivial eigenvector d^{1/2} so the smallest
    # eigenpair converges immediately and the rest orthogonalize to it.
    trivial = 1.0 / d_inv_sqrt
    x0 = x0.at[:, 0].set(trivial / jnp.linalg.norm(trivial))
    # Iteration cap: each LOBPCG iteration runs a small Rayleigh-Ritz
    # eigendecomposition that is disproportionately slow on TPU, and the
    # spectral INIT only has to be low-energy -- the 600-epoch layout
    # optimization washes out residual inaccuracy (SURVEY.md §7). Loose
    # tolerances were tried and measurably corrupt the subspace; the cap
    # keeps machine-precision convergence checks.
    theta, vecs, _ = lobpcg_standard(matvec, x0, m=max_iters)
    # Largest of (c*I - L) == smallest of L; lobpcg returns descending
    # theta, i.e. vecs columns are already ordered by ascending L-eigenvalue.
    del theta
    return vecs[:, 1:]


@functools.partial(jax.jit, static_argnames=("out_dim",))
def _spectral_dense(graph: EdgeGraph, out_dim: int):
    adj = to_dense(graph)
    deg = jnp.maximum(jnp.sum(adj, axis=1), 1e-6)
    d_inv_sqrt = deg ** -0.5
    n = graph.num_rows
    lap = (
        jnp.eye(n, dtype=jnp.float32) * (1.0 + _EPS_SHIFT)
        - d_inv_sqrt[:, None] * adj * d_inv_sqrt[None, :]
    )
    _, vecs = jnp.linalg.eigh(lap)  # ascending
    return vecs[:, 1 : out_dim + 1]


def spectral_embedding(
    graph: EdgeGraph,
    out_dim: int,
    method: str = "auto",
    max_iters: int = 64,
) -> jax.Array:
    """Smallest non-trivial Laplacian eigenvectors of the fuzzy graph.

    Args:
        graph: symmetric EdgeGraph from :func:`symmetrize`.
        out_dim: number of eigenvectors returned.
        method: "dense", "lobpcg", or "auto" (dense below 4k rows or
            when LOBPCG's n > 4k guardrail would be violated).
        max_iters: LOBPCG iteration cap.

    Returns:
        (N, out_dim) float32 spectral coordinates.
    """
    n = graph.num_rows
    if method == "auto":
        # LOBPCG always: dense eigh is pathologically slow on TPU (QR
        # iteration; minutes at N=2000) while the LOBPCG matvec is pure
        # segment_sum + small matmuls. Dense only below lobpcg_standard's
        # n >= ~4*(k+1) guardrail, where eigh is trivial anyway.
        method = "dense" if n < 4 * (out_dim + 1) + 4 else "lobpcg"
    if method == "dense":
        return _spectral_dense(graph, out_dim)
    if method == "lobpcg":
        return _spectral_lobpcg(graph, out_dim, max_iters=max_iters)
    raise ValueError(f"unknown spectral method: {method}")
