"""Trustworthiness of an embedding (Venna & Kaski), vectorized.

T(k) = 1 - 2/(n k (2n - 3k - 1)) * sum_i sum_{j in U_k(i)} (r(i,j) - k)

where U_k(i) are the k nearest neighbors of i in the EMBEDDING that are
not among its k nearest neighbors in the ORIGINAL space, and r(i, j) is
j's neighbor rank of i in the original space. 1.0 = no intrusions.

This is the layout-quality parity gauge named alongside kNN recall in
BASELINE.json / SURVEY.md §2.10i. One blocked kNN per space replaces
the O(N^2) ranking loops of CPU implementations.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ops.knn import knn


@functools.partial(jax.jit, static_argnames=("k",))
def _trust_from_ranks(orig_ranks: jax.Array, emb_nbrs: jax.Array, k: int):
    n = orig_ranks.shape[0]
    # rank_orig[i, j] = position of j in i's original-space ordering
    # (0 = nearest non-self neighbor).
    ranks_of_emb = jnp.take_along_axis(orig_ranks, emb_nbrs, axis=1)
    penalty = jnp.maximum(ranks_of_emb - (k - 1), 0)  # 0 if within top-k
    total = jnp.sum(penalty)
    denom = n * k * (2 * n - 3 * k - 1)
    return 1.0 - 2.0 * total / denom


def trustworthiness(
    originals: jax.Array, embedding: jax.Array, k: int = 10
) -> float:
    """Fraction-of-trust score in [0, 1] (1 = no neighbor intrusions)."""
    n = originals.shape[0]
    if not 0 < k < n / 2:
        raise ValueError(f"k={k} must be in (0, n/2) for n={n}")
    # Full original-space ranking: for the modest N where this metric is
    # evaluated, one (n, n) distance matrix + argsort is fine.
    x = jnp.asarray(originals, dtype=jnp.float32)
    d = (
        jnp.sum(x * x, 1)[:, None]
        + jnp.sum(x * x, 1)[None, :]
        - 2.0 * x @ x.T
    )
    d = d.at[jnp.arange(n), jnp.arange(n)].set(jnp.inf)
    order = jnp.argsort(d, axis=1)  # (n, n) neighbor ids by rank
    orig_ranks = jnp.argsort(order, axis=1)  # id -> rank

    _, emb_nbrs = knn(embedding, embedding, k, exclude_self=True)
    return float(_trust_from_ranks(orig_ranks, emb_nbrs, k))
