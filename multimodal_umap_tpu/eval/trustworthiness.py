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
    # f32 accumulation: int32 wraps past ~2^31 total penalty, which a
    # large-n LOW-quality embedding reaches (mean rank ~n/2) -- the
    # score would then read > 1.0 and PASS the very gate it should trip.
    total = jnp.sum(penalty.astype(jnp.float32))
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


@functools.partial(jax.jit, static_argnames=("k",))
def _trust_rows(x_s, x, e_s, e, rows, k):
    """Per-sampled-row intrusion penalties (see trustworthiness_sampled).

    Computes, for each sampled anchor row, the original-space rank of
    its k embedding-space neighbors; self-matches are masked via
    ``rows``.
    """
    n = x.shape[0]
    d_o = (
        jnp.sum(x_s * x_s, 1)[:, None]
        + jnp.sum(x * x, 1)[None, :]
        - 2.0 * x_s @ x.T
    )
    d_o = jnp.where(
        jnp.arange(n)[None, :] == rows[:, None], jnp.inf, d_o
    )
    order = jnp.argsort(d_o, axis=1)
    orig_ranks = jnp.argsort(order, axis=1)  # (s, n): id -> rank

    d_e = (
        jnp.sum(e_s * e_s, 1)[:, None]
        + jnp.sum(e * e, 1)[None, :]
        - 2.0 * e_s @ e.T
    )
    d_e = jnp.where(
        jnp.arange(n)[None, :] == rows[:, None], jnp.inf, d_e
    )
    _, emb_nbrs = jax.lax.top_k(-d_e, k)  # (s, k)
    ranks_of_emb = jnp.take_along_axis(orig_ranks, emb_nbrs, axis=1)
    penalty = jnp.maximum(ranks_of_emb - (k - 1), 0)
    # f32 sum: see _trust_from_ranks (int32 wraps on large-n garbage
    # embeddings, inverting the quality gate). Returns the block SUM;
    # the caller divides by the total sample count.
    return jnp.sum(penalty.astype(jnp.float32))


def trustworthiness_sampled(
    originals: jax.Array,
    embedding: jax.Array,
    k: int = 10,
    sample_rows: int = 4096,
    seed: int = 0,
    row_block: int | None = None,
) -> float:
    """Unbiased row-sampled estimate of :func:`trustworthiness`.

    The exact score needs a full (n, n) ranking (4+ GB at flickr
    scale); sampling S anchor rows keeps the (S, n) panels device-sized
    while the per-anchor penalty statistic stays exactly the full
    formula's, so the estimate is unbiased with O(1/sqrt(S)) noise.
    Used by the driver bench's 31k quality gates (VERDICT r2 task 4).
    """
    n = originals.shape[0]
    if not 0 < k < n / 2:
        raise ValueError(f"k={k} must be in (0, n/2) for n={n}")
    x = jnp.asarray(originals, dtype=jnp.float32)
    e = jnp.asarray(embedding, dtype=jnp.float32)
    if sample_rows >= n:
        return trustworthiness(originals, embedding, k)
    rows = jax.random.choice(
        jax.random.PRNGKey(seed), n, (sample_rows,), replace=False
    )
    # Anchor rows go through in BLOCKS: one (sample_rows, n) program
    # keeps two f32 distance panels plus two int32 argsort outputs
    # alive at once -- ~4 GB x 4 at n=262k, OOM at the beyond-flickr
    # scales this estimator exists for. The default block caps each
    # panel at ~256 MB; at the 31k bench scale this is 2 dispatches.
    block = row_block or max(64, (1 << 26) // max(n, 1))
    total = 0.0
    for lo in range(0, sample_rows, block):
        blk = rows[lo:lo + block]
        total += float(_trust_rows(x[blk], x, e[blk], e, blk, k))
    mean_penalty = total / sample_rows
    denom = k * (2 * n - 3 * k - 1)
    return float(1.0 - 2.0 * mean_penalty / denom)
