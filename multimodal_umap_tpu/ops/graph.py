"""Fuzzy simplicial-set construction on fixed-shape (N, k) arrays.

Under exact kNN every graph structure is dense-indexed and fixed-shape:
neighbor ids (N, k) int32, weights (N, k) f32. This removes all of the
reference's sparse-COO bookkeeping (reference impl/model.py:92-195) and
makes every stage jit-able and shardable.

The symmetrized fit graph is the fuzzy-union t-conorm
``A + A^T - A o A^T`` (reference impl/model.py:271), realized here as a
fixed 2*N*k edge list: a forward copy of every directed kNN edge plus a
transposed copy that is masked out when the reverse edge already exists
in the kNN lists -- an exact cover of the symmetric matrix's nonzeros
with static shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from .sigma import solve_sigmas


@struct.dataclass
class EdgeGraph:
    """Fixed-shape edge-list view of a (num_rows x num_cols) affinity.

    ``valid`` masks padding/duplicate slots; every op treats invalid
    edges as weight-0 absent entries.
    """

    rows: jax.Array  # (E,) int32
    cols: jax.Array  # (E,) int32
    weights: jax.Array  # (E,) f32
    valid: jax.Array  # (E,) bool
    num_rows: int = struct.field(pytree_node=False)
    num_cols: int = struct.field(pytree_node=False)

    @property
    def num_edges(self) -> int:
        return self.rows.shape[0]


@functools.partial(jax.jit, static_argnames=("num_iters",))
def fuzzy_weights(
    dists: jax.Array, num_iters: int = 20
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fuzzy membership weights w = exp(-(d - rho)/sigma).

    Matches reference impl/model.py:197-204: rho is the per-row min
    neighbor distance and sigma the Newton-solved bandwidth.

    Args:
        dists: (Q, k) neighbor distances from exact kNN.

    Returns:
        (weights (Q, k), rhos (Q,), sigmas (Q,)).
    """
    rhos = jnp.min(dists, axis=1)
    sigmas = solve_sigmas(dists, rhos, num_iters=num_iters)
    weights = jnp.exp(-(dists - rhos[:, None]) / sigmas[:, None])
    return weights, rhos, sigmas


@jax.jit
def curve_weights(dists: jax.Array, a: jax.Array, b: jax.Array) -> jax.Array:
    """Output-space curve weights 1/(1 + a d^(2b)) used in invert mode
    (reference impl/model.py:205-206)."""
    return 1.0 / (1.0 + a * jnp.power(jnp.maximum(dists, 1e-12), 2.0 * b))


def directed_graph(nbrs: jax.Array, weights: jax.Array, num_cols: int) -> EdgeGraph:
    """Flattens a (Q, k) kNN result into a Q*k edge list (all valid)."""
    q, k = nbrs.shape
    rows = jnp.repeat(jnp.arange(q, dtype=jnp.int32), k)
    return EdgeGraph(
        rows=rows,
        cols=nbrs.reshape(-1).astype(jnp.int32),
        weights=weights.reshape(-1).astype(jnp.float32),
        valid=jnp.ones(q * k, dtype=bool),
        num_rows=q,
        num_cols=num_cols,
    )


# Row-block size for the reverse-edge lookup: the (rows, k, k) gather
# transients are ~rows*k*k*(4+4+1) bytes, so 65536 rows at k=15 is
# ~130 MB -- constant in N, where the unblocked form is ~2-3 GB at 1M.
_REV_BLOCK = 65536


def _reverse_edge_weights(nbrs: jax.Array, weights: jax.Array):
    """Reverse-edge lookup: for edge (i, j=nbrs[i,m]), find w[j, l]
    where nbrs[j, l] == i. Returns ((N, k) reverse weights, (N, k)
    exists mask). k is small (~15); above ``_REV_BLOCK`` rows the
    (rows, k, k) gathers run blockwise in a ``lax.scan`` so the
    transient footprint is constant in N (the unblocked form OOMs the
    fit-graph program at N=1M on one v5e)."""
    n, k = nbrs.shape

    def block(nbrs_r, w_full, row0):
        nbrs_of_nbrs = nbrs[nbrs_r]  # (rows, k, k)
        row_ids = (
            row0 + jnp.arange(nbrs_r.shape[0], dtype=nbrs.dtype)
        )[:, None, None]
        match = nbrs_of_nbrs == row_ids
        w_rev = jnp.sum(jnp.where(match, w_full[nbrs_r], 0.0), axis=2)
        return w_rev, jnp.any(match, axis=2)

    if n <= _REV_BLOCK:
        return block(nbrs, weights, jnp.asarray(0, dtype=nbrs.dtype))

    pad = -(-n // _REV_BLOCK) * _REV_BLOCK - n
    nb = jnp.pad(nbrs, ((0, pad), (0, 0)))
    starts = jnp.arange((n + pad) // _REV_BLOCK, dtype=nbrs.dtype)

    def step(_, start0):
        row0 = start0 * _REV_BLOCK
        nbrs_r = jax.lax.dynamic_slice(
            nb, (row0, 0), (_REV_BLOCK, k))
        return None, block(nbrs_r, weights, row0)

    _, (w_rev, exists_rev) = jax.lax.scan(step, None, starts)
    return (
        w_rev.reshape(-1, k)[:n],
        exists_rev.reshape(-1, k)[:n],
    )


@jax.jit
def _symmetrize_arrays(nbrs: jax.Array, weights: jax.Array):
    n, k = nbrs.shape
    w_rev, exists_rev = _reverse_edge_weights(nbrs, weights)

    # Fuzzy union t-conorm, symmetric per unordered pair.
    sym_w = weights + w_rev - weights * w_rev

    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32), k)
    cols = nbrs.reshape(-1).astype(jnp.int32)
    sym_flat = sym_w.reshape(-1).astype(jnp.float32)
    fwd_valid = jnp.ones(n * k, dtype=bool)
    # Transposed copies cover entries (j, i); drop them when j already
    # lists i (that entry is covered by j's own forward slot).
    bwd_valid = ~exists_rev.reshape(-1)
    return (
        jnp.concatenate([rows, cols]),
        jnp.concatenate([cols, rows]),
        jnp.concatenate([sym_flat, sym_flat]),
        jnp.concatenate([fwd_valid, bwd_valid]),
    )


def symmetrize(nbrs: jax.Array, weights: jax.Array) -> EdgeGraph:
    """Fuzzy-union symmetrization A + A^T - A o A^T on kNN lists.

    Returns a fixed 2*N*k edge list exactly covering the nonzeros of
    the symmetric fuzzy graph (reference impl/model.py:271 semantics).
    """
    n = nbrs.shape[0]
    rows, cols, w, valid = _symmetrize_arrays(nbrs, weights)
    return EdgeGraph(
        rows=rows, cols=cols, weights=w, valid=valid, num_rows=n, num_cols=n
    )


@functools.partial(jax.jit, static_argnames=())
def embed_query(nbrs: jax.Array, weights: jax.Array, ref: jax.Array) -> jax.Array:
    """Affinity-weighted average of reference rows.

    Row-normalizes the (Q, k) affinity (row sums clamped >= 1e-6) and
    averages the referenced rows -- the reference's out-of-sample init
    (impl/model.py:236-252) without sparse ops.

    Args:
        nbrs: (Q, k) reference indices.
        weights: (Q, k) affinities.
        ref: (N, D) reference rows (embeddings in transform mode; raw
            training data in invert mode -- the *intended* semantics,
            see SURVEY.md §2.10a).

    Returns:
        (Q, D) weighted averages.
    """
    row_sums = jnp.maximum(jnp.sum(weights, axis=1), 1e-6)
    norm_w = weights / row_sums[:, None]
    return jnp.einsum("qk,qkd->qd", norm_w, ref[nbrs])


@struct.dataclass
class DenseSymGraph:
    """Dense (N, k) view of the symmetric fuzzy graph for the layout
    engine: forward kNN slots carry the t-conorm union weight; each
    transposed copy (j, i) is a distinct Bernoulli-sampled entry unless
    j already lists i (then the covering slot is j's own forward slot).

    """

    nbrs: jax.Array  # (N, k) int32
    weights: jax.Array  # (N, k) f32 symmetric union weights
    bwd_valid: jax.Array  # (N, k) bool: transposed copy is distinct
    num_rows: int = struct.field(pytree_node=False)


@jax.jit
def _symmetrize_dense_arrays(nbrs: jax.Array, weights: jax.Array):
    w_rev, exists_rev = _reverse_edge_weights(nbrs, weights)
    sym_w = (weights + w_rev - weights * w_rev).astype(jnp.float32)
    return sym_w, ~exists_rev


def symmetrize_dense(nbrs: jax.Array, weights: jax.Array) -> DenseSymGraph:
    """Dense-layout fuzzy-union symmetrization (same math as
    :func:`symmetrize`; layout optimized for the epoch engine)."""
    sym_w, bwd_valid = _symmetrize_dense_arrays(nbrs, weights)
    return DenseSymGraph(
        nbrs=nbrs.astype(jnp.int32),
        weights=sym_w,
        bwd_valid=bwd_valid,
        num_rows=nbrs.shape[0],
    )


def to_dense(graph: EdgeGraph) -> jax.Array:
    """Materializes the affinity matrix (tests / small-N spectral only)."""
    dense = jnp.zeros((graph.num_rows, graph.num_cols), dtype=jnp.float32)
    w = jnp.where(graph.valid, graph.weights, 0.0)
    return dense.at[graph.rows, graph.cols].add(w)
