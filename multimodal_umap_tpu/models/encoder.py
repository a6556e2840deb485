"""Per-modality encoder: exact kNN graph + fuzzy weights + spectral init.

TPU-native counterpart of the reference's ``UMAPEncoder``
(reference impl/model.py:12-278). The three graph modes are preserved:

  * ``fit``       -- self-graph of the training features, symmetrized by
                     the fuzzy-union t-conorm, spectral initialization;
  * ``transform`` -- query-vs-train graph in *feature* space, fuzzy
                     weights with fresh per-query sigma/rho, initialized
                     by the affinity-weighted average of the stored
                     train embeddings (impl/model.py:273-274);
  * ``invert``    -- query-vs-train graph in *latent* space with
                     output-curve weights (impl/model.py:205-206),
                     initialized by the affinity-weighted average of the
                     training **data** rows -- the intended (fixed)
                     semantics; the reference as shipped crashes here
                     (SURVEY.md §2.10a).

NN-descent (impl/model.py:63-209) is replaced by exact tiled kNN: a
strict quality upgrade that also guarantees exactly k neighbors per row
(removing the reference's fragile ``view(Q, k)`` assumption, SURVEY.md
§2.10e).

Under a ``jax.sharding.Mesh`` every mode routes the kNN through the
ring engine (ops/knn_stream.py:knn_ring): queries and references stay
row-sharded, reference shards rotate over the ICI ring via
``lax.ppermute``, and no device ever holds a replicated feature table
(SURVEY.md §2.9 / §5.7 -- the multi-chip production path). The
downstream fuzzy-weight/symmetrize/init stages run on the row-sharded
(N, k) results under GSPMD.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from ..ops.graph import (
    DenseSymGraph,
    EdgeGraph,
    _symmetrize_arrays,
    _symmetrize_dense_arrays,
    curve_weights,
    embed_query,
    fuzzy_weights,
)
from ..ops.knn import knn, resolve_engine
from ..ops.knn_stream import exceeds_dispatch_budget
from ..ops.spectral import spectral_embedding


@functools.partial(jax.jit, static_argnames=("k", "engine"))
def _fit_graph_compute(features: jax.Array, k: int, engine: str):
    """kNN + fuzzy weights + both symmetrizations fused into ONE
    program: per-op dispatch latency dominates graph-build wall time on
    a tunneled single-host setup, so the whole deterministic pipeline
    compiles and runs as a single executable."""
    dists, nbrs = knn(features, features, k, exclude_self=True,
                      engine=engine)
    return _fit_graph_post(dists, nbrs)


@jax.jit
def _fit_graph_post(dists: jax.Array, nbrs: jax.Array):
    """Fuzzy weights + symmetrizations from (N, k) kNN results (the
    non-kNN tail of the fit graph build; separate entry point for the
    ring path, whose kNN runs in its own shard_map program)."""
    weights, rhos, sigmas = fuzzy_weights(dists)
    rows, cols, edge_w, edge_valid = _symmetrize_arrays(nbrs, weights)
    sym_w, bwd_valid = _symmetrize_dense_arrays(nbrs, weights)
    return (nbrs, weights, rhos, sigmas, rows, cols, edge_w, edge_valid,
            sym_w, bwd_valid)


@functools.partial(jax.jit, static_argnames=("k", "engine"))
def _transform_graph_compute(
    query: jax.Array, train_features: jax.Array, train_embeds: jax.Array,
    k: int, engine: str,
):
    """Fused transform-mode graph build (same dispatch-latency rationale
    as :func:`_fit_graph_compute`)."""
    dists, nbrs = knn(query, train_features, k, engine=engine)
    return _transform_graph_post(dists, nbrs, train_embeds)


@jax.jit
def _transform_graph_post(
    dists: jax.Array, nbrs: jax.Array, train_embeds: jax.Array
):
    weights, _, _ = fuzzy_weights(dists)
    init = embed_query(nbrs, weights, train_embeds)
    return nbrs, weights, init


@functools.partial(jax.jit, static_argnames=("k", "engine"))
def _invert_graph_compute(
    query_embeds: jax.Array, train_embeds: jax.Array, train_data: jax.Array,
    a: jax.Array, b: jax.Array, k: int, engine: str,
):
    """Fused invert-mode graph build (fixed data-space init semantics,
    SURVEY.md §2.10a)."""
    dists, nbrs = knn(query_embeds, train_embeds, k, engine=engine)
    return _invert_graph_post(dists, nbrs, train_data, a, b)


@jax.jit
def _invert_graph_post(
    dists: jax.Array, nbrs: jax.Array, train_data: jax.Array,
    a: jax.Array, b: jax.Array,
):
    weights = curve_weights(dists, a, b)
    init = embed_query(nbrs, weights, train_data)
    return nbrs, weights, init


def _ring_ok(mesh, num_refs: int) -> bool:
    """The ring path needs the reference rows divisible by the mesh
    size (queries are padded; the reference table is not -- falling
    back to the replicated plan keeps odd sizes correct)."""
    if mesh is None:
        return False
    size = int(mesh.devices.size)
    return size > 1 and num_refs % size == 0


def _ring_knn(queries, references, k, mesh, *, exclude_self, engine):
    """Ring kNN with query-row padding; returns (Q, k) sliced back to
    the true query count."""
    from ..ops.knn_stream import knn_ring, pad_rows_to_multiple

    p = int(mesh.devices.size)
    q_pad, n_q = pad_rows_to_multiple(queries, p)
    dists, nbrs = knn_ring(
        q_pad, references, k, mesh,
        exclude_self=exclude_self,
        bf16=(engine == "bf16"),
    )
    if q_pad.shape[0] != n_q:
        dists, nbrs = dists[:n_q], nbrs[:n_q]
    return dists, nbrs


@dataclasses.dataclass
class ModalityEncoder:
    """Graph state for one modality.

    Attributes:
        k_neighbors: neighbors per point.
        out_dim: latent dimensionality.
        id: modality index (display / bookkeeping).
        sigmas: (N,) fit-time bandwidths (persisted at fit only,
            reference impl/model.py:202-204).
        rhos: (N,) fit-time nearest-neighbor distances.
        spectral_method: ops/spectral.py initializer selection.
        knn_engine: ops/knn.py engine (None = backend default).
    """

    k_neighbors: int
    out_dim: int
    id: int = 0
    sigmas: jax.Array | None = None
    rhos: jax.Array | None = None
    spectral_method: str = "auto"
    knn_engine: str | None = None

    def fit_graph(
        self, features: jax.Array, mesh=None
    ) -> tuple[EdgeGraph, DenseSymGraph, jax.Array]:
        """Builds the symmetric fuzzy graph (edge-list view for spectral
        and checkpointing, dense view for the layout engine) and its
        spectral embedding. Under a mesh the kNN rides the ppermute
        ring with row-sharded tables (no replication)."""
        n = features.shape[0]
        engine = resolve_engine(self.knn_engine)
        ring = _ring_ok(mesh, n)
        if ring:
            dists, nbrs = _ring_knn(
                features, features, self.k_neighbors, mesh,
                exclude_self=True, engine=engine,
            )
            (nbrs, weights, rhos, sigmas, rows, cols, edge_w, edge_valid,
             sym_w, bwd_valid) = _fit_graph_post(dists, nbrs)
        elif exceeds_dispatch_budget(n, n, features.shape[1]):
            # Beyond the single-dispatch budget the sweep must chunk at
            # the HOST level (the tunneled worker dies under multi-
            # minute dispatches) -- run the kNN eagerly (knn_streamed
            # chunks + syncs internally) and only the graph tail fused.
            dists, nbrs = knn(features, features, self.k_neighbors,
                              exclude_self=True, engine=engine)
            (nbrs, weights, rhos, sigmas, rows, cols, edge_w, edge_valid,
             sym_w, bwd_valid) = _fit_graph_post(dists, nbrs)
        else:
            (nbrs, weights, rhos, sigmas, rows, cols, edge_w, edge_valid,
             sym_w, bwd_valid) = _fit_graph_compute(
                features, self.k_neighbors, engine)
        self.sigmas = sigmas
        self.rhos = rhos
        graph = EdgeGraph(rows=rows, cols=cols, weights=edge_w,
                          valid=edge_valid, num_rows=n, num_cols=n)
        dense = DenseSymGraph(nbrs=nbrs, weights=sym_w,
                              bwd_valid=bwd_valid, num_rows=n)
        embed = spectral_embedding(graph, self.out_dim,
                                   method=self.spectral_method,
                                   mesh=mesh if ring else None)
        return graph, dense, embed

    def transform_graph(
        self,
        query: jax.Array,
        train_features: jax.Array,
        train_embeds: jax.Array,
        mesh=None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Query-to-train (nbrs, weights) + weighted-average init."""
        engine = resolve_engine(self.knn_engine)
        if _ring_ok(mesh, train_features.shape[0]):
            dists, nbrs = _ring_knn(
                query, train_features, self.k_neighbors, mesh,
                exclude_self=False, engine=engine,
            )
            return _transform_graph_post(dists, nbrs, train_embeds)
        if exceeds_dispatch_budget(
                query.shape[0], train_features.shape[0],
                train_features.shape[1]):
            dists, nbrs = knn(query, train_features, self.k_neighbors,
                              engine=engine)
            return _transform_graph_post(dists, nbrs, train_embeds)
        return _transform_graph_compute(
            query, train_features, train_embeds, self.k_neighbors, engine
        )

    def invert_graph(
        self,
        query_embeds: jax.Array,
        train_embeds: jax.Array,
        train_data: jax.Array,
        a: float,
        b: float,
        mesh=None,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Latent-space (nbrs, weights) + data-space initialization
        (fixed invert semantics, SURVEY.md §2.10a)."""
        engine = resolve_engine(self.knn_engine)
        if _ring_ok(mesh, train_embeds.shape[0]):
            dists, nbrs = _ring_knn(
                query_embeds, train_embeds, self.k_neighbors, mesh,
                exclude_self=False, engine=engine,
            )
            return _invert_graph_post(
                dists, nbrs, train_data, jnp.float32(a), jnp.float32(b)
            )
        if exceeds_dispatch_budget(
                query_embeds.shape[0], train_embeds.shape[0],
                train_embeds.shape[1]):
            dists, nbrs = knn(query_embeds, train_embeds,
                              self.k_neighbors, engine=engine)
            return _invert_graph_post(
                dists, nbrs, train_data, jnp.float32(a), jnp.float32(b)
            )
        return _invert_graph_compute(
            query_embeds, train_embeds, train_data,
            jnp.float32(a), jnp.float32(b), self.k_neighbors, engine,
        )
