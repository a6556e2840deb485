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
from ..ops.knn import knn
from ..ops.spectral import spectral_embedding


@functools.partial(jax.jit, static_argnames=("k",))
def _fit_graph_compute(features: jax.Array, k: int):
    """kNN + fuzzy weights + both symmetrizations fused into ONE
    program: per-op dispatch latency dominates graph-build wall time on
    a tunneled single-host setup, so the whole deterministic pipeline
    compiles and runs as a single executable."""
    dists, nbrs = knn(features, features, k, exclude_self=True)
    weights, rhos, sigmas = fuzzy_weights(dists)
    rows, cols, edge_w, edge_valid = _symmetrize_arrays(nbrs, weights)
    sym_w, bwd_valid = _symmetrize_dense_arrays(nbrs, weights)
    return (nbrs, weights, rhos, sigmas, rows, cols, edge_w, edge_valid,
            sym_w, bwd_valid)


@functools.partial(jax.jit, static_argnames=("k",))
def _transform_graph_compute(
    query: jax.Array, train_features: jax.Array, train_embeds: jax.Array,
    k: int,
):
    """Fused transform-mode graph build (same dispatch-latency rationale
    as :func:`_fit_graph_compute`)."""
    dists, nbrs = knn(query, train_features, k)
    weights, _, _ = fuzzy_weights(dists)
    init = embed_query(nbrs, weights, train_embeds)
    return nbrs, weights, init


@functools.partial(jax.jit, static_argnames=("k",))
def _invert_graph_compute(
    query_embeds: jax.Array, train_embeds: jax.Array, train_data: jax.Array,
    a: jax.Array, b: jax.Array, k: int,
):
    """Fused invert-mode graph build (fixed data-space init semantics,
    SURVEY.md §2.10a)."""
    dists, nbrs = knn(query_embeds, train_embeds, k)
    weights = curve_weights(dists, a, b)
    init = embed_query(nbrs, weights, train_data)
    return nbrs, weights, init


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
    """

    k_neighbors: int
    out_dim: int
    id: int = 0
    sigmas: jax.Array | None = None
    rhos: jax.Array | None = None
    spectral_method: str = "auto"

    def fit_graph(
        self, features: jax.Array
    ) -> tuple[EdgeGraph, DenseSymGraph, jax.Array]:
        """Builds the symmetric fuzzy graph (edge-list view for spectral
        and checkpointing, dense view for the layout engine) and its
        spectral embedding."""
        n = features.shape[0]
        (nbrs, weights, rhos, sigmas, rows, cols, edge_w, edge_valid,
         sym_w, bwd_valid) = _fit_graph_compute(features, self.k_neighbors)
        self.sigmas = sigmas
        self.rhos = rhos
        graph = EdgeGraph(rows=rows, cols=cols, weights=edge_w,
                          valid=edge_valid, num_rows=n, num_cols=n)
        dense = DenseSymGraph(nbrs=nbrs, weights=sym_w,
                              bwd_valid=bwd_valid, num_rows=n)
        embed = spectral_embedding(graph, self.out_dim,
                                   method=self.spectral_method)
        return graph, dense, embed

    def transform_graph(
        self,
        query: jax.Array,
        train_features: jax.Array,
        train_embeds: jax.Array,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Query-to-train (nbrs, weights) + weighted-average init."""
        return _transform_graph_compute(
            query, train_features, train_embeds, self.k_neighbors
        )

    def invert_graph(
        self,
        query_embeds: jax.Array,
        train_embeds: jax.Array,
        train_data: jax.Array,
        a: float,
        b: float,
    ) -> tuple[jax.Array, jax.Array, jax.Array]:
        """Latent-space (nbrs, weights) + data-space initialization
        (fixed invert semantics, SURVEY.md §2.10a)."""
        return _invert_graph_compute(
            query_embeds, train_embeds, train_data,
            jnp.float32(a), jnp.float32(b), self.k_neighbors,
        )
