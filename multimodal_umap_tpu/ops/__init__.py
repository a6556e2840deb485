"""TPU compute ops: exact kNN, fuzzy graphs, spectral init, losses."""

from .knn import knn
from .knn_pallas import knn_pallas
from .knn_stream import knn_ring, knn_streamed
from .sigma import solve_sigmas
from .graph import (
    EdgeGraph,
    curve_weights,
    directed_graph,
    embed_query,
    fuzzy_weights,
    symmetrize,
    to_dense,
)
from .spectral import spectral_embedding
from . import losses

__all__ = [
    "knn",
    "knn_pallas",
    "knn_ring",
    "knn_streamed",
    "solve_sigmas",
    "EdgeGraph",
    "curve_weights",
    "directed_graph",
    "embed_query",
    "fuzzy_weights",
    "symmetrize",
    "to_dense",
    "spectral_embedding",
    "losses",
]
