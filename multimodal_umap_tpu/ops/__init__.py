"""TPU compute ops: exact kNN, fuzzy graphs, spectral init, losses."""

from .knn import knn
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
