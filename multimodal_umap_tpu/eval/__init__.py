"""Evaluation: cross-modal cosine and kNN retrieval metrics."""

from .validation import (
    embed,
    embed_and_recon,
    knn_test,
    recon,
    similarity_test,
)

__all__ = [
    "embed",
    "embed_and_recon",
    "knn_test",
    "recon",
    "similarity_test",
]
