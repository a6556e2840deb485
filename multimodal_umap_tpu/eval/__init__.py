"""Evaluation: cross-modal cosine and kNN retrieval metrics."""

from .trustworthiness import trustworthiness
from .validation import (
    embed,
    embed_and_recon,
    knn_test,
    recon,
    similarity_test,
    train,
)

__all__ = [
    "train",
    "embed",
    "embed_and_recon",
    "knn_test",
    "recon",
    "similarity_test",
    "trustworthiness",
]
