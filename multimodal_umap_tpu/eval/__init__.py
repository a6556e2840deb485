"""Evaluation: cross-modal cosine and kNN retrieval metrics."""

from .prewarm import start_eval_prewarm
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
    "start_eval_prewarm",
    "trustworthiness",
]
