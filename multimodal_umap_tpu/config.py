"""Experiment configuration.

Mirrors the reference's 9-field ``Config`` dataclass
(reference impl/util.py:6-31) plus the flags the reference parses but
never wires up (``log_dir``, reference main.py:22 -- honored here).
CLI defaults follow the reference CLI (reference main.py:13-29), which
are the canonical experiment values (SURVEY.md §2.10f).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Config:
    """Hyperparameters for training and inference.

    Attributes:
        k_neighbors: neighbors per point in the fuzzy kNN graph.
        out_dim: shared latent dimensionality.
        min_dist: UMAP min_dist controlling the (a, b) curve fit.
        train_epochs: epochs for ``fit``.
        num_rep: negative samples per kept attractive edge.
        lr: Adam learning rate.
        alpha: InfoNCE cross-modal alignment weight.
        batch_size: row-window size for the per-window loss averaging
            (memory chunking semantics, not minibatching -- the
            optimizer takes one step per epoch).
        test_epochs: epochs for ``transform`` / ``inverse_transform``.
        log_dir: if set, per-epoch losses are written here as JSONL.
        seed: base PRNG seed for all stochastic stages.
        spectral_method: spectral initializer -- "auto" (Chebyshev-
            filtered Rayleigh-Ritz above the small-n dense guardrail),
            "dense", "lobpcg", or "chebyshev" (ops/spectral.py).
        knn_engine: kNN engine (ops/knn.py) -- None = backend default
            (bf16 panel + exact f32 re-score on TPU, f32-highest on
            CPU); or "bf16" / "xla" / "pallas" / "approx" / "stream".
        feature_dtype: storage dtype of the training feature tables --
            "bfloat16" halves their HBM (beyond-HBM scales on one
            chip); distances re-score exactly vs the stored values.
        progress_path: optimizer-state snapshot file for preemption
            recovery (models/mixture.py fit/transform/invert).
        resume: continue from an existing ``progress_path`` snapshot.
        graph_cache_path: graph-stage snapshot (kNN sweep + spectral
            init), skipped on retry (models/mixture.py fit).
    """

    k_neighbors: int = 15
    out_dim: int = 64
    min_dist: float = 0.1

    train_epochs: int = 600
    num_rep: int = 8
    lr: float = 0.01
    alpha: float = 1.0
    batch_size: int = 256

    test_epochs: int = 120

    log_dir: str | None = None
    seed: int = 0
    spectral_method: str = "auto"
    knn_engine: str | None = None
    feature_dtype: str = "float32"
    progress_path: str | None = None
    resume: bool = False
    graph_cache_path: str | None = None
