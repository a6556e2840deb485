"""Background prewarm of the evaluation executables during fit.

The eval phase of an end-to-end run is not device-bound: one warm
transform call at flickr scale is ~0.3 s (graph 0.19 s + 120-epoch
layout 0.12 s, ``tools/profile_transform.py``), yet the phase costs
~10 s in a fresh process. The difference is per-program first-call
work -- jit tracing, compile-cache deserialization, autotuning, first
dispatch -- all host-side while ``fit`` keeps the device busy for tens
of seconds. This module pays those costs on a background thread DURING
fit by driving shape-identical dummy state through the same public
eval entry points; the real eval then runs at executable-reuse speed.

The executables are keyed only on shapes and static config, so random
dummy tensors warm exactly the programs the real eval will use. The
added device work (a few query-sized layouts) is ~2 s interleaved with
the ~40 s fit.

No reference counterpart: the reference is eager torch with no
compilation phase (SURVEY.md §2.9). This is XLA-specific pipelining.
"""

from __future__ import annotations

import threading
import typing

import jax
import jax.numpy as jnp


def start_eval_prewarm(
    *,
    n_train: int,
    dims: typing.Sequence[int],
    cfg,
    q_main: int,
    q_recon: int = 16,
    k_test: int = 1,
    recon_src: int = 0,
    recon_dst: int = 1,
    seed: int = 0,
) -> threading.Thread:
    """Starts a daemon thread that warms every eval-phase executable.

    Call right before ``fit`` (the thread races fit's device work, which
    is the point); ``join()`` the returned thread before running the
    real eval. Programs warmed: the all-modality transform at
    ``q_main`` queries (similarity_test / knn_test re-embedding), both
    jitted metrics, and the ``q_recon``-query transform + invert pair
    (embed_and_recon / crossmodal app).

    Args:
        n_train: training rows (reference-table shapes).
        dims: per-modality feature dims, e.g. (768, 4096).
        cfg: the run's Config -- test_epochs/lr/alpha/batch_size/num_rep
            are part of the executable cache key and must match.
        q_main: eval query count for the metric tests.
        q_recon: query count of the crossmodal reconstruction.
        k_test: the kNN metric's k (static arg of the recall program).
        recon_src / recon_dst: modality pair of the recon path.
        seed: PRNG seed for the dummy state (values are irrelevant).
    """
    from ..models.mixture import MultimodalUMAP
    from .validation import (
        _bidirectional_recall,
        _mean_pairwise_cosine,
        embed,
        recon,
    )

    status: dict = {"error": None}

    def work() -> None:
        try:
            m = len(dims)
            model = MultimodalUMAP(
                cfg.k_neighbors, cfg.out_dim, cfg.min_dist, num_encoders=m,
                seed=seed,
            )
            keys = jax.random.split(jax.random.PRNGKey(seed), 3 * m)
            # Forge shape-identical fitted state (values irrelevant --
            # executables are keyed on shapes + static config only).
            model.data = [
                jax.random.normal(keys[i], (n_train, d), dtype=jnp.float32)
                for i, d in enumerate(dims)
            ]
            model.embeds = [
                jax.random.normal(keys[m + i], (n_train, cfg.out_dim),
                                  dtype=jnp.float32)
                for i in range(m)
            ]
            for enc in model.encoders:
                enc.sigmas = jnp.ones((n_train,), dtype=jnp.float32)
                enc.rhos = jnp.zeros((n_train,), dtype=jnp.float32)
            tensors = [
                jax.random.normal(keys[2 * m + i], (q_main, d),
                                  dtype=jnp.float32)
                for i, d in enumerate(dims)
            ]

            # similarity_test / knn_test transform program + metrics.
            embeds = embed(model, tensors, list(range(m)), cfg)
            normed = jnp.stack([
                e / jnp.maximum(
                    jnp.linalg.norm(e, axis=1, keepdims=True), 1e-12)
                for e in embeds
            ])
            float(_mean_pairwise_cosine(normed))
            float(_bidirectional_recall(embeds[0], embeds[1], k_test))
            if m > 2:
                # knn_test re-embeds per PAIR: distinct statics from the
                # all-modality program above (identical when m == 2).
                for i in range(m):
                    for j in range(i + 1, m):
                        embed(model, [tensors[i], tensors[j]], [i, j], cfg)

            # Crossmodal reconstruction pair (transform + invert at
            # q_recon queries).
            z = embed(model, [tensors[recon_src][:q_recon]], [recon_src],
                      cfg)
            recon(model, z, [recon_dst], cfg)
        except Exception as exc:  # pragma: no cover - diagnostics only
            # Prewarm is an optimization; never let it kill the run.
            status["error"] = exc
            print(f"[prewarm] eval prewarm failed (run unaffected): {exc!r}",
                  flush=True)

    thread = threading.Thread(target=work, name="eval-prewarm", daemon=True)
    # Observable outcome for tests: status["error"] is None on success.
    thread.prewarm_status = status  # type: ignore[attr-defined]
    thread.start()
    return thread
