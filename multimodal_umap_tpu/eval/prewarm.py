"""Background prewarm of the evaluation executables during fit.

The eval phase of an end-to-end run is not device-bound: one warm
transform call at flickr scale is ~0.3 s (graph 0.19 s + 120-epoch
layout 0.12 s, ``tools/profile_transform.py``), yet the phase costs
~10 s in a fresh process. The difference is per-program first-call
work -- jit tracing, compile-cache deserialization, autotuning, first
dispatch -- all host-side while ``fit`` keeps the device busy for tens
of seconds. This module pays those costs on a background thread DURING
fit by driving the PUBLIC eval entry points (``similarity_test``,
``knn_test``, ``embed_and_recon``) on a forged model whose state is
shape-identical to the post-fit state; the real eval then runs at
executable-reuse speed. Because the warm-up goes through the same
functions the real eval calls, it cannot drift from the programs it
exists to warm.

Memory: the per-modality training tables are the big arrays at play
(~0.5 GB at flickr scale); pass the REAL feature arrays as
``data_arrays`` so the forged model aliases them instead of allocating
dummy copies (executables are keyed on shapes, values are irrelevant;
nothing in transform/invert mutates or donates the data tables). Only
the (n_train, out_dim) embed tables and query batches are allocated
fresh (~tens of MB).

:func:`start_eval_prewarm` returns ``None`` (no thread) on the CPU
backend -- fit is host-bound there and the warm-up's compiles would
contend with the run it is trying to speed up -- and when
``MMUMAP_PREWARM=0`` is set (the cold-compile-isolation kill-switch,
BASELINE.md). Callers just ``if thread is not None: thread.join()``.

No reference counterpart: the reference is eager torch with no
compilation phase (SURVEY.md §2.9). This is XLA-specific pipelining.
"""

from __future__ import annotations

import os
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
    data_arrays: typing.Sequence[jax.Array] | None = None,
    force: bool = False,
    mesh=None,
    feature_dtype: str = "float32",
) -> threading.Thread | None:
    """Starts a daemon thread that warms every eval-phase executable.

    Call right before ``fit`` (the thread races fit's device work, which
    is the point); ``join()`` the returned thread before running the
    real eval. Programs warmed: everything ``similarity_test`` /
    ``knn_test`` / ``embed_and_recon`` compile at these shapes.

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
        data_arrays: the REAL per-modality training feature arrays, to
            be aliased as the forged model's data (avoids duplicating
            the largest tables in HBM). Shapes must be
            ``(n_train, dims[i])``; falls back to fresh random arrays
            when omitted.
        mesh: the run's ``jax.sharding.Mesh`` (or None). The forged
            state is placed with the SAME ShardingPlan helpers the real
            fit uses, so the warmed executables carry the run's
            shardings -- mesh runs no longer re-pay the ~10 s eval
            first-call cost (VERDICT r2 next-step 7).
        feature_dtype: the run's feature storage dtype. Executables are
            keyed on it (a bf16 table routes kNN differently), and a
            ``"bfloat16"`` run's tables were stored bf16 precisely
            because the f32 copy does not fit -- forging f32 here would
            both warm dead programs and allocate that copy next to the
            fit's working set.
    """
    from ..models.mixture import MultimodalUMAP
    from .validation import embed_and_recon, knn_test, similarity_test

    if not force and (
        jax.default_backend() == "cpu"
        or os.environ.get("MMUMAP_PREWARM", "1") == "0"
    ):
        # CPU: fit is host-bound and the warm-up compiles would contend
        # with it. MMUMAP_PREWARM=0: cold-compile isolation. ``force``
        # exists for tests, which exercise the worker on CPU.
        return None
    if data_arrays is not None:
        if len(data_arrays) != len(dims):
            raise ValueError(
                f"data_arrays has {len(data_arrays)} entries for "
                f"{len(dims)} modalities"
            )
        for i, (x, d) in enumerate(zip(data_arrays, dims)):
            if tuple(x.shape) != (n_train, d):
                raise ValueError(
                    f"data_arrays[{i}] shape {tuple(x.shape)} != "
                    f"({n_train}, {d}) -- wrong order or size would warm "
                    f"programs the real eval never uses"
                )

    status: dict = {"error": None}

    def work() -> None:
        try:
            m = len(dims)
            model = MultimodalUMAP(
                cfg.k_neighbors, cfg.out_dim, cfg.min_dist, num_encoders=m,
                seed=seed, mesh=mesh,
                knn_engine=getattr(cfg, "knn_engine", None),
                feature_dtype=feature_dtype,
            )
            tgt = (jnp.bfloat16 if feature_dtype == "bfloat16"
                   else jnp.float32)
            # Forged state must carry the run's placements: executables
            # are keyed on input shardings, so a replicated dummy would
            # warm programs a mesh run never calls. Same helper the
            # real fit uses (mixture.fit -> plan.rows).
            if mesh is not None:
                from ..parallel.mesh import ShardingPlan

                rows = ShardingPlan(mesh).rows
            else:
                def rows(x):
                    return x
            keys = jax.random.split(jax.random.PRNGKey(seed), 2 * m)
            # Forge shape-identical fitted state (values irrelevant --
            # executables are keyed on shapes + static config only).
            if data_arrays is not None:
                # jnp.asarray: aliases device arrays already in the
                # storage dtype (no copy); uploads host arrays once.
                model.data = [rows(jnp.asarray(x, dtype=tgt))
                              for x in data_arrays]
            else:
                model.data = [
                    rows(jax.random.normal(keys[i], (n_train, d),
                                           dtype=jnp.float32).astype(tgt))
                    for i, d in enumerate(dims)
                ]
            status["data_dtypes"] = [str(x.dtype) for x in model.data]
            model.embeds = [
                rows(jax.random.normal(keys[m + i], (n_train, cfg.out_dim),
                                       dtype=jnp.float32))
                for i in range(m)
            ]
            for enc in model.encoders:
                enc.sigmas = rows(jnp.ones((n_train,), dtype=jnp.float32))
                enc.rhos = rows(jnp.zeros((n_train,), dtype=jnp.float32))
            test = {
                f"modality_{i}": jax.random.normal(
                    keys[i], (q_main, d), dtype=jnp.float32)
                for i, d in enumerate(dims)
            }

            # The REAL eval entry points, silenced: whatever programs
            # they trace/compile are by construction the ones the real
            # eval will reuse.
            similarity_test(test, cfg, model=model, return_values=True,
                            quiet=True)
            if m > 2:
                # knn_test's per-pair re-embedding uses the same
                # executable as similarity's all-modality call when
                # m == 2 -- rerunning it would only race the timed fit
                # on the device.
                knn_test(test, cfg, k=k_test, model=model,
                         return_values=True, quiet=True)
            else:
                # Still warm the recall metric program itself (tiny).
                from .validation import bidirectional_recall

                z0 = jnp.zeros((q_main, cfg.out_dim), dtype=jnp.float32)
                float(bidirectional_recall(z0, z0, k_test))
            embed_and_recon(
                model, [test[f"modality_{recon_src}"][:q_recon]],
                [recon_src], [recon_dst], cfg,
            )
        except Exception as exc:  # pragma: no cover - diagnostics only
            # Prewarm is an optimization; never let it kill the run.
            status["error"] = exc
            print(f"[prewarm] eval prewarm failed (run unaffected): {exc!r}",
                  flush=True)
        finally:
            # Release the forged state's aliases of the REAL feature
            # tables the moment the warm calls are done (ADVICE r3
            # item 1): above _DATA_OFFLOAD_BYTES the main fit parks its
            # tables in host memory during the layout phase, and HBM
            # only frees once no reference pins the device buffers.
            # (Thread._bootstrap_inner drops the closure on exit too;
            # this makes the release explicit and exception-safe.)
            model = None  # noqa: F841

    thread = threading.Thread(target=work, name="eval-prewarm", daemon=True)
    # Observable outcome for tests: status["error"] is None on success.
    thread.prewarm_status = status  # type: ignore[attr-defined]
    thread.start()
    return thread
