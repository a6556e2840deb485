"""Multimodal UMAP mixture model: the public model API.

TPU-native counterpart of the reference's ``UMAPMixture``
(reference impl/model.py:280-713) with the same lifecycle surface:
``fit`` / ``fit_transform`` / ``transform`` / ``inverse_transform`` /
``save_state_dict`` / ``load_state_dict`` / ``get_ab_coeffs``. Method
defaults mirror the reference's signatures (lr=0.2, alpha=0.5,
batch_size=512 -- impl/model.py:483,527,557); the canonical experiment
values flow in from the CLI via ``Config`` (SURVEY.md §2.10f).

Internally everything is fixed-shape and jit-compiled: graphs are
(N, k)-derived edge lists, the layout optimizer is one scanned Adam
step per epoch, and state round-trips through npz.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.graph import EdgeGraph
from ..parallel.mesh import ShardingPlan, shard_task
from ..utils import checkpoint as ckpt
from ..utils.prof import PhaseTimer
from .curve import get_ab_coeffs as _get_ab_coeffs
from .encoder import ModalityEncoder
from .layout import fit_task, query_task, train_layout


# Edge count past which fitted EdgeGraphs are parked in host memory
# during the layout phase (see fit); 2Nk at N=524288, k=15.
_GRAPH_OFFLOAD_EDGES = 2 * 524288 * 15

# Past this many total feature-table bytes, fit() parks the tables on
# host for the layout phase: the fit layout never reads features, and
# at 524k+ the resident tables (5.1 GiB bf16 at 524k, 10.2 GiB at 1M)
# plus the epoch program's ~9 GiB of temps overcommit the 16 GiB chip
# (tools/probe_layout_memory.py). transform/invert re-upload lazily on
# first use, after the layout transients are gone.
_DATA_OFFLOAD_BYTES = 2 << 30


def _to_host_memory(x):
    """Moves ``x`` into the device's host memory space (server-side, no
    tunnel traffic); warned numpy-readback fallback for backends
    without one (utils/snapshot.py)."""
    from ..utils.snapshot import to_host_memory

    return to_host_memory(x)


def _to_default_memory(x):
    """Inverse of :func:`_to_host_memory`: back to the device's default
    (HBM) memory space, uploading host numpy if that was the fallback."""
    if not isinstance(x, jax.Array):
        return jnp.asarray(x)
    dev = next(iter(x.devices()))
    default_kind = dev.default_memory().kind
    if getattr(x.sharding, "memory_kind", default_kind) != default_kind:
        return jax.device_put(
            x, jax.sharding.SingleDeviceSharding(
                dev, memory_kind=default_kind))
    return x


def _as_f32(x) -> jax.Array:
    # jax arrays stay on device (this host has a single slow vCPU --
    # never round-trip through numpy).
    if isinstance(x, jax.Array):
        return x.astype(jnp.float32)
    return jnp.asarray(np.asarray(x), dtype=jnp.float32)


def _as_2d(x) -> jax.Array:
    x = _as_f32(x)
    return x[None, :] if x.ndim == 1 else x


def _progress_callback(label: str, epochs: int, progress_path: str | None,
                       verbose: bool):
    """Chunk-boundary callback: live loss readout + optimizer-state
    snapshot (embeddings/reconstructions + Adam moments + epoch) so a
    preempted run loses at most one snapshot interval (SURVEY.md §5.3).
    Shared by fit, transform, and inverse_transform.

    Snapshots are throttled to one per ``MMUMAP_SNAPSHOT_INTERVAL_S``
    (default 120 s; the final chunk always saves and is flushed before
    fit returns) and written OFF the hot path by a background
    :class:`~..utils.snapshot.SnapshotWriter`: the callback stages the
    state into the device's host memory space (server-side copy) and
    returns, so the ~GB tunneled readback + npz serialization overlap
    the next chunk's device compute instead of stalling it (measured
    15-20 s/epoch of synchronous overhead at 524k vs ~0.84 s/epoch of
    compute -- VERDICT r3 weak #2).
    """
    if progress_path is None and not verbose:
        return None
    import os
    import time as _time

    from ..utils.snapshot import SnapshotWriter

    interval = float(os.environ.get("MMUMAP_SNAPSHOT_INTERVAL_S", 120.0))
    last_save = [float("-inf")]
    writer = SnapshotWriter() if progress_path is not None else None

    def callback(done, params, opt_state, hist):
        if verbose:
            print(f"{label} {done}/{epochs}  "
                  f"loss {float(hist[-1]):.4f}", flush=True)
        if progress_path is not None:
            now = _time.monotonic()
            if done < epochs and now - last_save[0] < interval:
                return
            last_save[0] = now
            leaves = jax.tree_util.tree_leaves(opt_state)
            arrays = {"epoch": np.int64(done)}
            arrays.update(
                {f"embeds_{m}": p for m, p in enumerate(params)})
            arrays.update(
                {f"opt_{i}": leaf for i, leaf in enumerate(leaves)})
            writer.submit(progress_path, arrays)
            if done >= epochs:
                # The end state must be durable before fit returns.
                writer.flush()

    return callback


def _load_progress(progress_path: str | None, resume: bool,
                   num_modes: int, lr: float, plan):
    """Restores a :func:`_progress_callback` snapshot.

    Returns ``(start_epoch, params_or_None, opt_state_or_None)``; the
    caller continues the remaining epochs with the exact per-epoch PRNG
    stream the original run would have used (train_layout folds the
    epoch index into the key). Missing snapshot => fresh start.
    """
    if not resume:
        return 0, None, None
    if progress_path is None:
        raise ValueError("resume=True requires progress_path")
    import os

    if not os.path.exists(progress_path):
        return 0, None, None
    import optax

    snap = np.load(progress_path)
    start_epoch = int(snap["epoch"])
    inits = [jnp.asarray(snap[f"embeds_{m}"]) for m in range(num_modes)]
    if plan is not None:
        # Re-apply the data-parallel row sharding: snapshot arrays are
        # plain host arrays, and train_layout only pins params that
        # already carry a NamedSharding. Adam moments shard like their
        # params; the scalar step count replicates over the same mesh.
        inits = [plan.rows(e) for e in inits]

        def _place(x):
            return plan.rows(x) if x.ndim == 2 else plan.replicated(x)
    else:
        def _place(x):
            return x
    template = optax.adam(lr).init(tuple(inits))
    leaves, treedef = jax.tree_util.tree_flatten(template)
    loaded = [
        _place(jnp.asarray(snap[f"opt_{i}"])) for i in range(len(leaves))
    ]
    return start_epoch, inits, jax.tree_util.tree_unflatten(treedef, loaded)


class MultimodalUMAP:
    """Shared-latent multimodal UMAP with InfoNCE alignment.

    Attributes:
        k_neighbors, out_dim, min_dist, num_encoders: hyperparameters.
        a, b: fitted UMAP curve coefficients.
        encoders: per-modality :class:`ModalityEncoder` graph state.
        data: training features per modality (required by
            transform/invert, hence persisted -- SURVEY.md §2.10h).
        graphs: symmetric fuzzy EdgeGraphs per modality.
        embeds: trained latent embeddings per modality.
    """

    def __init__(
        self,
        k_neighbors: int,
        out_dim: int,
        min_dist: float,
        num_encoders: int,
        seed: int = 0,
        mesh=None,
        spectral_method: str = "auto",
        knn_engine: str | None = None,
        feature_dtype: str = "float32",
    ):
        self.k_neighbors = k_neighbors
        self.out_dim = out_dim
        self.min_dist = min_dist
        self.num_encoders = num_encoders
        self.seed = seed
        # Optional jax.sharding.Mesh: shards every O(N)/O(E) stage over
        # the data axis (see parallel/mesh.py). None => single device.
        self.mesh = mesh
        # Spectral initializer: "auto" (Chebyshev-filtered Rayleigh-Ritz
        # above the small-n dense guardrail), "dense", "lobpcg", or
        # "chebyshev" (ops/spectral.py).
        self.spectral_method = spectral_method
        # kNN engine (ops/knn.py); None = backend default (bf16 panel +
        # exact f32 re-score on TPU, f32-highest panels on CPU).
        self.knn_engine = knn_engine
        # Storage dtype of the training feature tables. "bfloat16"
        # halves the largest arrays in HBM (a 1M x 4096 f32 table is
        # 16.8 GB -- over one v5e's 16 GB): the kNN sweep then feeds the
        # MXU its native input dtype directly, re-scoring distances
        # exactly w.r.t. the stored values; graph/sigma/layout math
        # stays f32 (everything downstream of the distances already is).
        if feature_dtype not in ("float32", "bfloat16"):
            raise ValueError(
                f"feature_dtype must be float32 or bfloat16, "
                f"got {feature_dtype!r}")
        self.feature_dtype = feature_dtype

        self.a, self.b = self.get_ab_coeffs(min_dist)

        self.encoders = [
            ModalityEncoder(k_neighbors, out_dim, id=i,
                            spectral_method=spectral_method,
                            knn_engine=knn_engine)
            for i in range(num_encoders)
        ]
        self.data: list[jax.Array] | None = None
        self.graphs: list[EdgeGraph] = []
        self.embeds: list[jax.Array] = []
        self.loss_history: dict[str, np.ndarray] = {}
        self.timer = PhaseTimer()

    # ------------------------------------------------------------------
    # Lifecycle
    # ------------------------------------------------------------------

    def fit(
        self,
        inputs,
        epochs: int,
        num_rep: int = 8,
        lr: float = 0.2,
        alpha: float = 0.5,
        batch_size: int = 512,
        progress_path: str | None = None,
        resume: bool = False,
        verbose: bool = False,
        graph_cache_path: str | None = None,
    ) -> None:
        """Fits the shared latent space to multimodal training data.

        Args:
            inputs: list of per-modality feature arrays, shape (N_i, D_i).
            epochs: training epochs (one Adam step each).
            num_rep: negative samples per kept edge.
            lr: Adam learning rate.
            alpha: InfoNCE weight (effective 2*alpha, SURVEY.md §2.10c).
            batch_size: row-window size for loss averaging.
            progress_path: if set, the full optimizer state (embeddings +
                Adam moments + epoch) is snapshotted there (npz) at every
                epoch-chunk boundary, so a preempted run loses at most
                one chunk (SURVEY.md §5.3).
            resume: with ``progress_path`` pointing at a snapshot,
                rebuild the (deterministic) graphs and continue the
                remaining epochs with the exact per-epoch PRNG stream
                the original run would have used. ``loss_history`` then
                covers only the resumed epochs.
            verbose: print the loss at every epoch-chunk boundary (the
                reference's tqdm loss readout, SURVEY.md §5.5).
            graph_cache_path: if set, the graph stage's outputs (edge
                lists, dense graphs, spectral inits, sigma/rho) are
                snapshotted there after building, and a rerun loads
                them instead of re-paying the kNN sweep + spectral
                filter -- the longest, most crash-exposed dispatches at
                beyond-flickr scale. The snapshot is keyed on (k,
                out_dim, feature fingerprint); a mismatch rebuilds and
                overwrites. Mesh runs store host-layout arrays and
                re-apply the data-parallel placements on load.
        """
        # Storage cast (HBM halving; see __init__) goes DIRECT to the
        # target dtype: routing an already-bf16 1M x 4096 table through
        # f32 first would materialize the 16.8 GB transient the storage
        # policy exists to avoid. Downstream consumers upcast where math
        # needs f32: the kNN engine routes bf16 tables through the
        # streamed bf16-rank + exact-rescore path (ops/knn.py),
        # invert-mode gathers promote per JAX type rules, and the
        # checkpoint bit-views bf16 through npz (utils/checkpoint.py).
        tgt = (jnp.bfloat16 if self.feature_dtype == "bfloat16"
               else jnp.float32)
        self.data = [
            x.astype(tgt) if isinstance(x, jax.Array)
            else jnp.asarray(np.asarray(x), dtype=tgt)
            for x in inputs
        ]
        # Drop fit's own handle on the caller's arrays: a same-dtype
        # astype is the same buffer, and _offload_features can only
        # free HBM once self.data holds the last live reference.
        inputs = None
        if len(self.data) != self.num_encoders:
            raise ValueError(
                f"expected {self.num_encoders} modalities, got {len(self.data)}"
            )
        if progress_path is not None and not progress_path.endswith(".npz"):
            # np.savez appends '.npz' when missing; normalize once so the
            # resume existence check and the save always agree on a path.
            progress_path = progress_path + ".npz"
        plan = self._plan()
        if plan is not None:
            # Rows shard across the mesh; the kNN panel scan then runs
            # data-parallel with replicated column blocks.
            self.data = [plan.rows(x) for x in self.data]

        cached = None
        fingerprints = None
        if graph_cache_path is not None:
            fingerprints = [ckpt.feature_fingerprint(x) for x in self.data]
            cached = ckpt.load_graph_cache(
                graph_cache_path, k_neighbors=self.k_neighbors,
                out_dim=self.out_dim,
                spectral_method=self.spectral_method,
                fingerprints=fingerprints)
        if cached is not None:
            graphs, denses, inits = (cached["graphs"], cached["denses"],
                                     cached["inits"])
            # Cache arrays are host-layout; under a mesh, re-apply the
            # data-parallel placements the built path would have used
            # (dense graphs + inits re-shard via shard_task below, so
            # only the per-encoder bandwidths need placing here --
            # shard_task replicates them for the query paths).
            for enc, s, r in zip(self.encoders, cached["sigmas"],
                                 cached["rhos"]):
                if plan is not None:
                    s, r = plan.replicated(s), plan.replicated(r)
                enc.sigmas, enc.rhos = s, r
        else:
            graphs, denses, inits = [], [], []
            for i, (enc, feats) in enumerate(zip(self.encoders, self.data)):
                with self.timer.phase(f"fit/graph_{i}"):
                    graph, dense, init = enc.fit_graph(feats, mesh=self.mesh)
                if (plan is None
                        and graph.rows.shape[0] >= _GRAPH_OFFLOAD_EDGES):
                    # Beyond-HBM scales: the 2Nk edge list (~400 MB/
                    # modality at 1M) is dead weight during the layout
                    # phase -- it is next consumed by save_state_dict,
                    # which reads it back to host anyway. Park it in
                    # host memory so the epoch program keeps the HBM.
                    # (Mesh runs keep it sharded on device: per-shard
                    # cost is already 1/P.)
                    graph = jax.tree_util.tree_map(
                        lambda x: np.asarray(x), graph)
                graphs.append(graph)
                denses.append(dense)
                inits.append(init)
            # Python loop variables outlive the loop: ``feats`` still
            # references the LAST modality's device table here, and fit
            # holds it until return -- through the whole layout phase.
            # At 1M that is the 8 GiB bf16 image table pinned in HBM
            # *after* _offload_features replaced self.data with host
            # copies (the .ladder try-1 forensics 2026-08-20: table
            # live on device AND unpinned_host at the layout OOM).
            # Cached-graph runs never enter this loop, which is why
            # resumed rungs historically fit where fresh ones OOM'd.
            del feats, graph, dense, init
            if fingerprints is not None:
                with self.timer.phase("fit/graph_cache_save"):
                    ckpt.save_graph_cache(
                        graph_cache_path, k_neighbors=self.k_neighbors,
                        out_dim=self.out_dim,
                        spectral_method=self.spectral_method,
                        graphs=graphs,
                        denses=denses, inits=inits,
                        sigmas=[e.sigmas for e in self.encoders],
                        rhos=[e.rhos for e in self.encoders],
                        fingerprints=fingerprints)
        self.graphs = graphs
        if plan is None:
            self._offload_features()

        tasks, statics = zip(
            *(fit_task(d, batch_size) for d in denses)
        )
        if plan is not None:
            tasks, inits = zip(
                *(shard_task(plan, t, e) for t, e in zip(tasks, inits))
            )

        callback = _progress_callback("epoch", epochs, progress_path,
                                      verbose)
        start_epoch, snap_inits, init_opt_state = _load_progress(
            progress_path, resume, self.num_encoders, lr, plan)
        if snap_inits is not None:
            inits = snap_inits
        # Hand init ownership to the layout (consume_inits): fit never
        # reads the spectral inits again, and at 1M/D=64 they are
        # 512 MB of HBM the epoch program needs. The cache dict aliases
        # them too (resume path) -- drop it for the same reason.
        cached = snap_inits = None
        inits = list(inits)

        with self.timer.phase("fit/layout"):
            embeds, hist = train_layout(
                inits,
                tasks,
                statics,
                mode="fit",
                epochs=epochs,
                num_rep=num_rep,
                lr=lr,
                alpha=alpha,
                batch_size=batch_size,
                a=self.a,
                b=self.b,
                key=jax.random.PRNGKey(self.seed),
                chunk_callback=callback,
                start_epoch=start_epoch,
                init_opt_state=init_opt_state,
                consume_inits=True,
            )
        self.embeds = embeds
        self.loss_history["fit"] = np.asarray(hist)

    def fit_transform(
        self,
        inputs,
        epochs: int,
        num_rep: int = 8,
        lr: float = 0.2,
        alpha: float = 0.5,
        batch_size: int = 512,
    ) -> list[jax.Array]:
        """Fits and returns the training embeddings."""
        self.fit(inputs, epochs, num_rep, lr, alpha, batch_size)
        return self.embeds

    def transform(
        self,
        inputs,
        epochs: int,
        data_indices: list[int] | None = None,
        num_rep: int = 8,
        lr: float = 0.2,
        alpha: float = 0.5,
        batch_size: int = 512,
        progress_path: str | None = None,
        resume: bool = False,
        verbose: bool = False,
    ) -> list[jax.Array]:
        """Embeds new data into the learned latent space.

        Query graphs are built in feature space against the stored
        training features; queries are initialized as affinity-weighted
        averages of train embeddings and optimized with the references
        frozen (reference impl/model.py:527-555).

        ``progress_path``/``resume`` snapshot and restore the query
        optimization exactly as in :meth:`fit` (the query graph rebuild
        is deterministic, so a preempted eval loses at most one epoch
        chunk instead of re-paying the whole phase).
        """
        self._require_fitted()
        indices = (
            list(data_indices)
            if data_indices is not None
            else list(range(self.num_encoders))
        )
        queries = [_as_2d(x) for x in inputs]
        if len(queries) != len(indices):
            raise ValueError("inputs and data_indices length mismatch")

        plan = self._plan()
        tasks, statics, inits, true_rows = [], [], [], []
        for q, enc_idx in zip(queries, indices):
            enc = self.encoders[enc_idx]
            q, n_q = self._pad_query(q, plan)
            if plan is not None:
                q = plan.rows(q)
            nbrs, weights, init = enc.transform_graph(
                q, self._data_dev(enc_idx), self.embeds[enc_idx],
                mesh=self.mesh,
            )
            weights = self._mask_padded(weights, n_q)
            task, static = query_task(
                nbrs, weights, batch_size, ref=self.embeds[enc_idx]
            )
            if plan is not None:
                task, init = shard_task(plan, task, init)
            tasks.append(task)
            statics.append(static)
            inits.append(init)
            true_rows.append(n_q)

        if progress_path is not None and not progress_path.endswith(".npz"):
            progress_path = progress_path + ".npz"
        callback = _progress_callback("transform epoch", epochs,
                                      progress_path, verbose)
        start_epoch, snap_inits, init_opt_state = _load_progress(
            progress_path, resume, len(inits), lr, plan)
        if snap_inits is not None:
            inits = snap_inits

        embeds, hist = train_layout(
            inits,
            tasks,
            statics,
            mode="transform",
            epochs=epochs,
            num_rep=num_rep,
            lr=lr,
            alpha=alpha,
            batch_size=batch_size,
            a=self.a,
            b=self.b,
            key=jax.random.PRNGKey(self.seed + 1),
            chunk_callback=callback,
            start_epoch=start_epoch,
            init_opt_state=init_opt_state,
        )
        self.loss_history["transform"] = np.asarray(hist)
        return [e[:n] for e, n in zip(embeds, true_rows)]

    def inverse_transform(
        self,
        inputs,
        epochs: int,
        data_indices: list[int] | None = None,
        num_rep: int = 8,
        lr: float = 0.2,
        alpha: float = 0.5,
        batch_size: int = 512,
        progress_path: str | None = None,
        resume: bool = False,
        verbose: bool = False,
    ) -> list[jax.Array]:
        """Reconstructs original features from latent embeddings.

        Implements the *intended* invert semantics (the reference as
        shipped crashes, SURVEY.md §2.10a): query graphs live in latent
        space with output-curve weights, reconstructions start as
        affinity-weighted averages of training **data** rows and are
        optimized with the inverse attract/repel losses against the
        stored features.

        ``progress_path``/``resume`` snapshot and restore the
        reconstruction optimization exactly as in :meth:`fit`.
        """
        self._require_fitted()
        indices = (
            list(data_indices)
            if data_indices is not None
            else list(range(self.num_encoders))
        )
        queries = [_as_2d(x) for x in inputs]
        if len(queries) != len(indices):
            raise ValueError("inputs and data_indices length mismatch")

        plan = self._plan()
        tasks, statics, inits, true_rows = [], [], [], []
        for z, enc_idx in zip(queries, indices):
            enc = self.encoders[enc_idx]
            z, n_q = self._pad_query(z, plan)
            if plan is not None:
                z = plan.rows(z)
            nbrs, weights, init = enc.invert_graph(
                z,
                self.embeds[enc_idx],
                self._data_dev(enc_idx),
                self.a,
                self.b,
                mesh=self.mesh,
            )
            weights = self._mask_padded(weights, n_q)
            task, static = query_task(
                nbrs,
                weights,
                batch_size,
                ref=self._data_dev(enc_idx),
                sigmas=enc.sigmas,
                rhos=enc.rhos,
            )
            if plan is not None:
                task, init = shard_task(plan, task, init)
            tasks.append(task)
            statics.append(static)
            inits.append(init)
            true_rows.append(n_q)

        if progress_path is not None and not progress_path.endswith(".npz"):
            progress_path = progress_path + ".npz"
        callback = _progress_callback("invert epoch", epochs,
                                      progress_path, verbose)
        start_epoch, snap_inits, init_opt_state = _load_progress(
            progress_path, resume, len(inits), lr, plan)
        if snap_inits is not None:
            inits = snap_inits

        recons, hist = train_layout(
            inits,
            tasks,
            statics,
            mode="invert",
            epochs=epochs,
            num_rep=num_rep,
            lr=lr,
            alpha=alpha,
            batch_size=batch_size,
            a=self.a,
            b=self.b,
            key=jax.random.PRNGKey(self.seed + 2),
            chunk_callback=callback,
            start_epoch=start_epoch,
            init_opt_state=init_opt_state,
        )
        self.loss_history["invert"] = np.asarray(hist)
        return [e[:n] for e, n in zip(recons, true_rows)]

    # ------------------------------------------------------------------
    # Curve fit & persistence
    # ------------------------------------------------------------------

    @staticmethod
    def get_ab_coeffs(min_dist: float, num_iters: int = 50):
        """Gauss-Newton fit of the (a, b) curve (see models/curve.py)."""
        return _get_ab_coeffs(min_dist, num_iters=num_iters)

    def save_state_dict(self, path: str) -> None:
        """Saves the full model state (includes the training dataset,
        graphs, and embeddings, as in reference impl/model.py:653-683)."""
        self._require_fitted()
        ckpt.save_state(
            path,
            {
                "k_neighbors": self.k_neighbors,
                "out_dim": self.out_dim,
                "min_dist": self.min_dist,
                "num_encoders": self.num_encoders,
                "a": self.a,
                "b": self.b,
                "spectral_method": self.spectral_method,
                "knn_engine": self.knn_engine,
                "sigmas": [e.sigmas for e in self.encoders],
                "rhos": [e.rhos for e in self.encoders],
                "data": self.data,
                "graphs": self.graphs,
                "embeds": self.embeds,
            },
        )

    save = save_state_dict

    @classmethod
    def load_state_dict(cls, path: str) -> "MultimodalUMAP":
        """Restores a model saved by :meth:`save_state_dict`."""
        state = ckpt.load_state(path)
        model = cls.__new__(cls)
        model.k_neighbors = state["k_neighbors"]
        model.out_dim = state["out_dim"]
        model.min_dist = state["min_dist"]
        model.num_encoders = state["num_encoders"]
        model.seed = 0
        model.mesh = None
        model.spectral_method = state.get("spectral_method", "auto")
        model.knn_engine = state.get("knn_engine")
        model.a = state["a"]
        model.b = state["b"]
        model.encoders = [
            ModalityEncoder(model.k_neighbors, model.out_dim, id=i,
                            spectral_method=model.spectral_method,
                            knn_engine=model.knn_engine)
            for i in range(model.num_encoders)
        ]
        for enc, sig, rho in zip(model.encoders, state["sigmas"], state["rhos"]):
            enc.sigmas = sig
            enc.rhos = rho
        model.data = state["data"]
        # Inferred, not persisted: the checkpoint stores dtypes exactly,
        # so the tables themselves carry the storage policy.
        model.feature_dtype = (
            "bfloat16"
            if any(d.dtype == jnp.bfloat16 for d in model.data)
            else "float32"
        )
        model.graphs = state["graphs"]
        model.embeds = state["embeds"]
        model.loss_history = {}
        model.timer = PhaseTimer()
        return model

    load = load_state_dict

    def _plan(self) -> ShardingPlan | None:
        return ShardingPlan(self.mesh) if self.mesh is not None else None

    def _pad_query(self, q: jax.Array, plan: ShardingPlan | None):
        """Pads query rows to a mesh-size multiple (mesh runs only).

        ``device_put`` with a row sharding needs divisibility; the
        padded rows are neutralized by :meth:`_mask_padded` and sliced
        off the results, so arbitrary eval sizes work under any mesh.
        Returns (padded array, true row count).
        """
        if plan is None:
            return q, q.shape[0]
        p = int(self.mesh.devices.size)
        n = q.shape[0]
        padded = -(-n // p) * p
        if padded == n:
            return q, n
        return jnp.pad(q, ((0, padded - n), (0, 0))), n

    @staticmethod
    def _mask_padded(weights: jax.Array, n_q: int) -> jax.Array:
        """Zeroes padded rows' edge weights: their Bernoulli keeps then
        never fire, so they contribute neither loss terms nor kept-entry
        counts to the window means (matching the unpadded semantics up
        to window-count rounding)."""
        if weights.shape[0] == n_q:
            return weights
        rows = jnp.arange(weights.shape[0], dtype=jnp.int32)[:, None]
        return jnp.where(rows < n_q, weights, 0.0)

    def _require_fitted(self) -> None:
        if self.data is None or not self.embeds:
            raise RuntimeError("model is not fitted; call fit() first")

    def _offload_features(self) -> None:
        """Moves the feature tables to host past _DATA_OFFLOAD_BYTES.

        Called after the graph phase, whose kNN sweep is the last fit
        consumer of the tables; frees their HBM for the layout epochs.
        Single-device only (mesh runs hold 1/P of each table per chip).

        The move is a ``device_put`` into the device's host memory space
        (``unpinned_host``), which stays server-side: reading a multi-GiB
        table back through the tunneled transfer path takes tens of
        minutes, the in-server copy ~0.25 s/GiB. Falls back to a numpy
        readback where the backend has no host memory space. NOTE: HBM
        is only actually freed once no other live reference pins the
        device buffer -- fit() drops its ``inputs`` argument for this
        reason, and callers at beyond-HBM scale must hand over ownership
        (see tools/run_flickr_scale_e2e.py).
        """
        if self.data is None:
            return
        total = sum(
            x.size * x.dtype.itemsize for x in self.data
            if isinstance(x, jax.Array)
        )
        if total >= _DATA_OFFLOAD_BYTES:
            self.data = [_to_host_memory(x) for x in self.data]
            # The D2H copies are async and PJRT pins the HBM source
            # buffers until they land (~0.25 s/GiB). The layout chunk
            # that follows needs nearly the whole chip (11.85 GiB AOT
            # peak at 1M) -- with a warm compile cache it dispatches
            # within the copy window and the still-resident tables
            # (9.5 GiB bf16 at 1M) overcommit HBM (the round-4 1M
            # first-chunk RESOURCE_EXHAUSTED, 3/3 attempts). Block here:
            # offload runs once per fit, off every hot path.
            jax.block_until_ready(
                [x for x in self.data if isinstance(x, jax.Array)])

    def _data_dev(self, i: int) -> jax.Array:
        """Device copy of feature table ``i``, re-cached on device (the
        inverse of :meth:`_offload_features`; a no-op when resident)."""
        x = _to_default_memory(self.data[i])
        self.data[i] = x
        return x


# Reference-compatible alias (reference impl/model.py:280).
UMAPMixture = MultimodalUMAP
