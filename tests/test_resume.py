"""Preemption recovery: chunked progress snapshots + exact resume."""

import os

import numpy as np

from multimodal_umap_tpu.models.mixture import MultimodalUMAP


def test_fit_resume_matches_uninterrupted(blobs, tmp_path):
    """A run snapshotted at a chunk boundary and resumed must reproduce
    the uninterrupted run exactly (same PRNG stream, same Adam state)."""
    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)

    full = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=9)
    full.fit([x0, x1], epochs=40, **kwargs)

    snap = os.path.join(tmp_path, "progress.npz")
    # "Preempted" run: train_layout chunks at 100 epochs by default, so
    # force small chunks by running the first 20 epochs as its own fit
    # with a snapshot at the end (epoch_chunk == epochs => one chunk).
    part = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=9)
    part.fit([x0, x1], epochs=20, progress_path=snap, **kwargs)
    assert os.path.exists(snap)
    assert int(np.load(snap)["epoch"]) == 20

    # Resume to 40 total epochs from the snapshot.
    resumed = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=9)
    resumed.fit([x0, x1], epochs=40, progress_path=snap, resume=True,
                **kwargs)
    assert len(resumed.loss_history["fit"]) == 20  # epochs 20..40 only

    np.testing.assert_allclose(
        np.asarray(resumed.embeds[0]), np.asarray(full.embeds[0]),
        rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(resumed.embeds[1]), np.asarray(full.embeds[1]),
        rtol=2e-4, atol=2e-5,
    )


def test_resume_at_final_epoch_returns_snapshot(blobs, tmp_path):
    """Resuming a snapshot that already recorded the final epoch must
    return the snapshotted embeddings with an empty loss history, not
    crash (ADVICE: history[0] IndexError when start_epoch >= epochs)."""
    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)
    snap = os.path.join(tmp_path, "final.npz")

    done = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=3)
    done.fit([x0, x1], epochs=20, progress_path=snap, **kwargs)
    assert int(np.load(snap)["epoch"]) == 20

    resumed = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=3)
    resumed.fit([x0, x1], epochs=20, progress_path=snap, resume=True,
                **kwargs)
    assert len(resumed.loss_history["fit"]) == 0
    np.testing.assert_allclose(
        np.asarray(resumed.embeds[0]), np.asarray(done.embeds[0]),
        rtol=1e-6,
    )


def test_progress_path_without_npz_extension(blobs, tmp_path):
    """np.savez appends '.npz'; save and resume must agree on the path
    (ADVICE: a snapshot at 'snap' landed at 'snap.npz' and resume
    silently restarted from epoch 0)."""
    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)
    snap = os.path.join(tmp_path, "snap")  # no extension

    part = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    part.fit([x0, x1], epochs=20, progress_path=snap, **kwargs)
    assert os.path.exists(snap + ".npz")

    resumed = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    resumed.fit([x0, x1], epochs=40, progress_path=snap, resume=True,
                **kwargs)
    # Resume actually found the snapshot: only epochs 20..40 recorded.
    assert len(resumed.loss_history["fit"]) == 20

    full = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    full.fit([x0, x1], epochs=40, **kwargs)
    np.testing.assert_allclose(
        np.asarray(resumed.embeds[0]), np.asarray(full.embeds[0]),
        rtol=2e-4, atol=2e-5,
    )


def test_transform_and_invert_resume_match_uninterrupted(blobs, tmp_path):
    """transform/inverse_transform carry the same snapshot/resume
    machinery as fit (VERDICT r2 weak #6): a preempted eval loses at
    most one epoch chunk. The query graph rebuild is deterministic, so
    resumed runs must reproduce the uninterrupted ones exactly."""
    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, batch_size=64)

    model = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=11)
    model.fit([x0, x1], epochs=30, alpha=0.5, **kwargs)
    q = x0[:32]

    full = model.transform([q], epochs=40, data_indices=[0], **kwargs)

    snap = os.path.join(tmp_path, "t_progress.npz")
    model.transform([q], epochs=20, data_indices=[0],
                    progress_path=snap, **kwargs)
    assert int(np.load(snap)["epoch"]) == 20
    resumed = model.transform([q], epochs=40, data_indices=[0],
                              progress_path=snap, resume=True, **kwargs)
    assert len(model.loss_history["transform"]) == 20
    np.testing.assert_allclose(np.asarray(resumed[0]),
                               np.asarray(full[0]),
                               rtol=2e-4, atol=2e-5)

    # Invert: same contract in data space.
    z = full[0]
    inv_full = model.inverse_transform([z], epochs=40, data_indices=[0],
                                       **kwargs)
    snap_i = os.path.join(tmp_path, "i_progress.npz")
    model.inverse_transform([z], epochs=20, data_indices=[0],
                            progress_path=snap_i, **kwargs)
    inv_resumed = model.inverse_transform(
        [z], epochs=40, data_indices=[0],
        progress_path=snap_i, resume=True, **kwargs)
    np.testing.assert_allclose(np.asarray(inv_resumed[0]),
                               np.asarray(inv_full[0]),
                               rtol=2e-4, atol=2e-5)


def test_graph_cache_roundtrip_matches_fresh(blobs, tmp_path):
    """fit(graph_cache_path=...) must write a snapshot of the graph
    stage on the first run and reproduce the no-cache fit exactly when
    a rerun loads it (same graphs, sigma/rho, spectral init => same
    layout PRNG stream => identical embeddings)."""
    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)
    cache = os.path.join(tmp_path, "graphs.npz")

    fresh = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    fresh.fit([x0, x1], epochs=20, **kwargs)

    first = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    first.fit([x0, x1], epochs=20, graph_cache_path=cache, **kwargs)
    assert os.path.exists(cache)

    second = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    second.fit([x0, x1], epochs=20, graph_cache_path=cache, **kwargs)
    # The cached rerun skipped the graph phase entirely.
    assert "fit/graph_0" not in second.timer.report()

    for m in range(2):
        np.testing.assert_allclose(
            np.asarray(second.embeds[m]), np.asarray(fresh.embeds[m]),
            rtol=2e-4, atol=2e-5)
        np.testing.assert_array_equal(
            np.asarray(second.graphs[m].rows),
            np.asarray(first.graphs[m].rows))
        np.testing.assert_allclose(
            np.asarray(second.encoders[m].sigmas),
            np.asarray(first.encoders[m].sigmas), rtol=1e-6)


def test_graph_cache_rejects_mismatched_data(blobs, tmp_path):
    """A cache written for other features/hyperparameters must be
    ignored (rebuilt + overwritten), never silently loaded."""
    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)
    cache = os.path.join(tmp_path, "graphs.npz")

    a = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    a.fit([x0, x1], epochs=5, graph_cache_path=cache, **kwargs)

    # Different features: row 0 perturbed => fingerprint mismatch.
    y0 = np.array(x0).copy()
    y0[0] += 1.0
    b = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    b.fit([y0, x1], epochs=5, graph_cache_path=cache, **kwargs)
    assert "fit/graph_0" in b.timer.report()  # rebuilt, not loaded

    # And the overwritten cache now serves the new data.
    c = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5)
    c.fit([y0, x1], epochs=5, graph_cache_path=cache, **kwargs)
    assert "fit/graph_0" not in c.timer.report()
    np.testing.assert_allclose(
        np.asarray(c.embeds[0]), np.asarray(b.embeds[0]),
        rtol=2e-4, atol=2e-5)


def test_adaptive_epoch_chunk_bounds():
    """Chunks shrink with N (one chunk = one dispatch; the tunneled
    worker dies under long dispatches), dropping harder past the
    modality-remat threshold where the epoch itself is ~3-5x the
    small-N extrapolation (a 30-epoch 524k dispatch measured as a
    reproducible worker fault, round 4)."""
    from multimodal_umap_tpu.models.layout import default_epoch_chunk

    assert default_epoch_chunk(160) == 100
    assert default_epoch_chunk(31744) == 100
    assert default_epoch_chunk(262144) == 61
    assert default_epoch_chunk(524288) == 6
    assert default_epoch_chunk(1048576) == 1  # one epoch's temps + the
    # scan's double-buffered next iteration is all that fits at 1M
    assert default_epoch_chunk(10_000_000) == 1


def test_snapshot_throttle_and_final_save(blobs, tmp_path, monkeypatch):
    """With a huge snapshot interval and forced small epoch chunks,
    intermediate boundaries skip the (expensive) serialization but the
    final chunk ALWAYS saves -- and the saved snapshot resumes."""
    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)
    snap = os.path.join(tmp_path, "throttled.npz")
    monkeypatch.setenv("MMUMAP_EPOCH_CHUNK", "5")
    monkeypatch.setenv("MMUMAP_SNAPSHOT_INTERVAL_S", "1e9")

    m = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=7)
    m.fit([x0, x1], epochs=20, progress_path=snap, **kwargs)
    # Only the first boundary (cold timer) and the final one wrote;
    # what is on disk must be the FINAL epoch, not an intermediate.
    assert int(np.load(snap)["epoch"]) == 20

    resumed = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=7)
    resumed.fit([x0, x1], epochs=20, progress_path=snap, resume=True,
                **kwargs)
    assert len(resumed.loss_history["fit"]) == 0
    np.testing.assert_allclose(
        np.asarray(resumed.embeds[0]), np.asarray(m.embeds[0]),
        rtol=1e-6)


def test_beyond_scale_control_flow_composes(blobs, tmp_path, monkeypatch):
    """The 1M-configuration control flow -- host-chunked kNN sweep,
    per-round host-loop spectral, small epoch chunks, graph cache +
    progress snapshots -- must compose: identical graph (the kNN and
    sigma paths differ only in fp fusion rounding), and a layout of the
    same quality. Element-wise embedding equality is NOT expected: the
    ~1e-5 weight rounding between the fused and eager graph tails is
    enough to rotate near-degenerate spectral eigenvectors."""
    from multimodal_umap_tpu.eval.trustworthiness import (
        trustworthiness_sampled,
    )

    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)

    ref = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=11)
    ref.fit([x0, x1], epochs=60, **kwargs)

    monkeypatch.setenv("MMUMAP_SPECTRAL_HOSTLOOP_N", "1")
    monkeypatch.setenv("MMUMAP_KNN_DISPATCH_FLOPS", "1e4")
    monkeypatch.setenv("MMUMAP_EPOCH_CHUNK", "5")
    sim = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=11)
    sim.fit([x0, x1], epochs=60,
            graph_cache_path=os.path.join(tmp_path, "g.npz"),
            progress_path=os.path.join(tmp_path, "p.npz"), **kwargs)

    for m in range(2):
        np.testing.assert_array_equal(
            np.asarray(sim.graphs[m].rows), np.asarray(ref.graphs[m].rows))
        np.testing.assert_allclose(
            np.asarray(sim.graphs[m].weights),
            np.asarray(ref.graphs[m].weights), rtol=1e-3, atol=1e-4)
        t_ref = trustworthiness_sampled(ref.data[m], ref.embeds[m], k=8)
        t_sim = trustworthiness_sampled(sim.data[m], sim.embeds[m], k=8)
        assert t_sim >= t_ref - 0.02, (m, t_sim, t_ref)
    loss_ref = float(ref.loss_history["fit"][-1])
    loss_sim = float(sim.loss_history["fit"][-1])
    assert abs(loss_sim - loss_ref) <= 0.1 * abs(loss_ref), (
        loss_sim, loss_ref)


def test_graph_cache_rejects_mismatched_spectral_method(blobs, tmp_path):
    """The cached init_* arrays are one spectral method's output; a run
    requesting a different method must rebuild, not silently reuse the
    old subspace (--spectral lobpcg after a chebyshev-cached run)."""
    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)
    cache = os.path.join(tmp_path, "graphs.npz")

    a = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5,
                       spectral_method="auto")
    a.fit([x0, x1], epochs=5, graph_cache_path=cache, **kwargs)

    b = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5,
                       spectral_method="dense")
    b.fit([x0, x1], epochs=5, graph_cache_path=cache, **kwargs)
    assert "fit/graph_0" in b.timer.report()  # rebuilt, not loaded

    c = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5,
                       spectral_method="dense")
    c.fit([x0, x1], epochs=5, graph_cache_path=cache, **kwargs)
    assert "fit/graph_0" not in c.timer.report()  # rewritten cache hits


def test_graph_cache_under_mesh_skips_graph_phase(blobs, tmp_path):
    """VERDICT r3 item 5: a mesh fit with a warm graph cache must skip
    the kNN sweep + spectral filter (the expensive, crash-exposed
    dispatches a mesh retry used to re-pay) and reproduce the built
    run's embeddings, keeping the row sharding."""
    from multimodal_umap_tpu.parallel.mesh import create_mesh

    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)
    cache = os.path.join(tmp_path, "graphs.npz")
    mesh = create_mesh(8)

    first = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5, mesh=mesh)
    first.fit([x0, x1], epochs=20, graph_cache_path=cache, **kwargs)
    assert os.path.exists(cache)
    assert "fit/graph_0" in first.timer.report()

    second = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=5, mesh=mesh)
    second.fit([x0, x1], epochs=20, graph_cache_path=cache, **kwargs)
    # The cached mesh rerun skipped the graph phase entirely.
    assert "fit/graph_0" not in second.timer.report()

    for m in range(2):
        np.testing.assert_allclose(
            np.asarray(second.embeds[m]), np.asarray(first.embeds[m]),
            rtol=2e-4, atol=2e-5)
    # Embeddings stay sharded over the full mesh after a cache load.
    assert len(second.embeds[0].sharding.device_set) == 8
    # And the query paths (which consume enc.sigmas/rhos) still run.
    z = second.transform([x0[:16]], epochs=5, data_indices=[0],
                         batch_size=16)
    assert np.isfinite(np.asarray(z[0])).all()
