"""Data-parallel sharding tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_umap_tpu.models.mixture import MultimodalUMAP
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.parallel import ShardingPlan, create_mesh


def test_mesh_has_8_devices():
    mesh = create_mesh()
    assert mesh.devices.size == 8


def test_sharded_knn_matches_single_device(rng):
    x = rng.normal(size=(256, 16)).astype(np.float32)
    d0, i0 = knn(jnp.asarray(x), jnp.asarray(x), 9, exclude_self=True)

    mesh = create_mesh()
    plan = ShardingPlan(mesh)
    xq = plan.rows(jnp.asarray(x))
    xr = plan.replicated(jnp.asarray(x))
    d1, i1 = knn(xq, xr, 9, exclude_self=True)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))


def test_sharded_graph_matches_single_device(blobs):
    """Graph construction (kNN + fuzzy weights + symmetrization) is
    deterministic: sharded placement must give identical edges."""
    from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize

    x0, _, _ = blobs
    x = jnp.asarray(x0)
    d0, i0 = knn(x, x, 8, exclude_self=True)
    w0, r0, s0 = fuzzy_weights(d0)
    g0 = symmetrize(i0, w0)

    plan = ShardingPlan(create_mesh())
    xs = plan.rows(x)
    d1, i1 = knn(xs, plan.replicated(x), 8, exclude_self=True)
    w1, r1, s1 = fuzzy_weights(d1)
    g1 = symmetrize(i1, w1)

    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(w0), np.asarray(w1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g0.weights), np.asarray(g1.weights), rtol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(g0.valid), np.asarray(g1.valid))


def test_sharded_layout_matches_single_device(blobs):
    """From a FIXED init, 30 layout epochs must agree sharded vs single
    (identical program + PRNG draws; only placement differs). Spectral
    init is bypassed: LOBPCG's converged basis has sign/rotation freedom
    that placement can flip, which is irrelevant to layout quality."""
    from multimodal_umap_tpu.models.layout import fit_task, train_layout
    from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize_dense
    from multimodal_umap_tpu.parallel import shard_task

    x0, x1, _ = blobs
    key = jax.random.PRNGKey(5)
    inits, tasks, statics = [], [], []
    for arr in (x0, x1):
        x = jnp.asarray(arr)
        d, i = knn(x, x, 8, exclude_self=True)
        w, _, _ = fuzzy_weights(d)
        key, sub = jax.random.split(key)
        inits.append(jax.random.normal(sub, (x.shape[0], 4)) * 0.1)
        t, s = fit_task(symmetrize_dense(i, w), 64)
        tasks.append(t)
        statics.append(s)

    kwargs = dict(mode="fit", epochs=30, num_rep=2, lr=0.05, alpha=0.5,
                  batch_size=64, a=1.577, b=0.8951,
                  key=jax.random.PRNGKey(0))
    single, hist_single = train_layout(inits, tasks, statics, **kwargs)

    plan = ShardingPlan(create_mesh())
    sharded_pairs = [shard_task(plan, t, e) for t, e in zip(tasks, inits)]
    sh_tasks = [p[0] for p in sharded_pairs]
    sh_inits = [p[1] for p in sharded_pairs]
    sharded, hist_sharded = train_layout(sh_inits, sh_tasks, statics,
                                         **kwargs)

    for e_s, e_m in zip(single, sharded):
        np.testing.assert_allclose(
            np.asarray(e_s), np.asarray(e_m), rtol=2e-3, atol=2e-4
        )
    np.testing.assert_allclose(
        np.asarray(hist_single), np.asarray(hist_sharded), rtol=2e-3
    )


def test_sharded_spectral_low_energy(blobs):
    """Sharded LOBPCG returns low-Laplacian-energy directions.

    With clustered data the bottom eigenspace is near-degenerate, so
    vector-wise comparison to dense eigh is ill-posed; the meaningful
    property is that every returned direction has Rayleigh quotient at
    most the dense (out_dim+1)-th eigenvalue (up to tolerance)."""
    from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize, to_dense
    from multimodal_umap_tpu.ops.spectral import spectral_embedding

    x0, _, _ = blobs
    x = jnp.asarray(x0)
    d, i = knn(x, x, 8, exclude_self=True)
    w, _, _ = fuzzy_weights(d)
    g = symmetrize(i, w)

    adj = np.asarray(to_dense(g))
    deg = np.maximum(adj.sum(1), 1e-6) ** -0.5
    n = adj.shape[0]
    lap = np.eye(n) * (1 + 1e-6) - deg[:, None] * adj * deg[None, :]
    evals = np.linalg.eigvalsh(lap)

    plan = ShardingPlan(create_mesh())
    g_sh = g.replace(
        rows=plan.rows(g.rows), cols=plan.rows(g.cols),
        weights=plan.rows(g.weights), valid=plan.rows(g.valid),
    )
    lob = np.asarray(spectral_embedding(g_sh, 4, method="lobpcg",
                                        max_iters=300))
    q, _ = np.linalg.qr(lob)
    rayleigh = np.sort(np.diag(q.T @ lap @ q))
    # Each returned direction is low-energy: within the bottom band.
    assert np.all(rayleigh <= evals[4] + 0.1), (rayleigh, evals[:6])


def test_sharded_embeds_are_row_sharded(blobs):
    x0, x1, _ = blobs
    mesh = create_mesh()
    model = MultimodalUMAP(8, 4, 0.1, num_encoders=2, mesh=mesh)
    model.fit([x0, x1], epochs=5, num_rep=2, lr=0.05, batch_size=64)
    sharding = model.embeds[0].sharding
    assert not sharding.is_fully_replicated
    assert len(model.embeds[0].addressable_shards) == 8


def test_sharded_transform_and_invert(blobs):
    """Transform/invert run sharded end-to-end and match the unsharded
    model's quality (same program, placement only)."""
    x0, x1, _ = blobs
    mesh = create_mesh()
    model = MultimodalUMAP(8, 4, 0.1, num_encoders=2, mesh=mesh)
    model.fit([x0, x1], epochs=20, num_rep=2, lr=0.05, batch_size=64)
    out = model.transform([x0[:32]], epochs=5, data_indices=[0],
                          num_rep=2, lr=0.05, batch_size=64)
    assert np.asarray(out[0]).shape == (32, 4)
    assert np.all(np.isfinite(np.asarray(out[0])))
    recon = model.inverse_transform([out[0]], epochs=5, data_indices=[0],
                                    num_rep=2, lr=0.05, batch_size=64)
    assert np.asarray(recon[0]).shape == (32, x0.shape[1])
    assert np.all(np.isfinite(np.asarray(recon[0])))


def test_resume_with_mesh_keeps_row_sharding(blobs, tmp_path):
    """Snapshot-resumed embeddings must be re-sharded over the mesh
    (ADVICE: plain loaded arrays skipped train_layout's sharding pin,
    silently dropping data parallelism on resume)."""
    import os

    x0, x1, _ = blobs
    kwargs = dict(num_rep=2, lr=0.05, alpha=0.5, batch_size=64)
    snap = os.path.join(tmp_path, "mesh_snap.npz")
    mesh = create_mesh()

    part = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=7, mesh=mesh)
    part.fit([x0, x1], epochs=20, progress_path=snap, **kwargs)

    resumed = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=7, mesh=mesh)
    resumed.fit([x0, x1], epochs=40, progress_path=snap, resume=True,
                **kwargs)
    assert not resumed.embeds[0].sharding.is_fully_replicated
    assert len(resumed.embeds[0].addressable_shards) == 8

    full = MultimodalUMAP(8, 4, 0.1, num_encoders=2, seed=7, mesh=mesh)
    full.fit([x0, x1], epochs=40, **kwargs)
    np.testing.assert_allclose(
        np.asarray(resumed.embeds[0]), np.asarray(full.embeds[0]),
        rtol=2e-4, atol=2e-5,
    )


def test_mesh_fit_graph_rides_ring_and_matches_single_device(rng):
    """VERDICT r2 next-step 1 gate: under a mesh, fit_graph routes kNN
    through the ppermute ring (no replicated feature table) and yields
    the same graph as the single-device engine at N >= 1k."""
    from multimodal_umap_tpu.models.encoder import ModalityEncoder, _ring_ok

    n = 1024
    x = rng.normal(size=(n, 24)).astype(np.float32)
    x = jnp.asarray(x)

    enc_single = ModalityEncoder(10, 4)
    g0, dense0, _ = enc_single.fit_graph(x)

    mesh = create_mesh()
    assert _ring_ok(mesh, n)
    enc_mesh = ModalityEncoder(10, 4)
    g1, dense1, _ = enc_mesh.fit_graph(x, mesh=mesh)

    # Id equality up to f32 rounding-order ties: the ring and the
    # single-device panel sum distances in different orders, so two
    # references that are equidistant-within-rounding at the k-th
    # boundary can legitimately swap (observed: 4/10240 ids on some
    # draws). Any id that differs must be such a tie -- its true
    # (float64) distance must match the replaced neighbor's.
    n0 = np.asarray(dense0.nbrs)
    n1 = np.asarray(dense1.nbrs)
    xs = np.asarray(x, dtype=np.float64)
    mism = n0 != n1
    assert mism.mean() < 1e-3, f"{mism.sum()} ids differ"
    for r, c in zip(*np.nonzero(mism)):
        d_a = np.linalg.norm(xs[n0[r, c]] - xs[r])
        d_b = np.linalg.norm(xs[n1[r, c]] - xs[r])
        assert abs(d_a - d_b) <= 1e-5 * (1.0 + d_a), (r, c, d_a, d_b)
    np.testing.assert_allclose(np.asarray(dense0.weights),
                               np.asarray(dense1.weights),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(enc_single.sigmas),
                               np.asarray(enc_mesh.sigmas),
                               rtol=1e-4, atol=1e-5)
    # Graph arrays stay row-sharded over the mesh.
    assert not dense1.nbrs.sharding.is_fully_replicated


def test_mesh_transform_invert_with_indivisible_queries(blobs):
    """Query counts that do not divide the mesh size are padded, the
    padded rows' weights zeroed, and results sliced back -- arbitrary
    eval sizes work under any mesh (regression: device_put used to
    reject Q=20 on an 8-mesh, crashing the CLI's default-mesh eval)."""
    x0, x1, _ = blobs
    mesh = create_mesh()
    model = MultimodalUMAP(8, 4, 0.1, num_encoders=2, mesh=mesh)
    model.fit([x0[:160], x1[:160]], epochs=40, num_rep=4, lr=0.05,
              alpha=0.5, batch_size=64)

    q = x0[160:180]  # 20 rows: not divisible by 8
    emb = model.transform([q], epochs=20, data_indices=[0], num_rep=4,
                          lr=0.05, batch_size=64)
    assert emb[0].shape == (20, 4)
    assert np.all(np.isfinite(np.asarray(emb[0])))

    rec = model.inverse_transform([emb[0]], epochs=20, data_indices=[1],
                                  num_rep=4, lr=0.05, batch_size=64)
    assert rec[0].shape == (20, x1.shape[1])
    assert np.all(np.isfinite(np.asarray(rec[0])))

    # The (deterministic) query graph must match the single-device one.
    from multimodal_umap_tpu.models.encoder import ModalityEncoder

    enc_s = ModalityEncoder(8, 4)
    nbrs_s, w_s, _ = enc_s.transform_graph(
        jnp.asarray(q), jnp.asarray(x0[:160]), model.embeds[0]
    )
    q_pad, n_q = model._pad_query(jnp.asarray(q), model._plan())
    nbrs_m, w_m, _ = model.encoders[0].transform_graph(
        model._plan().rows(q_pad), jnp.asarray(x0[:160]),
        model.embeds[0], mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(nbrs_m)[:n_q],
                                  np.asarray(nbrs_s))
    np.testing.assert_allclose(np.asarray(w_m)[:n_q], np.asarray(w_s),
                               rtol=1e-4, atol=1e-5)


def test_ring_ok_guardrails():
    from multimodal_umap_tpu.models.encoder import _ring_ok

    mesh = create_mesh()
    assert _ring_ok(mesh, 64)
    assert not _ring_ok(mesh, 63)   # indivisible -> replicated fallback
    assert not _ring_ok(None, 64)   # no mesh


def test_mesh_fit_with_bf16_features(blobs):
    """Mesh sharding x bf16 feature storage -- the exact configuration
    a multi-chip beyond-HBM run uses (ring kNN keeps bf16 on the wire,
    knn_stream.py _stored): tables stay bf16 AND row-sharded, the full
    lifecycle stays finite, and layout quality holds."""
    x0, x1, labels = blobs
    mesh = create_mesh()
    model = MultimodalUMAP(8, 4, 0.1, num_encoders=2, mesh=mesh,
                           feature_dtype="bfloat16")
    model.fit([x0, x1], epochs=30, num_rep=2, lr=0.05, alpha=0.5,
              batch_size=64)
    for d in model.data:
        assert d.dtype == jnp.bfloat16
        assert not d.sharding.is_fully_replicated
    assert model.embeds[0].dtype == jnp.float32
    assert not model.embeds[0].sharding.is_fully_replicated
    assert np.all(np.isfinite(model.loss_history["fit"]))

    emb = np.asarray(model.embeds[0])
    d = np.linalg.norm(emb[:, None] - emb[None, :], axis=2)
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(labels), dtype=bool)
    assert d[same & off_diag].mean() < 0.7 * d[~same].mean()

    out = model.transform([x0[:16]], epochs=5, data_indices=[0],
                          num_rep=2, lr=0.05, batch_size=64)
    assert np.all(np.isfinite(np.asarray(out[0])))
    rec = model.inverse_transform([out[0]], epochs=5, data_indices=[0],
                                  num_rep=2, lr=0.05, batch_size=64)
    assert rec[0].shape == (16, x0.shape[1])
    assert np.all(np.isfinite(np.asarray(rec[0])))
