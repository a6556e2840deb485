"""Scale-out kNN engines vs the exact default engine.

knn_streamed (column-blocked single device) and knn_ring (reference
table ring-sharded over the mesh, no replication) must agree with the
full-width exact engine bit-for-bit on ids and to fp tolerance on
distances (SURVEY.md §5.7 design; VERDICT round 1 task 7).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.knn_stream import (
    knn_ring,
    knn_streamed,
    pad_rows_to_multiple,
)
from multimodal_umap_tpu.parallel import create_mesh

pytestmark = pytest.mark.fast


def test_streamed_matches_exact_self_graph(rng):
    x = jnp.asarray(rng.normal(size=(263, 12)).astype(np.float32))
    d0, i0 = knn(x, x, 7, exclude_self=True)
    d1, i1 = knn_streamed(x, x, 7, exclude_self=True,
                          row_block=64, col_block=48)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_streamed_matches_exact_query_mode(rng):
    r = jnp.asarray(rng.normal(size=(190, 9)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(45, 9)).astype(np.float32))
    d0, i0 = knn(q, r, 6)
    d1, i1 = knn_streamed(q, r, 6, row_block=16, col_block=37)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_streamed_k_larger_than_col_block(rng):
    """k exceeding a single column block forces multi-block merging."""
    x = jnp.asarray(rng.normal(size=(96, 5)).astype(np.float32))
    d0, i0 = knn(x, x, 11, exclude_self=True)
    d1, i1 = knn_streamed(x, x, 11, exclude_self=True,
                          row_block=32, col_block=8)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_ring_matches_exact_self_graph(rng):
    mesh = create_mesh()
    x = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    d0, i0 = knn(x, x, 9, exclude_self=True)
    d1, i1 = knn_ring(x, x, 9, mesh, exclude_self=True)
    assert not d1.sharding.is_fully_replicated  # stays row-sharded
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_ring_matches_exact_query_mode(rng):
    mesh = create_mesh()
    r = jnp.asarray(rng.normal(size=(320, 8)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(64, 8)).astype(np.float32))
    d0, i0 = knn(q, r, 5)
    d1, i1 = knn_ring(q, r, 5, mesh)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_ring_rejects_indivisible_rows(rng):
    import pytest

    mesh = create_mesh()
    x = jnp.asarray(rng.normal(size=(100, 4)).astype(np.float32))
    with pytest.raises(ValueError, match="divisible"):
        knn_ring(x, x, 3, mesh)


def test_pad_rows_to_multiple(rng):
    x = rng.normal(size=(100, 4)).astype(np.float32)
    padded, n = pad_rows_to_multiple(x, 8)
    assert padded.shape == (104, 4) and n == 100
    same, n2 = pad_rows_to_multiple(x[:96], 8)
    assert same.shape == (96, 4) and n2 == 96


def test_streamed_bf16_matches_exact(rng):
    """bf16 sweep carries a widened candidate set and re-scores exactly
    at the end: ids and distances match the f32 engine."""
    x = jnp.asarray(rng.normal(size=(263, 12)).astype(np.float32))
    d0, i0 = knn(x, x, 7, exclude_self=True)
    d1, i1 = knn_streamed(x, x, 7, exclude_self=True,
                          row_block=64, col_block=48, bf16=True)
    np.testing.assert_array_equal(np.sort(np.asarray(i0), 1),
                                  np.sort(np.asarray(i1), 1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-4, atol=1e-5)


def test_ring_bf16_matches_exact(rng):
    """Ring with bf16 panels + per-step local re-score: exact results,
    no replicated table (VERDICT r2 next-steps 1+2)."""
    mesh = create_mesh()
    x = jnp.asarray(rng.normal(size=(256, 16)).astype(np.float32))
    d0, i0 = knn(x, x, 9, exclude_self=True)
    d1, i1 = knn_ring(x, x, 9, mesh, exclude_self=True, bf16=True)
    assert not d1.sharding.is_fully_replicated
    np.testing.assert_array_equal(np.sort(np.asarray(i0), 1),
                                  np.sort(np.asarray(i1), 1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-4, atol=1e-5)


def test_ring_padded_references_masked(rng):
    """Padded reference rows (num_valid_cols) never appear as
    neighbors; padded query rows are sliced off by the caller."""
    mesh = create_mesh()
    r_np = rng.normal(size=(100, 6)).astype(np.float32)
    q_np = rng.normal(size=(37, 6)).astype(np.float32)
    r_pad, n_r = pad_rows_to_multiple(r_np, 8)
    q_pad, n_q = pad_rows_to_multiple(q_np, 8)
    d1, i1 = knn_ring(q_pad, r_pad, 5, mesh, num_valid_cols=n_r,
                      bf16=True)
    d0, i0 = knn(jnp.asarray(q_np), jnp.asarray(r_np), 5)
    assert np.all(np.asarray(i1[:n_q]) < n_r)
    np.testing.assert_array_equal(np.sort(np.asarray(i1[:n_q]), 1),
                                  np.sort(np.asarray(i0), 1))
    np.testing.assert_allclose(np.asarray(d1[:n_q]), np.asarray(d0),
                               rtol=1e-4, atol=1e-5)


def test_streamed_dispatch_budget_chunking(rng, monkeypatch):
    """Past MMUMAP_KNN_DISPATCH_FLOPS the query axis chunks at the host
    level (one synced dispatch per chunk; the tunneled worker dies
    under multi-minute single dispatches) -- results must be identical,
    including exclude-self masking with non-zero chunk row offsets."""
    x = jnp.asarray(rng.normal(size=(263, 12)).astype(np.float32))
    d0, i0 = knn_streamed(x, x, 7, exclude_self=True,
                          row_block=64, col_block=48)
    # 2 * 263 * 263 * 12 ~ 1.66e6 flops; budget forces ~4+ chunks.
    monkeypatch.setenv("MMUMAP_KNN_DISPATCH_FLOPS", "4e5")
    d1, i1 = knn_streamed(x, x, 7, exclude_self=True,
                          row_block=64, col_block=48)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_streamed_dispatch_budget_query_mode_ragged(rng, monkeypatch):
    """Chunked query mode with a query count that is not a multiple of
    the chunk size (exercises the pad + slice-back path)."""
    r = jnp.asarray(rng.normal(size=(190, 9)).astype(np.float32))
    q = jnp.asarray(rng.normal(size=(157, 9)).astype(np.float32))
    d0, i0 = knn_streamed(q, r, 6, row_block=16, col_block=37)
    monkeypatch.setenv("MMUMAP_KNN_DISPATCH_FLOPS", "2e5")
    d1, i1 = knn_streamed(q, r, 6, row_block=16, col_block=37)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)


def test_fit_graph_budget_path_matches_fused(rng, monkeypatch):
    """encoder.fit_graph past the dispatch budget routes through the
    eager chunked kNN + _fit_graph_post; the graph must match the fused
    single-program path."""
    from multimodal_umap_tpu.models.encoder import ModalityEncoder

    x = jnp.asarray(rng.normal(size=(128, 10)).astype(np.float32))
    enc0 = ModalityEncoder(k_neighbors=5, out_dim=4)
    g0, dense0, _ = enc0.fit_graph(x)
    monkeypatch.setenv("MMUMAP_KNN_DISPATCH_FLOPS", "1e4")
    enc1 = ModalityEncoder(k_neighbors=5, out_dim=4)
    g1, dense1, _ = enc1.fit_graph(x)
    np.testing.assert_array_equal(np.asarray(dense0.nbrs),
                                  np.asarray(dense1.nbrs))
    np.testing.assert_allclose(np.asarray(dense0.weights),
                               np.asarray(dense1.weights),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(g0.rows), np.asarray(g1.rows))
    np.testing.assert_allclose(np.asarray(enc0.sigmas),
                               np.asarray(enc1.sigmas),
                               rtol=1e-5, atol=1e-6)


def test_ring_preserves_bf16_storage(rng):
    """knn_ring must not upcast bf16-stored tables (that would
    materialize the 2x f32 copy feature_dtype exists to avoid); results
    still match the f32 engine after exact re-scoring."""
    import jax

    from multimodal_umap_tpu.ops.knn_stream import knn_ring

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:4]), ("data",))
    x32 = rng.normal(size=(64, 12)).astype(np.float32)
    x16 = jnp.asarray(x32, dtype=jnp.bfloat16)
    d0, i0 = knn_streamed(jnp.asarray(np.asarray(x16, dtype=np.float32)),
                          jnp.asarray(np.asarray(x16, dtype=np.float32)),
                          5, exclude_self=True)
    d1, i1 = knn_ring(x16, x16, 5, mesh, exclude_self=True)
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-3, atol=1e-3)


def test_streamed_dispatch_budget_chunking_bf16(rng, monkeypatch):
    """Chunked sweep with bf16 ranking: the chunk loop passes the true
    reference count into the fused program as a STATIC argument -- as a
    traced value it reached _candidate_width's Python min() and crashed
    every over-budget bf16 run (the default TPU engine at scale)."""
    x = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    d0, i0 = knn_streamed(x, x, 7, exclude_self=True,
                          row_block=64, col_block=64, bf16=False)
    monkeypatch.setenv("MMUMAP_KNN_DISPATCH_FLOPS", "4e5")
    d1, i1 = knn_streamed(x, x, 7, exclude_self=True,
                          row_block=64, col_block=64, bf16=True)
    # bf16 ranks a widened candidate set, then re-scores exactly: ids
    # must match the f32 sweep and distances are exact to f32 rounding.
    np.testing.assert_array_equal(np.sort(np.asarray(i0), axis=1),
                                  np.sort(np.asarray(i1), axis=1))
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1),
                               rtol=1e-5, atol=1e-5)
