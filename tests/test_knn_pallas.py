"""Pallas fused kNN kernel vs the XLA path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.knn_pallas import knn_pallas


def _compare(q, r, k, exclude_self):
    d_ref, i_ref = knn(jnp.asarray(q), jnp.asarray(r), k,
                       exclude_self=exclude_self)
    d_pl, i_pl = knn_pallas(
        jnp.asarray(q), jnp.asarray(r), k, exclude_self=exclude_self,
        tile_r=8, tile_c=128, tile_d=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=2e-4, atol=2e-4)
    # id sets must agree row-wise (ties may reorder within equal dists)
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_pl), axis=1), np.sort(np.asarray(i_ref), axis=1)
    )


def test_pallas_knn_self_graph(rng):
    x = rng.normal(size=(40, 24)).astype(np.float32)
    _compare(x, x, 5, exclude_self=True)


def test_pallas_knn_query_mode(rng):
    r = rng.normal(size=(200, 16)).astype(np.float32)
    q = rng.normal(size=(24, 16)).astype(np.float32)
    _compare(q, r, 7, exclude_self=False)


def test_pallas_knn_unaligned_shapes(rng):
    """Q, N, D all non-multiples of the tile sizes (padding paths)."""
    r = rng.normal(size=(187, 33)).astype(np.float32)
    q = rng.normal(size=(19, 33)).astype(np.float32)
    _compare(q, r, 4, exclude_self=False)


def test_pallas_bf16_self_graph_matches_exact(rng):
    """bf16 kernel + exact f32 re-score: ids match the exact engine and
    distances are exact f32 (rescored), on well-separated data."""
    x = (rng.normal(size=(60, 24)) * 4.0).astype(np.float32)
    d_ref, i_ref = knn(jnp.asarray(x), jnp.asarray(x), 5, exclude_self=True)
    d_pl, i_pl = knn_pallas(
        jnp.asarray(x), jnp.asarray(x), 5, exclude_self=True,
        tile_r=8, tile_c=128, tile_d=128, interpret=True, bf16=True,
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_pl), 1), np.sort(np.asarray(i_ref), 1)
    )
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(i_pl) != np.arange(60)[:, None])


def test_pallas_bf16_query_mode_padded(rng):
    """Unaligned shapes in bf16 mode: padded columns and the +inf
    extraction path never surface as candidates after the re-score."""
    r = rng.normal(size=(150, 17)).astype(np.float32)
    q = rng.normal(size=(21, 17)).astype(np.float32)
    d_ref, i_ref = knn(jnp.asarray(q), jnp.asarray(r), 6)
    d_pl, i_pl = knn_pallas(
        jnp.asarray(q), jnp.asarray(r), 6, tile_r=8, tile_c=128,
        tile_d=128, interpret=True, bf16=True,
    )
    assert np.all(np.asarray(i_pl) < 150)
    np.testing.assert_array_equal(
        np.sort(np.asarray(i_pl), 1), np.sort(np.asarray(i_ref), 1)
    )
    np.testing.assert_allclose(np.asarray(d_pl), np.asarray(d_ref),
                               rtol=1e-4, atol=1e-5)


def test_pallas_knn_multi_col_tiles(rng):
    """k-best spread across several column tiles merges exactly."""
    x = rng.normal(size=(16, 8)).astype(np.float32)
    r = np.concatenate([x + 100.0, x, x + 50.0], axis=0)  # 3 tiles' worth
    d_pl, i_pl = knn_pallas(
        jnp.asarray(x), jnp.asarray(r), 3, tile_r=8, tile_c=16, tile_d=128,
        interpret=True,
    )
    # nearest are in the middle band (ids 16..31)
    assert np.all((np.asarray(i_pl)[:, 0] >= 16)
                  & (np.asarray(i_pl)[:, 0] < 32))
