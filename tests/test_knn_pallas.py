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
