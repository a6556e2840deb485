"""Exact kNN vs a brute-force numpy oracle."""

import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.ops.knn import knn


def _brute_knn(q, r, k, exclude_self=False):
    d = np.linalg.norm(q[:, None, :] - r[None, :, :], axis=2)
    if exclude_self:
        np.fill_diagonal(d, np.inf)
    ids = np.argsort(d, axis=1, kind="stable")[:, :k]
    return np.take_along_axis(d, ids, axis=1), ids


def test_knn_self_graph(rng):
    x = rng.normal(size=(137, 9)).astype(np.float32)
    d, i = knn(jnp.asarray(x), jnp.asarray(x), 7, exclude_self=True)
    od, oi = _brute_knn(x, x, 7, exclude_self=True)
    np.testing.assert_allclose(np.asarray(d), od, rtol=2e-4, atol=2e-4)
    # ids may differ on exact ties; distances must agree.
    assert np.all(np.asarray(i) != np.arange(137)[:, None])


def test_knn_query_mode(rng):
    r = rng.normal(size=(211, 5)).astype(np.float32)
    q = rng.normal(size=(33, 5)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(r), 4)
    od, oi = _brute_knn(q, r, 4)
    np.testing.assert_allclose(np.asarray(d), od, rtol=2e-4, atol=2e-4)
    np.testing.assert_array_equal(np.asarray(i), oi)


def test_knn_blocking_invariance(rng):
    x = rng.normal(size=(130, 6)).astype(np.float32)
    d1, i1 = knn(jnp.asarray(x), jnp.asarray(x), 5, exclude_self=True,
                 row_block=32)
    d2, i2 = knn(jnp.asarray(x), jnp.asarray(x), 5, exclude_self=True,
                 row_block=1024)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_knn_sorted_ascending(rng):
    x = rng.normal(size=(64, 3)).astype(np.float32)
    d, _ = knn(jnp.asarray(x), jnp.asarray(x), 6, exclude_self=True)
    d = np.asarray(d)
    assert np.all(np.diff(d, axis=1) >= -1e-6)


def test_knn_approx_engine_recall(rng, monkeypatch):
    """MMUMAP_KNN_ENGINE=approx: high recall vs the exact engine."""
    monkeypatch.setenv("MMUMAP_KNN_ENGINE", "approx")
    x = rng.normal(size=(300, 12)).astype(np.float32)
    d_a, i_a = knn(jnp.asarray(x), jnp.asarray(x), 8, exclude_self=True)
    monkeypatch.delenv("MMUMAP_KNN_ENGINE")
    d_e, i_e = knn(jnp.asarray(x), jnp.asarray(x), 8, exclude_self=True)
    recall = float(np.mean(
        np.sort(np.asarray(i_a), 1) == np.sort(np.asarray(i_e), 1)
    ))
    assert recall > 0.9, recall
    assert np.all(np.asarray(i_a) != np.arange(300)[:, None])


def test_knn_approx_engine_row_blocked(rng, monkeypatch):
    """The approx engine must honor row blocking (ADVICE: a one-shot
    (Q, N) panel OOMs at the scale the engine exists for)."""
    monkeypatch.setenv("MMUMAP_KNN_ENGINE", "approx")
    x = rng.normal(size=(260, 10)).astype(np.float32)
    d_blk, i_blk = knn(jnp.asarray(x), jnp.asarray(x), 6,
                       exclude_self=True, row_block=64)
    d_one, i_one = knn(jnp.asarray(x), jnp.asarray(x), 6,
                       exclude_self=True, row_block=4096)
    np.testing.assert_allclose(np.asarray(d_blk), np.asarray(d_one),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(i_blk), np.asarray(i_one))
    assert np.all(np.asarray(i_blk) != np.arange(260)[:, None])
