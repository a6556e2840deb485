"""Exact kNN vs a brute-force numpy oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_umap_tpu.ops.knn import knn

pytestmark = pytest.mark.fast


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


def test_knn_bf16_engine_exact_ids_and_dists(rng):
    """bf16 panel + exact f32 re-score vs a float64 oracle: recall 1.0
    and ~1e-6 distance error, INCLUDING a near-duplicate cluster where
    the expanded-form f32-highest engine itself loses ~1% recall to
    cancellation (measured 0.987 / 5.5e-4 error on this fixture). The
    direct-form re-score makes the fast engine the more accurate one
    (VERDICT r2 next-step 2)."""
    x = rng.normal(size=(500, 24)).astype(np.float32)
    x[100:120] = x[99] + 1e-3 * rng.normal(size=(20, 24)).astype(np.float32)
    d64 = np.linalg.norm(
        x[:, None, :].astype(np.float64) - x[None, :, :].astype(np.float64),
        axis=2,
    )
    np.fill_diagonal(d64, np.inf)
    oid = np.argsort(d64, axis=1, kind="stable")[:, :10]
    od = np.take_along_axis(d64, oid, axis=1)
    d_b, i_b = knn(jnp.asarray(x), jnp.asarray(x), 10, exclude_self=True,
                   engine="bf16")
    recall = np.mean(np.sort(np.asarray(i_b), 1) == np.sort(oid, 1))
    assert recall == 1.0, recall
    np.testing.assert_allclose(np.asarray(d_b), od, rtol=1e-4, atol=1e-5)
    assert np.all(np.asarray(i_b) != np.arange(500)[:, None])


def test_knn_bf16_query_mode_row_blocked(rng):
    x = rng.normal(size=(300, 17)).astype(np.float32)
    q = rng.normal(size=(70, 17)).astype(np.float32)
    d_e, i_e = knn(jnp.asarray(q), jnp.asarray(x), 6, engine="xla")
    d_b, i_b = knn(jnp.asarray(q), jnp.asarray(x), 6, engine="bf16",
                   row_block=32)
    np.testing.assert_array_equal(np.sort(np.asarray(i_b), 1),
                                  np.sort(np.asarray(i_e), 1))
    np.testing.assert_allclose(np.asarray(d_b), np.asarray(d_e),
                               rtol=1e-4, atol=1e-5)


def test_knn_engine_env_var(rng, monkeypatch):
    """MMUMAP_KNN_ENGINE resolves when no explicit engine is given."""
    from multimodal_umap_tpu.ops.knn import resolve_engine

    monkeypatch.setenv("MMUMAP_KNN_ENGINE", "bf16")
    assert resolve_engine() == "bf16"
    assert resolve_engine("xla") == "xla"  # explicit wins
    monkeypatch.delenv("MMUMAP_KNN_ENGINE")
    assert resolve_engine() in ("xla", "bf16")


def test_resolve_engine_rejects_unknown_names(monkeypatch):
    """Unknown engine names must raise, not silently fall through to
    the full-width f32 panel path (which skips the streaming guard)."""
    import pytest

    from multimodal_umap_tpu.ops.knn import resolve_engine

    with pytest.raises(ValueError, match="unknown kNN engine"):
        resolve_engine("exact")
    monkeypatch.setenv("MMUMAP_KNN_ENGINE", "ring")
    with pytest.raises(ValueError, match="unknown kNN engine"):
        resolve_engine(None)
    assert resolve_engine("bf16") == "bf16"
