"""Trustworthiness metric: oracle checks + fitted-model quality gate."""

import numpy as np
import pytest

from multimodal_umap_tpu.eval.trustworthiness import trustworthiness


def _sklearn_style_oracle(x, emb, k):
    n = x.shape[0]
    dx = np.linalg.norm(x[:, None] - x[None, :], axis=2)
    np.fill_diagonal(dx, np.inf)
    de = np.linalg.norm(emb[:, None] - emb[None, :], axis=2)
    np.fill_diagonal(de, np.inf)
    orig_order = np.argsort(dx, axis=1)
    orig_rank = np.argsort(orig_order, axis=1)
    emb_nbrs = np.argsort(de, axis=1)[:, :k]
    total = 0
    for i in range(n):
        for j in emb_nbrs[i]:
            total += max(orig_rank[i, j] - (k - 1), 0)
    return 1.0 - 2.0 * total / (n * k * (2 * n - 3 * k - 1))


def test_identity_embedding_is_perfect(rng):
    x = rng.normal(size=(60, 5)).astype(np.float32)
    assert trustworthiness(x, x, k=7) == pytest.approx(1.0)


def test_matches_oracle(rng):
    x = rng.normal(size=(50, 8)).astype(np.float32)
    emb = rng.normal(size=(50, 2)).astype(np.float32)
    got = trustworthiness(x, emb, k=6)
    want = _sklearn_style_oracle(x, emb, 6)
    assert got == pytest.approx(want, abs=1e-5)


def test_random_embedding_scores_low(rng):
    x = rng.normal(size=(80, 10)).astype(np.float32)
    emb = rng.normal(size=(80, 2)).astype(np.float32)
    assert trustworthiness(x, emb, k=8) < 0.8


def test_fitted_model_is_trustworthy(blobs):
    from multimodal_umap_tpu.models.mixture import MultimodalUMAP

    x0, x1, _ = blobs
    model = MultimodalUMAP(8, 4, 0.1, num_encoders=2)
    model.fit([x0, x1], epochs=100, num_rep=4, lr=0.05, alpha=0.5,
              batch_size=64)
    t = trustworthiness(x0, np.asarray(model.embeds[0]), k=10)
    assert t > 0.85, t


def test_k_bounds():
    x = np.zeros((20, 3), np.float32)
    with pytest.raises(ValueError):
        trustworthiness(x, x, k=10)


def test_sampled_estimator_matches_exact(rng):
    from multimodal_umap_tpu.eval.trustworthiness import (
        trustworthiness_sampled,
    )

    x = rng.normal(size=(120, 8)).astype(np.float32)
    emb = rng.normal(size=(120, 2)).astype(np.float32)
    exact = trustworthiness(x, emb, k=6)
    # Full-row "sample" reproduces the exact score bit-for-bit via the
    # fallback; a genuine subsample lands within its sampling noise.
    assert trustworthiness_sampled(x, emb, k=6, sample_rows=200) == \
        pytest.approx(exact, abs=1e-6)
    est = trustworthiness_sampled(x, emb, k=6, sample_rows=64, seed=1)
    assert est == pytest.approx(exact, abs=0.05)


def test_sampled_estimator_row_blocks_are_equivalent(rng):
    """Blocked anchor-row sweep == one-shot sweep (same rows, same sum).

    The blocks exist so the (S, n) panels stay device-sized at
    beyond-flickr n; they must not change the estimate.
    """
    from multimodal_umap_tpu.eval.trustworthiness import (
        trustworthiness_sampled,
    )

    x = rng.normal(size=(150, 8)).astype(np.float32)
    emb = rng.normal(size=(150, 2)).astype(np.float32)
    one = trustworthiness_sampled(x, emb, k=6, sample_rows=96, seed=3,
                                  row_block=96)
    # 96 rows in blocks of 17: five full blocks + one ragged remainder.
    blocked = trustworthiness_sampled(x, emb, k=6, sample_rows=96, seed=3,
                                      row_block=17)
    assert blocked == pytest.approx(one, abs=1e-6)


def test_penalty_sum_accumulates_in_float32(rng):
    """int32 penalty sums wrap past 2^31 (reachable for large-n garbage
    embeddings, flipping the quality gate); the sum must be f32."""
    import jax.numpy as jnp

    from multimodal_umap_tpu.eval.trustworthiness import _trust_rows

    x = rng.normal(size=(64, 4)).astype(np.float32)
    emb = rng.normal(size=(64, 2)).astype(np.float32)
    rows = jnp.arange(16)
    out = _trust_rows(jnp.asarray(x)[rows], jnp.asarray(x),
                      jnp.asarray(emb)[rows], jnp.asarray(emb), rows, 6)
    assert out.dtype == jnp.float32
