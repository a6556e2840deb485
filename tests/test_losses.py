"""Property tests for the loss functions (closed-form oracles)."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.ops import losses as L
import pytest

pytestmark = pytest.mark.fast


def test_umap_attr_closed_form(rng):
    x = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
    a, b = 1.577, 0.8951
    got = np.asarray(L.umap_attr(x, y, a, b))
    sq = np.maximum(((np.asarray(x) - np.asarray(y)) ** 2).sum(1), 1e-6)
    want = np.log1p(a * sq**b)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_umap_rep_closed_form(rng):
    x = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(32, 5)).astype(np.float32))
    a, b = 1.577, 0.8951
    got = np.asarray(L.umap_rep(x, y, a, b))
    sq = np.maximum(((np.asarray(x) - np.asarray(y)) ** 2).sum(1), 1e-6)
    adb = a * sq**b
    want = -np.log(adb / (1 + adb) + 1e-6)
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_rep_attr_antagonism():
    """Attraction grows with distance; repulsion shrinks."""
    x = jnp.zeros((1, 3))
    near = jnp.full((1, 3), 0.1)
    far = jnp.full((1, 3), 3.0)
    a, b = 1.577, 0.8951
    assert float(L.umap_attr(x, near, a, b)[0]) < float(L.umap_attr(x, far, a, b)[0])
    assert float(L.umap_rep(x, near, a, b)[0]) > float(L.umap_rep(x, far, a, b)[0])


def test_infonce_identical_embeddings_lower():
    """Aligned (identical) embeddings give a lower InfoNCE loss than
    independent random embeddings."""
    key = jax.random.PRNGKey(0)
    e = jax.random.normal(jax.random.PRNGKey(1), (128, 8))
    e2 = jax.random.normal(jax.random.PRNGKey(2), (128, 8))
    aligned = float(L.infonce(key, e, e))
    random = float(L.infonce(key, e, e2))
    assert aligned < random


def test_infonce_grad_finite_with_zero_rows():
    """Regression: zero rows in spectral inits must not NaN the grad."""
    e0 = jnp.zeros((64, 4)).at[0, 0].set(1.0)
    e1 = jnp.zeros((64, 4)).at[1, 1].set(1.0)
    grads = jax.grad(lambda a, b: L.infonce(jax.random.PRNGKey(0), a, b),
                     argnums=(0, 1))(e0, e1)
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


def test_infonce_batching_weights_last_group():
    """n slightly above the 1000 group size: loss stays finite and the
    mean-of-group-means weighting is applied (no NaN from padding)."""
    key = jax.random.PRNGKey(0)
    e0 = jax.random.normal(jax.random.PRNGKey(3), (1003, 4))
    e1 = jax.random.normal(jax.random.PRNGKey(4), (1003, 4))
    val = float(L.infonce(key, e0, e1))
    assert np.isfinite(val) and val > 0


def test_inv_losses_finite_at_coincident_points(rng):
    x = jnp.asarray(rng.normal(size=(8, 6)).astype(np.float32))
    sig = jnp.ones(8)
    rho = jnp.zeros(8)
    a, b = 1.577, 0.8951
    attr = np.asarray(L.inv_attr(x, x, a, b, sig))
    rep = np.asarray(L.inv_rep(x, x, sig, rho))
    assert np.all(np.isfinite(attr))
    assert np.all(np.isfinite(rep))


def test_infonce_blocked_matches_whole_table():
    """The row-blocked streaming form (engaged past 64k rows for memory;
    forced on here via block_rows) must match the whole-table form in
    value AND gradient -- same per-row math, different scheduling."""
    key = jax.random.PRNGKey(7)
    e0 = jax.random.normal(jax.random.PRNGKey(5), (1003, 8))
    e1 = jax.random.normal(jax.random.PRNGKey(6), (1003, 8))

    def whole(a, b):
        return L.infonce(key, a, b, block_rows=1 << 16)

    def blocked(a, b):
        return L.infonce(key, a, b, block_rows=256)

    v_w, g_w = jax.value_and_grad(whole, argnums=(0, 1))(e0, e1)
    v_b, g_b = jax.value_and_grad(blocked, argnums=(0, 1))(e0, e1)
    np.testing.assert_allclose(float(v_w), float(v_b), rtol=1e-5)
    for gw, gb in zip(g_w, g_b):
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gb), rtol=1e-4, atol=1e-6)


def test_infonce_blocked_group_multiple():
    """Blocked path with num an exact group multiple (rot == 0 branch)."""
    key = jax.random.PRNGKey(9)
    e0 = jax.random.normal(jax.random.PRNGKey(1), (2000, 4))
    e1 = jax.random.normal(jax.random.PRNGKey(2), (2000, 4))
    v_w = float(L.infonce(key, e0, e1, block_rows=1 << 16))
    v_b = float(L.infonce(key, e0, e1, block_rows=512))
    np.testing.assert_allclose(v_w, v_b, rtol=1e-5)
