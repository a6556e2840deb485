"""Scatter-free gradient primitives vs autodiff oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_umap_tpu.ops.scatter_free import (
    permutation_gather,
    random_permutation_pair,
)

pytestmark = pytest.mark.fast





def test_permutation_gather_grad(rng):
    pi, pi_inv = random_permutation_pair(jax.random.PRNGKey(3), 41)
    # pi_inv really inverts pi.
    np.testing.assert_array_equal(np.asarray(pi[pi_inv]), np.arange(41))
    table = jnp.asarray(rng.normal(size=(41, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(41, 4)).astype(np.float32))

    custom = jax.grad(
        lambda t: jnp.sum(permutation_gather(t, pi, pi_inv) * w)
    )(table)
    plain = jax.grad(lambda t: jnp.sum(t[pi] * w))(table)
    np.testing.assert_allclose(np.asarray(custom), np.asarray(plain),
                               rtol=1e-6)



def test_dense_fit_loss_matches_naive_edge_list(rng):
    """Deterministic mode (Bernoulli keeps replaced by expectations):
    the dense fit engine's loss and gradient must equal a naive
    edge-list autodiff implementation of the reference semantics --
    every directed entry of the symmetric matrix weighted by
    w_e / (cnt_window(anchor) * W), attraction only (negatives use a
    different sampling structure by design)."""
    from multimodal_umap_tpu.models.layout import _fit_modality_loss, fit_task
    from multimodal_umap_tpu.ops import losses as LL
    from multimodal_umap_tpu.ops.graph import (
        fuzzy_weights,
        symmetrize,
        symmetrize_dense,
    )
    from multimodal_umap_tpu.ops.knn import knn

    x = jnp.asarray(rng.normal(size=(90, 7)).astype(np.float32))
    d, nb = knn(x, x, 6, exclude_self=True)
    w, _, _ = fuzzy_weights(d)
    dense = symmetrize_dense(nb, w)
    edges = symmetrize(nb, w)
    task, static = fit_task(dense, 32)
    embed = jnp.asarray(rng.normal(size=(90, 4)).astype(np.float32))
    key = jax.random.PRNGKey(7)
    a, b = jnp.float32(1.577), jnp.float32(0.8951)

    def dense_loss(e):
        return _fit_modality_loss(e, task, static, key, a=a, b=b,
                                  num_rep=0, batch_size=32,
                                  deterministic=True)

    def naive_loss(e):
        keep = jnp.where(edges.valid, edges.weights, 0.0)
        attr = LL.umap_attr(e[edges.rows], e[edges.cols], a, b)
        window = edges.rows // 32
        win_sum = jax.ops.segment_sum(keep * attr, window,
                                      num_segments=static.num_windows)
        cnt = jax.ops.segment_sum(keep, window,
                                  num_segments=static.num_windows)
        win_mean = jnp.where(cnt > 0, win_sum / jnp.maximum(cnt, 1.0), 0.0)
        return jnp.mean(win_mean)

    v_dense, g_dense = jax.value_and_grad(dense_loss)(embed)
    v_naive, g_naive = jax.value_and_grad(naive_loss)(embed)
    np.testing.assert_allclose(float(v_dense), float(v_naive), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_dense), np.asarray(g_naive),
                               rtol=2e-4, atol=1e-6)


def test_slot_scan_attraction_matches_dense(rng):
    """The remat slot-scan attraction (used past _ATTR_SLOT_BYTES so
    the (N, k, D) gather never materializes next to beyond-HBM feature
    tables) must give the same loss and gradients as the dense form."""
    from multimodal_umap_tpu.models import layout as LY
    from multimodal_umap_tpu.models.layout import fit_task, make_loss_fn
    from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize_dense
    from multimodal_umap_tpu.ops.knn import knn

    x = jnp.asarray(rng.normal(size=(150, 10)).astype(np.float32))
    d, nbrs = knn(x, x, 6, exclude_self=True)
    w, _, _ = fuzzy_weights(d)
    task, static = fit_task(symmetrize_dense(nbrs, w), batch_size=50)
    embed = jnp.asarray(rng.normal(size=(150, 5)).astype(np.float32))
    ab = (jnp.float32(1.577), jnp.float32(0.8951))
    key = jax.random.PRNGKey(7)

    def run():
        loss_fn = make_loss_fn([static], mode="fit", num_rep=3,
                               alpha=0.5, batch_size=50)
        return jax.value_and_grad(loss_fn)(
            (embed,), (task,), ab, key)

    dense_loss, dense_grad = run()
    old = LY._ATTR_SLOT_BYTES
    LY._ATTR_SLOT_BYTES = 0  # force the slot-scan path
    try:
        slot_loss, slot_grad = run()
    finally:
        LY._ATTR_SLOT_BYTES = old
    np.testing.assert_allclose(float(slot_loss), float(dense_loss),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(slot_grad[0]),
                               np.asarray(dense_grad[0]),
                               rtol=1e-5, atol=1e-6)
