"""Spectral initializer: LOBPCG path vs exact dense path."""

import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.spectral import spectral_embedding


def _graph(rng, n=300, d=10, k=8):
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    dists, nbrs = knn(x, x, k, exclude_self=True)
    w, _, _ = fuzzy_weights(dists)
    return symmetrize(nbrs, w)


def test_lobpcg_matches_dense_subspace(rng):
    graph = _graph(rng)
    dense = np.asarray(spectral_embedding(graph, 4, method="dense"))
    lob = np.asarray(spectral_embedding(graph, 4, method="lobpcg",
                                        max_iters=300))
    q_d, _ = np.linalg.qr(dense)
    q_l, _ = np.linalg.qr(lob)
    sv = np.linalg.svd(q_d.T @ q_l, compute_uv=False)
    assert sv.min() > 0.98, sv


def test_auto_dispatch_small_uses_dense(rng):
    graph = _graph(rng, n=40, k=5)
    # out_dim=16 -> 4*17+4=72 > 40 -> dense path must be chosen (lobpcg
    # would violate its size guardrail).
    emb = np.asarray(spectral_embedding(graph, 16))
    assert emb.shape == (40, 16)
    assert np.all(np.isfinite(emb))


def test_spectral_orthogonal_columns(rng):
    graph = _graph(rng)
    emb = np.asarray(spectral_embedding(graph, 4, method="dense"))
    gram = emb.T @ emb
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() < 1e-3
