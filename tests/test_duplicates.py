"""Robustness: exact duplicate rows (real in flickr captions) hit every
epsilon guard -- zero kNN distances, rho=0, degenerate sigma solves,
zero-distance attraction/repulsion."""

import numpy as np

from multimodal_umap_tpu.models.mixture import MultimodalUMAP
from multimodal_umap_tpu.ops.graph import fuzzy_weights
from multimodal_umap_tpu.ops.knn import knn


def test_graph_with_duplicates_is_finite(rng):
    base = rng.normal(size=(40, 6)).astype(np.float32)
    x = np.concatenate([base, base[:10]])  # 10 exact duplicates
    d, i = knn(x, x, 5, exclude_self=True)
    assert np.all(np.isfinite(np.asarray(d)))
    # Duplicates find their twin at ~zero distance. The |x|^2+|y|^2-2xy
    # form cancels catastrophically at exact duplicates, leaving an
    # O(eps * |x|^2) residue -- bounded, not bitwise zero.
    assert float(np.asarray(d)[40:, 0].max()) < 5e-3
    w, rhos, sigmas = fuzzy_weights(d)
    assert np.all(np.isfinite(np.asarray(w)))
    assert np.all(np.asarray(sigmas) >= 1e-6)


def test_fit_with_duplicates_is_finite(rng):
    base0 = rng.normal(size=(48, 8)).astype(np.float32)
    base1 = rng.normal(size=(48, 5)).astype(np.float32)
    x0 = np.concatenate([base0, base0[:16]])
    x1 = np.concatenate([base1, base1[:16]])
    model = MultimodalUMAP(6, 3, 0.1, num_encoders=2)
    model.fit([x0, x1], epochs=30, num_rep=2, lr=0.05, alpha=0.5,
              batch_size=32)
    for e in model.embeds:
        assert np.all(np.isfinite(np.asarray(e)))
    assert np.all(np.isfinite(model.loss_history["fit"]))
    # And the invert path (sigma/rho guards) survives duplicates too.
    recon = model.inverse_transform([model.embeds[0][:4]], epochs=5,
                                    data_indices=[0], num_rep=2, lr=0.05,
                                    batch_size=32)
    assert np.all(np.isfinite(np.asarray(recon[0])))
