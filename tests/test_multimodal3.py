"""Three-modality fit + fit_transform coverage (the reference supports
arbitrary num_encoders; InfoNCE runs over all modality pairs,
reference impl/model.py:463-471)."""

import numpy as np

from multimodal_umap_tpu.data.synthetic import clustered_modalities
from multimodal_umap_tpu.models.mixture import MultimodalUMAP


def test_three_modalities_fit_transform():
    data = clustered_modalities(96, dims=(12, 18, 10), n_clusters=4, seed=3)
    arrays = [data[k] for k in data]
    assert len(arrays) == 3

    model = MultimodalUMAP(6, 3, 0.1, num_encoders=3)
    embeds = model.fit_transform(arrays, epochs=60, num_rep=2, lr=0.05,
                                 alpha=0.5, batch_size=48)
    assert len(embeds) == 3
    for e, x in zip(embeds, arrays):
        assert np.asarray(e).shape == (x.shape[0], 3)
        assert np.all(np.isfinite(np.asarray(e)))

    # All three pairs should align (positive mean cosine).
    normed = [
        np.asarray(e) / np.maximum(
            np.linalg.norm(np.asarray(e), axis=1, keepdims=True), 1e-12)
        for e in embeds
    ]
    for i in range(3):
        for j in range(i + 1, 3):
            cos = float((normed[i] * normed[j]).sum(1).mean())
            assert cos > 0.3, (i, j, cos)

    # Transform from the third modality alone.
    out = model.transform([arrays[2][:8]], epochs=10, data_indices=[2],
                          num_rep=2, lr=0.05, batch_size=48)
    assert np.asarray(out[0]).shape == (8, 3)
