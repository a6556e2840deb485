"""Multimodal-UMAP-TPU: a TPU-native multimodal UMAP framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference implementation (aletheiaaaaa/Multimodal-UMAP): per-modality
fuzzy kNN graphs + spectral initialization + negative-sampling SGD
layout with InfoNCE cross-modal alignment, out-of-sample transform and
inverse transform (text->image reconstruction through an SD-VAE).

Key architectural departures from the reference (see SURVEY.md §7):
  * exact, tiled kNN on the MXU instead of randomized NN-descent
    (reference impl/model.py:63-209) -- every graph structure becomes
    fixed-shape (N, k) and therefore jit-able and shardable,
  * one fused, jit-compiled optimization step per epoch instead of a
    Python loop over sparse-tensor window slices (impl/model.py:396-481),
  * data parallelism over a `jax.sharding.Mesh` for every O(N) and
    O(N^2/blocks) stage.
"""

from .config import Config
from .models.mixture import MultimodalUMAP, UMAPMixture

__version__ = "0.1.0"

__all__ = ["Config", "MultimodalUMAP", "UMAPMixture", "__version__"]
