"""Step-level breakdown of fit_graph for one modality at flickr scale.

Usage: python -u tools/profile_graph_steps.py [N] [D] [out_dim]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.ops.graph import (
    fuzzy_weights,
    symmetrize,
    symmetrize_dense,
)
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.spectral import spectral_embedding
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        jnp.asarray(leaf).ravel()[0].item()
    return x


def timed(name, fn):
    t0 = time.perf_counter()
    out = sync(fn())
    print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    out_dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    data = clustered_modalities_device(n, dims=(d,), n_clusters=256, seed=0)
    x = jnp.asarray(list(data.values())[0])
    sync(x)

    dists, nbrs = timed("knn", lambda: knn(x, x, 15, exclude_self=True))
    w = timed("fuzzy_weights", lambda: fuzzy_weights(dists))[0]
    g = timed("symmetrize", lambda: symmetrize(nbrs, w))
    timed("symmetrize_dense", lambda: symmetrize_dense(nbrs, w))
    timed(f"spectral out_dim={out_dim}",
          lambda: spectral_embedding(g, out_dim))
    timed(f"spectral out_dim={out_dim} (2nd)",
          lambda: spectral_embedding(g, out_dim))


if __name__ == "__main__":
    main()
