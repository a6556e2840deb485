"""Stage-synced fit breakdown at flickr scale, twice in one process.

Separates per-process one-time costs (executable loads from the disk
compile cache on this host's single slow vCPU) from steady-state
compute: the second fit runs on different data (same shapes) so every
program is already loaded and nothing is memoized by the tunnel.

Usage: python -u tools/profile_fit31k.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from multimodal_umap_tpu import Config, MultimodalUMAP
from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize_dense
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.spectral import spectral_embedding
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[..., :1])
    return x


def staged(x, out_dim):
    from multimodal_umap_tpu.ops.graph import symmetrize

    t = {}
    t0 = time.perf_counter()
    d, i = knn(x, x, 15, exclude_self=True)
    sync((d, i))
    t["knn"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    w, rho, sig = fuzzy_weights(d)
    sync((w, rho, sig))
    t["fuzzy"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    g = symmetrize(i, w)
    gd = symmetrize_dense(i, w)
    sync((g.weights, gd.weights))
    t["symmetrize"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    v = spectral_embedding(g, out_dim)
    sync(v)
    t["spectral"] = time.perf_counter() - t0
    return t


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    cfg = Config()

    for rep in range(2):
        data = clustered_modalities_device(n, dims=(768, 4096),
                                           n_clusters=256, seed=rep,
                                           centers_seed=0)
        arrays = [data[k] for k in data]
        sync(arrays)

        stage0 = staged(arrays[0], cfg.out_dim)
        stage1 = staged(arrays[1], cfg.out_dim)
        print(f"rep {rep} stages mod0: "
              f"{ {k: round(v, 2) for k, v in stage0.items()} }", flush=True)
        print(f"rep {rep} stages mod1: "
              f"{ {k: round(v, 2) for k, v in stage1.items()} }", flush=True)

        t0 = time.perf_counter()
        model = MultimodalUMAP(cfg.k_neighbors, cfg.out_dim, cfg.min_dist,
                               num_encoders=2)
        model.fit(arrays, epochs=cfg.train_epochs, num_rep=cfg.num_rep,
                  lr=cfg.lr, alpha=cfg.alpha, batch_size=cfg.batch_size)
        sync(model.embeds)
        print(f"rep {rep} full fit: {time.perf_counter() - t0:.1f}s",
              flush=True)


if __name__ == "__main__":
    main()
