"""Breaks down the out-of-sample transform cost at eval scale
(VERDICT round 1 task 6: eval <= 10 s at 31k).

Times, with true host-readback syncs between stages (on the axon
tunnel ``block_until_ready`` does not drain the queue):
  * fit at N=31744 (warm), fully synced;
  * transform graph build alone (kNN + sigma + weights + init);
  * the 120-epoch transform layout alone;
  * a second full transform call (the executable-reuse steady state).

Usage: python -u tools/profile_transform.py [n_train] [n_test]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from multimodal_umap_tpu import Config, MultimodalUMAP
from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[..., :1])
    return x


def main():
    enable_compilation_cache()
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    n_test = int(sys.argv[2]) if len(sys.argv) > 2 else 1024

    cfg = Config()
    train = clustered_modalities_device(n_train, dims=(768, 4096),
                                        n_clusters=256, seed=0,
                                        centers_seed=0)
    test = clustered_modalities_device(n_test, dims=(768, 4096),
                                       n_clusters=256, seed=1,
                                       centers_seed=0)
    sync(list(train.values()) + list(test.values()))

    t0 = time.perf_counter()
    model = MultimodalUMAP(cfg.k_neighbors, cfg.out_dim, cfg.min_dist,
                           num_encoders=2)
    model.fit([train[k] for k in train], epochs=cfg.train_epochs,
              num_rep=cfg.num_rep, lr=cfg.lr, alpha=cfg.alpha,
              batch_size=cfg.batch_size)
    sync(model.embeds)
    print(f"fit (true sync): {time.perf_counter() - t0:.1f}s", flush=True)

    queries = [test["texts"], test["images"]]
    for rep in range(3):
        # Stage 1: graph build only.
        t1 = time.perf_counter()
        built = []
        for q, enc_idx in zip(queries, [0, 1]):
            enc = model.encoders[enc_idx]
            built.append(enc.transform_graph(
                q, model.data[enc_idx], model.embeds[enc_idx]))
        sync(built)
        t_graph = time.perf_counter() - t1

        # Stage 2: full transform (rebuilds the graph internally, so
        # subtract t_graph for the layout-only estimate; graph programs
        # are cached and axon memoizes identical calls).
        t2 = time.perf_counter()
        embeds = model.transform(queries, epochs=cfg.test_epochs,
                                 data_indices=[0, 1], num_rep=cfg.num_rep,
                                 lr=cfg.lr, alpha=cfg.alpha,
                                 batch_size=cfg.batch_size)
        sync(embeds)
        t_full = time.perf_counter() - t2
        print(f"rep {rep}: graph_build {t_graph:.2f}s  "
              f"full_transform {t_full:.2f}s  "
              f"(layout-ish {t_full - t_graph:.2f}s)", flush=True)


if __name__ == "__main__":
    main()
