"""Per-chunk layout timing inside a warm 31k fit.

The chunk callback reads back the last loss (a true host sync on the
tunnel), so consecutive callback timestamps bound each 100-epoch chunk
including dispatch. The gap between fit() entry and the first callback
is graph build + spectral + layout chunk 0.

Usage: python -u tools/profile_fit_chunks.py [n] [epochs]
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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    cfg = Config()

    for rep in range(2):
        data = clustered_modalities_device(n, dims=(768, 4096),
                                           n_clusters=256, seed=rep,
                                           centers_seed=0)
        arrays = [data[k] for k in data]
        sync(arrays)

        marks = []

        t0 = time.perf_counter()
        model = MultimodalUMAP(cfg.k_neighbors, cfg.out_dim, cfg.min_dist,
                               num_encoders=2)
        model.fit(arrays, epochs=epochs, num_rep=cfg.num_rep, lr=cfg.lr,
                  alpha=cfg.alpha, batch_size=cfg.batch_size,
                  verbose=False, progress_path=None)
        sync(model.embeds)
        total = time.perf_counter() - t0
        print(f"rep {rep}: total {total:.1f}s", flush=True)

        # Manual layout-only rerun with a syncing per-chunk callback.
        from multimodal_umap_tpu.models.layout import train_layout, fit_task

        graphs, denses, inits = [], [], []
        for enc, feats in zip(model.encoders, model.data):
            g, d, i = enc.fit_graph(feats)
            graphs.append(g)
            denses.append(d)
            inits.append(i)
        sync([d.weights for d in denses] + list(inits))

        tasks, statics = zip(*(fit_task(d, cfg.batch_size) for d in denses))

        t1 = time.perf_counter()
        last = [t1]

        def cb(done, params, opt_state, hist):
            float(hist[-1])  # host readback = sync
            now = time.perf_counter()
            marks.append((done, now - last[0]))
            last[0] = now

        # Distinct key per rep: identical-input jit calls are memoized
        # on the axon tunnel (see memory notes).
        train_layout(inits, tasks, statics, mode="fit", epochs=epochs,
                     num_rep=cfg.num_rep, lr=cfg.lr, alpha=cfg.alpha,
                     batch_size=cfg.batch_size, a=model.a, b=model.b,
                     key=jax.random.PRNGKey(100 + rep), chunk_callback=cb)
        print(f"rep {rep}: layout-only total {time.perf_counter() - t1:.1f}s"
              f"  chunks: {[(d, round(s, 2)) for d, s in marks]}",
              flush=True)


if __name__ == "__main__":
    main()
