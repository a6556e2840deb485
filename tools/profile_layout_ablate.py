"""Ablates the layout epoch at 31k: which term costs the 64.6 ms?

Runs 200-epoch layouts with components switched off and reports
ms/epoch for: full, num_rep=0 (no negatives), alpha=0 (no InfoNCE),
both off. Warm-started per config (first chunk paid, then timed).

Usage: python -u tools/profile_layout_ablate.py [n]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from multimodal_umap_tpu import Config, MultimodalUMAP
from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.models.layout import fit_task, train_layout
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[..., :1])
    return x


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    cfg = Config()

    data = clustered_modalities_device(n, dims=(768, 4096), n_clusters=256,
                                       seed=0, centers_seed=0)
    arrays = [data[k] for k in data]
    sync(arrays)

    model = MultimodalUMAP(cfg.k_neighbors, cfg.out_dim, cfg.min_dist,
                           num_encoders=2)
    model.data = arrays
    denses, inits = [], []
    for enc, feats in zip(model.encoders, arrays):
        _, d, i = enc.fit_graph(feats)
        denses.append(d)
        inits.append(i)
    sync([d.weights for d in denses] + list(inits))
    tasks, statics = zip(*(fit_task(d, cfg.batch_size) for d in denses))

    def run(num_rep, alpha, epochs=200):
        def go(seed):
            # Distinct key per call: identical-input jit calls are
            # memoized on the axon tunnel (see memory notes).
            t0 = time.perf_counter()
            embeds, _ = train_layout(
                inits, tasks, statics, mode="fit", epochs=epochs,
                num_rep=num_rep, lr=cfg.lr, alpha=alpha,
                batch_size=cfg.batch_size, a=model.a, b=model.b,
                key=jax.random.PRNGKey(seed))
            sync(embeds)
            return time.perf_counter() - t0
        go(1)  # warm (compile)
        return go(2) / epochs * 1e3

    print(f"full (rep=8, alpha=1):  {run(8, 1.0):.1f} ms/epoch", flush=True)
    print(f"no negatives (rep=0):   {run(0, 1.0):.1f} ms/epoch", flush=True)
    print(f"no infonce (alpha=0):   {run(8, 0.0):.1f} ms/epoch", flush=True)
    print(f"bare attraction:        {run(0, 0.0):.1f} ms/epoch", flush=True)


if __name__ == "__main__":
    main()
