"""North-star scale profile: N=31744 pairs, D=(768, 4096), k=15,
out_dim=64, 600 epochs -- the full flickr30k-shaped workload on one
chip. Usage: python -u tools/profile_flickr_scale.py [N] [epochs]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.models.layout import fit_task, train_layout
from multimodal_umap_tpu.ops.graph import (
    fuzzy_weights, symmetrize, symmetrize_dense)
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.spectral import spectral_embedding


def timed(name, fn):
    t0 = time.perf_counter()
    out = fn()
    jax.block_until_ready(out)
    print(f"{name}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main():
    from multimodal_umap_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 600
    print("devices:", jax.devices(), flush=True)

    t_start = time.perf_counter()
    data = timed("synthesize features", lambda: clustered_modalities_device(
        n, dims=(768, 4096), n_clusters=256, seed=0))
    xs = [jnp.asarray(v) for v in data.values()]

    graphs, denses, inits = [], [], []
    for i, x in enumerate(xs):
        d, nb = timed(f"knn{i} D={x.shape[1]}",
                      lambda: knn(x, x, 15, exclude_self=True))
        w = timed(f"fuzzy{i}", lambda: fuzzy_weights(d))[0]
        g = timed(f"sym{i}", lambda: symmetrize(nb, w))
        dense = timed(f"sym_dense{i}", lambda: symmetrize_dense(nb, w))
        e = timed(f"spectral{i} (lobpcg)", lambda: spectral_embedding(g, 64))
        graphs.append(g)
        denses.append(dense)
        inits.append(e)

    tasks, statics = zip(*(fit_task(d, 256) for d in denses))

    def fit(num_epochs):
        return train_layout(
            inits, tasks, statics, mode="fit", epochs=num_epochs,
            num_rep=8, lr=0.01, alpha=1.0, batch_size=256,
            a=1.577, b=0.8951, key=jax.random.PRNGKey(0),
        )[0]

    timed("layout 5 epochs (compile)", lambda: fit(5))
    timed(f"layout {epochs} epochs", lambda: fit(epochs))
    print(f"TOTAL: {time.perf_counter() - t_start:.2f}s", flush=True)


if __name__ == "__main__":
    main()
