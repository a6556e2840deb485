"""Layout-only timing at flickr scale, with the graph cached on disk.

Stage 1 (build): python -u tools/profile_layout31k.py build
Stage 2 (time):  python -u tools/profile_layout31k.py time [epochs...]
"""

import os
import sys
import time  # noqa: F401

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.utils.cache import enable_compilation_cache

CACHE = "/tmp/layout31k_graph.npz"
N, OUT_DIM, K = 31744, 64, 15


def build():
    from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
    from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize
    from multimodal_umap_tpu.ops.knn import knn
    from multimodal_umap_tpu.ops.spectral import spectral_embedding

    data = clustered_modalities_device(N, dims=(768, 4096), n_clusters=256,
                                       seed=0)
    out = {}
    for m, arr in enumerate(data.values()):
        x = jnp.asarray(arr)
        t0 = time.perf_counter()
        d, nb = knn(x, x, K, exclude_self=True)
        w, _, _ = fuzzy_weights(d)
        g = symmetrize(nb, w)
        e = spectral_embedding(g, OUT_DIM)
        jax.block_until_ready(e)
        print(f"modality {m}: graph+spectral {time.perf_counter()-t0:.1f}s",
              flush=True)
        out[f"rows_{m}"] = np.asarray(g.rows)
        out[f"cols_{m}"] = np.asarray(g.cols)
        out[f"weights_{m}"] = np.asarray(g.weights)
        out[f"valid_{m}"] = np.asarray(g.valid)
        out[f"init_{m}"] = np.asarray(e)
    np.savez(CACHE, **out)
    print("saved", CACHE, flush=True)


def time_layout(epoch_counts):
    from multimodal_umap_tpu.models.layout import task_from_graph, train_layout
    from multimodal_umap_tpu.ops.graph import EdgeGraph

    z = np.load(CACHE)
    tasks, statics, inits = [], [], []
    for m in range(2):
        g = EdgeGraph(
            rows=jnp.asarray(z[f"rows_{m}"]),
            cols=jnp.asarray(z[f"cols_{m}"]),
            weights=jnp.asarray(z[f"weights_{m}"]),
            valid=jnp.asarray(z[f"valid_{m}"]),
            num_rows=N, num_cols=N,
        )
        t, s = task_from_graph(g, 256)
        tasks.append(t)
        statics.append(s)
        inits.append(jnp.asarray(z[f"init_{m}"]))

    num_rep = int(os.environ.get("ABL_NUM_REP", "8"))
    alpha = float(os.environ.get("ABL_ALPHA", "1.0"))
    n_modes = int(os.environ.get("ABL_MODES", "2"))
    print(f"variant: num_rep={num_rep} alpha={alpha} modes={n_modes}",
          flush=True)
    for epochs in epoch_counts:
        t0 = time.perf_counter()
        embeds, hist = train_layout(
            inits[:n_modes], tasks[:n_modes], statics[:n_modes],
            mode="fit", epochs=epochs, num_rep=num_rep,
            lr=0.01, alpha=alpha, batch_size=256, a=1.577, b=0.8951,
            key=jax.random.PRNGKey(0),
        )
        jax.block_until_ready(embeds)
        dt = time.perf_counter() - t0
        print(f"layout {epochs} epochs: {dt:.2f}s "
              f"(final loss {float(hist[-1]):.4f})", flush=True)


if __name__ == "__main__":
    enable_compilation_cache()
    if sys.argv[1] == "build":
        build()
    else:
        time_layout([int(a) for a in sys.argv[2:]] or [5, 105])
