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
    from multimodal_umap_tpu.ops.graph import (
        fuzzy_weights, symmetrize, symmetrize_dense)
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
        dense = symmetrize_dense(nb, w)
        e = spectral_embedding(g, OUT_DIM)
        jax.block_until_ready(e)
        print(f"modality {m}: graph+spectral {time.perf_counter()-t0:.1f}s",
              flush=True)
        out[f"nbrs_{m}"] = np.asarray(dense.nbrs)
        out[f"weights_{m}"] = np.asarray(dense.weights)
        out[f"bwd_valid_{m}"] = np.asarray(dense.bwd_valid)
        out[f"init_{m}"] = np.asarray(e)
    np.savez(CACHE, **out)
    print("saved", CACHE, flush=True)


def time_layout(epoch_counts):
    from multimodal_umap_tpu.models.layout import fit_task, train_layout
    from multimodal_umap_tpu.ops.graph import DenseSymGraph

    z = np.load(CACHE)
    tasks, statics, inits = [], [], []
    for m in range(2):
        dense = DenseSymGraph(
            nbrs=jnp.asarray(z[f"nbrs_{m}"]),
            weights=jnp.asarray(z[f"weights_{m}"]),
            bwd_valid=jnp.asarray(z[f"bwd_valid_{m}"]),
            num_rows=N,
        )
        t, s = fit_task(dense, 256)
        tasks.append(t)
        statics.append(s)
        inits.append(jnp.asarray(z[f"init_{m}"]))

    num_rep = int(os.environ.get("ABL_NUM_REP", "8"))
    alpha = float(os.environ.get("ABL_ALPHA", "1.0"))
    n_modes = int(os.environ.get("ABL_MODES", "2"))
    print(f"variant: num_rep={num_rep} alpha={alpha} modes={n_modes}",
          flush=True)

    if os.environ.get("ABL_FWDONLY"):
        from multimodal_umap_tpu.models.layout import make_loss_fn

        loss_fn = make_loss_fn(statics[:n_modes], mode="fit",
                               num_rep=num_rep, alpha=alpha, batch_size=256)
        ab = (jnp.float32(1.577), jnp.float32(0.8951))

        @jax.jit
        def fwd_scan(params, tsk, keys):
            def step(carry, k):
                return carry, loss_fn(params, tsk, ab, k)
            return jax.lax.scan(step, 0, keys)[1]

        for epochs in epoch_counts:
            keys = jax.random.split(jax.random.PRNGKey(0), epochs)
            t0 = time.perf_counter()
            losses = fwd_scan(tuple(inits[:n_modes]), tuple(tasks[:n_modes]),
                              keys)
            jax.block_until_ready(losses)
            print(f"FWD-ONLY {epochs} epochs: "
                  f"{time.perf_counter() - t0:.2f}s", flush=True)
        return
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
