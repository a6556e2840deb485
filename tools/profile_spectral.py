"""Compare spectral init strategies on the current backend.

Usage: python -u tools/profile_spectral.py [N] [out_dim]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.data import clustered_modalities
from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize, to_dense
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.spectral import _spectral_lobpcg


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    out_dim = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    data = clustered_modalities(n, dims=(128, 64), n_clusters=32, seed=0)
    x = jnp.asarray(data["texts"])
    d, nb = knn(x, x, 15, exclude_self=True)
    w, _, _ = fuzzy_weights(d)
    g = symmetrize(nb, w)
    jax.block_until_ready(g.weights)
    print("graph ready", flush=True)

    t0 = time.perf_counter()
    v = _spectral_lobpcg(g, out_dim, max_iters=100)
    jax.block_until_ready(v)
    print(f"lobpcg m=100 cold: {time.perf_counter() - t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    v = _spectral_lobpcg(g, out_dim, max_iters=100)
    jax.block_until_ready(v)
    print(f"lobpcg m=100 warm: {time.perf_counter() - t0:.2f}s", flush=True)

    if n <= 4096:
        t0 = time.perf_counter()
        adj = np.asarray(to_dense(g))
        deg = np.maximum(adj.sum(1), 1e-6) ** -0.5
        lap = (
            np.eye(n, dtype=np.float32) * (1 + 1e-6)
            - deg[:, None] * adj * deg[None, :]
        )
        evals, evecs = np.linalg.eigh(lap)
        print(f"host numpy eigh: {time.perf_counter() - t0:.2f}s", flush=True)


if __name__ == "__main__":
    main()
