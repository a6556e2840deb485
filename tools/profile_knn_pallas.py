"""Pallas fused kNN kernel vs XLA path on real TPU.

Usage: python -u tools/profile_knn_pallas.py [N] [D]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.knn_pallas import knn_pallas
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    for leaf in jax.tree_util.tree_leaves(x):
        jnp.asarray(leaf).ravel()[0].item()
    return x


def timed(name, fn):
    t0 = time.perf_counter()
    out = sync(fn())
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = sync(fn())
    print(f"{name}: cold={cold:.2f}s warm={time.perf_counter() - t0:.3f}s",
          flush=True)
    return out


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    data = clustered_modalities_device(n, dims=(d,), n_clusters=256, seed=0)
    x = jnp.asarray(list(data.values())[0])
    sync(x)

    d_x, i_x = timed("XLA knn", lambda: knn(x, x, 15, exclude_self=True))
    d_p, i_p = timed("Pallas knn",
                     lambda: knn_pallas(x, x, 15, exclude_self=True))
    row_match = jnp.mean(
        (jnp.sort(i_x, 1) == jnp.sort(i_p, 1)).all(1).astype(jnp.float32)
    )
    print(f"row id-set agreement: {float(row_match):.5f}", flush=True)
    import numpy as np
    print("max |d| diff:",
          float(jnp.max(jnp.abs(d_x - d_p))), flush=True)
    del np


if __name__ == "__main__":
    main()
