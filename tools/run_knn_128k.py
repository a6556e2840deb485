"""Single-chip 128k-point exact kNN via the column-streamed engine
(VERDICT round 1 task 7: the scale where a full-width row panel no
longer fits comfortably in HBM).

A 128k x 128k f32 panel is 65 GB; one 8192-row full-width panel is
4.3 GB. The streamed engine bounds peak memory at
row_block x col_block (1 GB at the defaults) regardless of N. This
script runs the 131072-point self-graph at D=512 on the attached chip,
verifies a sampled subset of rows against a directly-computed oracle,
and reports wall time + achieved panel TFLOP/s.

Usage: python -u tools/run_knn_128k.py [n] [d] [k]
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.knn_stream import knn_streamed
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def main():
    enable_compilation_cache()
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    x = clustered_modalities_device(n, dims=(d, 8), n_clusters=512,
                                    seed=0)["texts"]
    np.asarray(x[:1])  # sync data generation

    t0 = time.perf_counter()
    dists, ids = knn_streamed(x, x, k, exclude_self=True)
    dists = np.asarray(dists)
    ids = np.asarray(ids)
    elapsed = time.perf_counter() - t0

    flops = 2.0 * n * n * d
    print(f"streamed kNN: N={n} D={d} k={k}: {elapsed:.1f}s "
          f"({flops / elapsed / 1e12:.1f} TFLOP/s incl. compile on "
          f"first run)")

    # Oracle check on a sampled row block: exact full-width engine on
    # 512 query rows vs the full table.
    q = x[4096:4608]
    od, oi = knn(q, x, k + 1)  # +1 slot: self-match occupies rank 0
    od, oi = np.asarray(od), np.asarray(oi)
    sel_d, sel_i = [], []
    for r in range(512):
        mask = oi[r] != (4096 + r)
        sel_d.append(od[r][mask][:k])
        sel_i.append(oi[r][mask][:k])
    np.testing.assert_array_equal(ids[4096:4608], np.stack(sel_i))
    np.testing.assert_allclose(dists[4096:4608], np.stack(sel_d),
                               rtol=1e-4, atol=1e-4)
    print("oracle check on 512 sampled rows: EXACT MATCH")


if __name__ == "__main__":
    main()
