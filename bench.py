"""End-to-end benchmark: multimodal UMAP fit at the reference's measured
configuration.

Workload (matches BASELINE.md's measured reference run): N=2000 points,
2 modalities (D=128 each), k=15, out_dim=8, 600 training epochs. The
reference (torch 2.13 CPU, this container) measured: graph build
~39 s/modality, spectral ~0.5 s, layout ~282 ms/epoch => ~247.7 s
end-to-end. This script runs the identical workload TPU-native and
prints ONE JSON line with the speedup as ``vs_baseline``.

Usage: python bench.py [--quick] [--n 2000] [--epochs 600]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

# Reference measurement (see BASELINE.md, measured 2026-08-16 in this
# container): 2 * 39 s graph + 0.5 s spectral + 600 * 0.282 s layout.
BASELINE_SECONDS = 2 * 39.0 + 0.5 + 600 * 0.282


def run(n: int, epochs: int, k: int, out_dim: int, dims=(128, 128)) -> dict:
    import jax
    from multimodal_umap_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
    from multimodal_umap_tpu.models.mixture import MultimodalUMAP

    data = clustered_modalities_device(n, dims=dims, n_clusters=32, seed=0)
    arrays = [data[key] for key in data]

    # Warm-up at identical shapes: populates the XLA compile cache so
    # the measured run is steady-state execution. (The CPU reference has
    # no compilation phase; excluding ours from the timed region makes
    # the comparison about the algorithms. Cold-compile costs are
    # one-time per shape and persisted by the on-disk cache.)
    warm = MultimodalUMAP(
        k_neighbors=k, out_dim=out_dim, min_dist=0.1, num_encoders=2
    )
    warm.fit(arrays, epochs=min(100, epochs), num_rep=8, lr=0.01,
             alpha=1.0, batch_size=256)
    jax.block_until_ready(warm.embeds)

    model = MultimodalUMAP(
        k_neighbors=k, out_dim=out_dim, min_dist=0.1, num_encoders=2
    )

    t0 = time.perf_counter()
    model.fit(arrays, epochs=epochs, num_rep=8, lr=0.01, alpha=1.0,
              batch_size=256)
    jax.block_until_ready(model.embeds)
    elapsed = time.perf_counter() - t0

    return {
        "elapsed_s": elapsed,
        "final_loss": float(model.loss_history["fit"][-1]),
        "device": str(jax.devices()[0]),
    }


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true",
                        help="tiny smoke configuration")
    parser.add_argument("--n", type=int, default=2000)
    parser.add_argument("--epochs", type=int, default=600)
    parser.add_argument("--k", type=int, default=15)
    parser.add_argument("--out_dim", type=int, default=8)
    args = parser.parse_args()

    if args.quick:
        result = run(256, 30, 10, 4, dims=(32, 32))
        scale_note = "quick"
        baseline = None
    else:
        result = run(args.n, args.epochs, args.k, args.out_dim)
        scale_note = f"n{args.n}_e{args.epochs}"
        baseline = BASELINE_SECONDS

    vs_baseline = (
        round(baseline / result["elapsed_s"], 3) if baseline else 1.0
    )
    print(
        f"# device={result['device']} final_loss={result['final_loss']:.4f}"
        f" config={scale_note}",
        file=sys.stderr,
    )
    print(json.dumps({
        "metric": f"e2e_fit_time_{scale_note}",
        "value": round(result["elapsed_s"], 3),
        "unit": "s",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
