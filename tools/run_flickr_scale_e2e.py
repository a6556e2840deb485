"""North-star end-to-end run: full flickr30k-scale fit + cross-modal
eval on one chip (BASELINE.md target: < 5 min on v5e).

Synthetic features at the real geometry (N=31744 pairs, 768/4096 dims,
canonical CLI hyperparameters: k=15, out_dim=64, 600 train epochs,
120 test epochs, lr=0.01, alpha=1.0, batch=256).

Usage: python -u tools/run_flickr_scale_e2e.py [n_train] [n_test] [dtype]
                                               [resume_dir]

``dtype`` = ``bfloat16`` stores the feature tables bf16 (halving their
HBM) and generates them in row chunks -- required at N=1M, where the
f32 image table alone (16.8 GB) exceeds one v5e's HBM. The kNN engine
then ranks bf16 and re-scores exactly w.r.t. the stored values
(models/mixture.py ``feature_dtype``).

``resume_dir``: crash resilience for multi-hour attempts on the flaky
tunnel -- fit uses ``graph_cache_path`` (skip the kNN sweep + spectral
filter on retry) and ``progress_path``/``resume`` (continue the layout
from the last epoch chunk) rooted in this directory. Timings printed on
a resumed run cover only the remaining work.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from multimodal_umap_tpu import Config, MultimodalUMAP
from multimodal_umap_tpu.data.synthetic import clustered_modalities_device
from multimodal_umap_tpu.eval import (
    embed_and_recon,
    knn_test,
    similarity_test,
    start_eval_prewarm,
)
from multimodal_umap_tpu.utils.cache import enable_compilation_cache


def sync(x):
    """True host sync: on the axon tunnel block_until_ready does not
    drain the dispatch queue -- only host readback does. Without this
    the fit cost bleeds into whatever phase reads back first."""
    for leaf in jax.tree_util.tree_leaves(x):
        np.asarray(leaf[..., :1])
    return x


def mem_report(tag: str) -> None:
    """One line of allocator truth: what the chip says it holds."""
    try:
        stats = jax.local_devices()[0].memory_stats() or {}

        def gib(k):
            return stats.get(k, 0) / 2**30

        print(f"[mem {tag}] in_use={gib('bytes_in_use'):.2f} "
              f"peak={gib('peak_bytes_in_use'):.2f} "
              f"limit={gib('bytes_limit'):.2f} "
              f"largest_alloc={gib('largest_alloc_size'):.2f} GiB",
              flush=True)
    except Exception as e:  # stats API varies by backend
        print(f"[mem {tag}] unavailable: {e}", flush=True)


def dump_live_arrays(top: int = 20) -> None:
    """The biggest live jax.Arrays and where they live (HBM vs host):
    the OOM diagnostic that tells resident state from dispatch temps."""
    try:
        arrs = sorted(jax.live_arrays(),
                      key=lambda a: -(a.size * a.dtype.itemsize))
        for a in arrs[:top]:
            kind = getattr(a.sharding, "memory_kind", "?")
            print(f"  live {str(a.shape):>18} {str(a.dtype):>9} "
                  f"{a.size * a.dtype.itemsize / 2**30:7.3f} GiB  {kind}",
                  flush=True)
        rest = sum(a.size * a.dtype.itemsize for a in arrs[top:])
        print(f"  ... +{len(arrs) - top} more arrays, "
              f"{rest / 2**30:.3f} GiB", flush=True)
    except Exception as e:
        print(f"  live-array dump unavailable: {e}", flush=True)


def main():
    enable_compilation_cache()
    n_train = int(sys.argv[1]) if len(sys.argv) > 1 else 31744
    n_test = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    feature_dtype = sys.argv[3] if len(sys.argv) > 3 else "float32"
    resume_dir = sys.argv[4] if len(sys.argv) > 4 else None
    fit_kwargs = {}
    if resume_dir:
        import os

        os.makedirs(resume_dir, exist_ok=True)
        fit_kwargs = {
            "graph_cache_path": os.path.join(resume_dir, "graphs.npz"),
            "progress_path": os.path.join(resume_dir, "layout.npz"),
            "resume": True,
            "verbose": True,
        }

    import jax.numpy as jnp

    gen_kwargs = {}
    if feature_dtype == "bfloat16":
        # Chunked bf16 generation: the f32 draw transient stays at
        # row_chunk x 4096 instead of n_train x 4096.
        gen_kwargs = {"dtype": jnp.bfloat16, "row_chunk": 65536}

    cfg = Config()  # canonical reference CLI defaults
    train = clustered_modalities_device(n_train, dims=(768, 4096),
                                        n_clusters=256, seed=0,
                                        centers_seed=0, **gen_kwargs)
    test = clustered_modalities_device(n_test, dims=(768, 4096),
                                       n_clusters=256, seed=1,
                                       centers_seed=0)
    sync(list(train.values()) + list(test.values()))

    t0 = time.perf_counter()
    # Pay the eval programs' first-call costs (tracing + compile-cache
    # load) on a background thread while fit keeps the device busy.
    # Returns None (skipped) on CPU or under MMUMAP_PREWARM=0.
    prewarm = None
    if feature_dtype == "float32":
        # bf16 runs skip the prewarm (conservatively): prewarm now
        # forges dtype-correct state (eval/prewarm.py feature_dtype),
        # but its forged embeds + warm-up dispatches race the fit on a
        # chip whose HBM headroom at the beyond-f32 scales bf16 serves
        # is exactly what the run is spending. ~10 s of first-call eval
        # cost is the accepted trade at 524k+.
        prewarm = start_eval_prewarm(
            n_train=n_train, dims=(768, 4096), cfg=cfg, q_main=n_test,
            q_recon=16, k_test=1,
            data_arrays=[train[k] for k in train],
        )
    model = MultimodalUMAP(cfg.k_neighbors, cfg.out_dim, cfg.min_dist,
                           num_encoders=2, feature_dtype=feature_dtype)
    # Hand table ownership to the model (pop + rvalue list): past the
    # offload threshold fit parks the tables in host memory during the
    # layout phase, which only frees HBM if no caller reference pins
    # the device buffers. The prewarm thread aliases the tables too
    # (f32 runs only) but releases them as soon as its warm calls
    # finish -- within the graph phase, before the layout offload
    # (eval/prewarm.py, ADVICE r3 item 1); eval below touches only
    # `test` and model state.
    mem_report("pre-fit")
    try:
        model.fit([train.pop(k) for k in list(train)],
                  epochs=cfg.train_epochs,
                  num_rep=cfg.num_rep, lr=cfg.lr, alpha=cfg.alpha,
                  batch_size=cfg.batch_size, **fit_kwargs)
    except Exception:
        # OOM forensics: allocator state + the biggest live buffers
        # (the traceback pins the failing frame's arrays live, so the
        # dump distinguishes resident state from dispatch temps).
        mem_report("at-failure")
        dump_live_arrays()
        raise
    mem_report("post-fit")
    sync(model.embeds)
    t_fit = time.perf_counter() - t0
    print(f"fit: {t_fit:.1f}s  phases: "
          f"{ {k: round(v, 1) for k, v in model.timer.report().items()} }",
          flush=True)

    if prewarm is not None:
        prewarm.join()
    t1 = time.perf_counter()
    sim = similarity_test(test, cfg, model=model, return_values=True)
    t_sim = time.perf_counter() - t1
    acc = knn_test(test, cfg, k=1, model=model, return_values=True)
    t_knn = time.perf_counter() - t1 - t_sim
    recons = embed_and_recon(model, [test["texts"][:16]], [0], [1], cfg)
    mse = float(np.mean(
        (np.asarray(recons[0]) - np.asarray(test["images"][:16])) ** 2
    ))
    t_eval = time.perf_counter() - t1
    print(f"eval split: similarity {t_sim:.1f}s, knn_test {t_knn:.1f}s, "
          f"recon {t_eval - t_sim - t_knn:.1f}s", flush=True)

    total = time.perf_counter() - t0
    print(f"eval: {t_eval:.1f}s  (cosine {sim:.4f}, knn@1 {acc:.4f}, "
          f"recon MSE {mse:.4f})", flush=True)
    print(f"END-TO-END: {total:.1f}s "
          f"({'PASS' if total < 300 else 'MISS'} vs 5-min north star)",
          flush=True)


if __name__ == "__main__":
    main()
