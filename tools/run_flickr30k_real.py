"""One-command real-flickr30k integration run (network-gated).

The last surface unexercisable in a zero-egress environment is the real
dataset + real pretrained weights. This script makes that validation a
single command the moment egress exists (VERDICT r2 next-step 5):

    download -> extract features (stat-gated) -> fit -> eval -> recon

mirroring the reference experiment driver (reference main.py:49-66,
impl/dataset.py:9-69) on the TPU-native stack. Offline it FAILS FAST
with the documented story (cached features still work; otherwise use
``main.py --synthetic``).

Usage:
    python -u tools/run_flickr30k_real.py              # full 31k run
    python -u tools/run_flickr30k_real.py --limit 256  # smoke mode
    python -u tools/run_flickr30k_real.py --mesh 8     # data-parallel
                                                       # extraction+fit

Feature-stat gates (committed expectations, checked after extraction;
loose enough for dataset revisions, tight enough to catch a broken
pipeline -- wrong caption field, un-normalized pixels, sampled instead
of mean latents):
  * texts  (N, 768): BERT-base pooler_output is tanh-bounded, so every
    value lies in [-1, 1] and the per-feature std is > 0.05 for most
    dims (a constant/garbage extraction fails this).
  * images (N, 4096): sd-vae-ft-mse posterior means; elementwise std
    in [2, 12] (the SD scale factor 0.18215 targets unit-variance
    SCALED latents, so raw latents sit near 1/0.18215 ~ 5.5).
  * row counts equal across modalities; no NaN/Inf anywhere.
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def parse_args() -> argparse.Namespace:
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--limit", type=int, default=0,
                   help="per-split sample cap (0 = full dataset); smoke "
                        "mode: --limit 256")
    p.add_argument("--cache_dir", type=str, default="data",
                   help="feature cache directory (npz per split)")
    p.add_argument("--save_path", type=str, default="models/flickr30k_real",
                   help="model checkpoint path")
    p.add_argument("--out_dir", type=str, default="results_real",
                   help="metrics + reconstruction output directory")
    p.add_argument("--mesh", type=int, default=0,
                   help="devices for data-parallel extraction + fit "
                        "(0 = single device)")
    p.add_argument("--extract_batch", type=int, default=64,
                   help="feature-extraction batch size")
    p.add_argument("--k_test", type=int, default=1)
    p.add_argument("--knn_engine", type=str, default=None,
                   help="kNN engine override (ops/knn.py: bf16, xla, "
                        "stream, approx, pallas)")
    return p.parse_args()


def check_feature_stats(name: str, data: dict) -> dict:
    """Validates extracted features against the committed expectations
    (module docstring); returns the measured stats for metrics.json."""
    texts, images = data["texts"], data["images"]
    stats = {
        "n": int(texts.shape[0]),
        "text_dim": int(texts.shape[1]),
        "image_dim": int(images.shape[1]),
        "text_min": float(texts.min()),
        "text_max": float(texts.max()),
        "text_feature_std_median": float(np.median(texts.std(axis=0))),
        "image_std": float(images.std()),
        "image_mean_abs": float(np.abs(images).mean()),
    }
    problems = []
    if texts.shape[0] != images.shape[0]:
        problems.append(
            f"row mismatch: {texts.shape[0]} texts vs "
            f"{images.shape[0]} images")
    if texts.shape[1] != 768:
        problems.append(f"text dim {texts.shape[1]} != 768 (BERT pooler)")
    if images.shape[1] != 4096:
        problems.append(f"image dim {images.shape[1]} != 4096 (4x32x32)")
    for arr, label in ((texts, "texts"), (images, "images")):
        if not np.isfinite(arr).all():
            problems.append(f"{label} contain NaN/Inf")
    if stats["text_min"] < -1.001 or stats["text_max"] > 1.001:
        problems.append(
            f"text features outside tanh range "
            f"[{stats['text_min']:.3f}, {stats['text_max']:.3f}] -- "
            f"wrong BERT output head?")
    if stats["text_feature_std_median"] < 0.05:
        problems.append(
            f"text feature std median {stats['text_feature_std_median']:.4f}"
            f" < 0.05 -- constant/garbage captions?")
    if not (2.0 <= stats["image_std"] <= 12.0):
        problems.append(
            f"image latent std {stats['image_std']:.2f} outside [2, 12] "
            f"-- un-normalized pixels or scaled latents?")
    if problems:
        raise SystemExit(
            f"[{name}] extracted features failed the committed stat "
            f"gates:\n  - " + "\n  - ".join(problems))
    print(f"[{name}] feature stats OK: {json.dumps(stats)}", flush=True)
    return stats


def main() -> None:
    args = parse_args()

    import jax

    from multimodal_umap_tpu import Config
    from multimodal_umap_tpu.app import crossmodal_recon
    from multimodal_umap_tpu.data.flickr30k import (
        cache_path,
        extract_features,
        load_cached,
        load_hf_encoders,
    )
    from multimodal_umap_tpu.eval import knn_test, similarity_test
    from multimodal_umap_tpu.eval.validation import train
    from multimodal_umap_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    mesh = None
    if args.mesh:
        from multimodal_umap_tpu.parallel import create_mesh

        mesh = create_mesh(args.mesh)

    cfg = Config()  # canonical reference CLI defaults (SURVEY §2.10f)
    if args.knn_engine:
        cfg.knn_engine = args.knn_engine
    tag = f"_limit{args.limit}" if args.limit else ""

    # ---- download + extract (or reuse the committed cache) ----------
    splits: dict[str, dict] = {}
    encoders = None
    for split in ("train", "test"):
        cached = load_cached(split + tag, args.cache_dir)
        if cached is not None:
            print(f"[{split}] cache hit: "
                  f"{cache_path(split + tag, args.cache_dir)}", flush=True)
            splits[split] = cached
            continue
        try:
            from datasets import load_dataset

            stream = load_dataset("AnyModal/flickr30k", split=split,
                                  streaming=True)
            if args.limit:
                stream = itertools.islice(stream, args.limit)
            if encoders is None:
                t0 = time.perf_counter()
                encoders = load_hf_encoders(mesh=mesh)
                print(f"[weights] BERT + SD-VAE loaded in "
                      f"{time.perf_counter() - t0:.1f}s", flush=True)
            t0 = time.perf_counter()
            splits[split] = extract_features(
                stream, encoders, batch_size=args.extract_batch, mesh=mesh)
            print(f"[{split}] extracted {splits[split]['texts'].shape[0]} "
                  f"pairs in {time.perf_counter() - t0:.1f}s", flush=True)
        except Exception as exc:
            raise SystemExit(
                f"[{split}] no cached features at "
                f"{cache_path(split + tag, args.cache_dir)} and "
                f"extraction failed: {exc!r}\n"
                "This script needs network egress (HF hub) on first "
                "run. Offline: reuse a previously committed feature "
                "cache, or validate the pipeline with synthetic data "
                "via `python main.py --synthetic` (BASELINE.md)."
            ) from exc
        os.makedirs(args.cache_dir, exist_ok=True)
        np.savez(cache_path(split + tag, args.cache_dir), **splits[split])

    stats = {s: check_feature_stats(s, d) for s, d in splits.items()}

    # ---- fit -> eval -> recon (reference main.py:49-66) -------------
    t0 = time.perf_counter()
    model = train(splits["train"], cfg, mesh=mesh, verbose=True)
    t_fit = time.perf_counter() - t0
    print(f"fit: {t_fit:.1f}s  phases: "
          f"{ {k: round(v, 1) for k, v in model.timer.report().items()} }",
          flush=True)
    if args.save_path:
        model.save_state_dict(args.save_path)

    t1 = time.perf_counter()
    sim = similarity_test(splits["test"], cfg, model=model,
                          return_values=True)
    acc = knn_test(splits["test"], cfg, k=args.k_test, model=model,
                   return_values=True)

    rng = np.random.default_rng(0)
    idx = rng.permutation(splits["test"]["texts"].shape[0])[:16]
    samples = [splits["test"][k][idx] for k in ("texts", "images")]
    try:
        # Real VAE decode for the PNG pairs (reference crossmodal.py:28).
        from multimodal_umap_tpu.data.flickr30k import resolve_vae_dir
        from multimodal_umap_tpu.nn.vae import load_vae

        vae = load_vae(resolve_vae_dir())
    except Exception as exc:
        print(f"[recon] VAE decode unavailable ({exc!r}); falling back "
              f"to the offline latent dump", flush=True)
        vae = None
    recons = crossmodal_recon(samples, cfg, model=model,
                              out_dir=args.out_dir, vae=vae)
    mse = float(np.mean(
        (np.asarray(recons[0]) - np.asarray(samples[1])) ** 2))
    t_eval = time.perf_counter() - t1

    metrics = {
        "cosine": float(sim),
        f"knn@{args.k_test}": float(acc),
        "recon_mse": mse,
        "t_fit_s": round(t_fit, 1),
        "t_eval_s": round(t_eval, 1),
        "limit": args.limit,
        "mesh": args.mesh,
        "devices": jax.device_count(),
        "feature_stats": stats,
    }
    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "metrics.json"), "w") as fh:
        json.dump(metrics, fh, indent=2)
    print(json.dumps(metrics), flush=True)


if __name__ == "__main__":
    main()
