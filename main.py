"""Cross-modal UMAP mixture experiments -- CLI driver.

Flag surface mirrors the reference CLI (reference main.py:10-33; the
CLI defaults are the canonical experiment configuration, SURVEY.md
§2.10f), with TPU-native additions:
  --synthetic       run on generated clustered data (no network),
  --n_samples       synthetic dataset size,
  --mesh_devices    data-parallel mesh size (0 = all devices),
  --seed            PRNG seed.

``--log_dir`` is honored (per-phase JSONL loss logs), unlike the
reference where it is parsed but dead (SURVEY.md §2.10g).
"""

import argparse

import numpy as np

from multimodal_umap_tpu import Config, MultimodalUMAP
from multimodal_umap_tpu.app import crossmodal_recon
from multimodal_umap_tpu.data import clustered_modalities, load_data
from multimodal_umap_tpu.eval import knn_test, similarity_test, train
from multimodal_umap_tpu.parallel import create_mesh
from multimodal_umap_tpu.utils.logging import write_loss_log


def init_parser() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Cross-modal UMAP Mixture Model Experiments (TPU-native)"
    )
    parser.add_argument("--k_neighbors", type=int, default=15,
                        help="Number of neighbors for UMAP")
    parser.add_argument("--out_dim", type=int, default=64,
                        help="Output embedding dimension")
    parser.add_argument("--min_dist", type=float, default=0.1,
                        help="Minimum distance for UMAP")

    parser.add_argument("--train_epochs", type=int, default=600,
                        help="Number of training epochs")
    parser.add_argument("--num_rep", type=int, default=8,
                        help="Number of repulsive points for UMAP")
    parser.add_argument("--lr", type=float, default=0.01,
                        help="Learning rate")
    parser.add_argument("--alpha", type=float, default=1.0,
                        help="Cross-modal alignment weight")
    parser.add_argument("--batch_size", type=int, default=256,
                        help="Batch size")
    parser.add_argument("--log_dir", type=str, default=None,
                        help="Directory to log training losses")

    parser.add_argument("--test_epochs", type=int, default=120,
                        help="Number of testing epochs")
    parser.add_argument("--k_test", type=int, default=1,
                        help="Number of neighbors for k-NN test")
    parser.add_argument("--crossmodal", type=str, default="yes",
                        choices=["yes", "no"],
                        help="Whether to save cross-modal reconstructions")

    parser.add_argument("--load_pretrained", type=str, default="no",
                        choices=["yes", "no"],
                        help="Whether to load a pretrained model")
    parser.add_argument("--save_path", type=str,
                        default="models/flickr30k.npz",
                        help="Path to save the trained model")

    parser.add_argument("--synthetic", action="store_true",
                        help="Use synthetic clustered data (offline)")
    parser.add_argument("--n_samples", type=int, default=2000,
                        help="Synthetic dataset size")
    parser.add_argument("--mesh_devices", type=int, default=0,
                        help="Data-parallel mesh size (0 = all devices)")
    parser.add_argument("--seed", type=int, default=0, help="PRNG seed")
    parser.add_argument("--spectral", type=str, default="auto",
                        choices=["auto", "dense", "lobpcg", "chebyshev"],
                        help="Spectral initializer (ops/spectral.py)")
    parser.add_argument("--knn_engine", type=str, default="auto",
                        choices=["auto", "bf16", "xla", "pallas",
                                 "approx", "stream"],
                        help="kNN engine (ops/knn.py; auto = backend "
                             "default: bf16 on TPU, xla on CPU)")
    parser.add_argument("--feature_dtype", type=str, default="float32",
                        choices=["float32", "bfloat16"],
                        help="Feature-table storage dtype (bfloat16 "
                             "halves HBM; exact re-scored distances)")
    parser.add_argument("--progress_path", type=str, default=None,
                        help="Preemption-recovery snapshot file (npz); "
                             "combine with --resume to continue a run")
    parser.add_argument("--resume", action="store_true",
                        help="Resume fit from --progress_path")
    parser.add_argument("--graph_cache", type=str, default=None,
                        help="Graph-stage snapshot: a retried fit skips "
                             "the kNN sweep + spectral init")
    return parser.parse_args()


def main() -> None:
    from multimodal_umap_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    args = init_parser()
    cfg = Config(
        k_neighbors=args.k_neighbors,
        out_dim=args.out_dim,
        min_dist=args.min_dist,
        train_epochs=args.train_epochs,
        num_rep=args.num_rep,
        lr=args.lr,
        alpha=args.alpha,
        batch_size=args.batch_size,
        test_epochs=args.test_epochs,
        log_dir=args.log_dir,
        seed=args.seed,
        spectral_method=args.spectral,
        knn_engine=None if args.knn_engine == "auto" else args.knn_engine,
        feature_dtype=args.feature_dtype,
        progress_path=args.progress_path,
        resume=args.resume,
        graph_cache_path=args.graph_cache,
    )

    if args.synthetic:
        n_test = max(16, args.n_samples // 10)
        train_split = clustered_modalities(
            args.n_samples, dims=(768, 4096), seed=args.seed,
            centers_seed=args.seed,
        )
        # Same cluster geometry, fresh samples: the test split must lie
        # on the train manifold for out-of-sample eval to be meaningful.
        test_split = clustered_modalities(
            n_test, dims=(768, 4096), seed=args.seed + 1,
            centers_seed=args.seed,
        )
    mesh = create_mesh(args.mesh_devices or None)
    if mesh.devices.size == 1:
        mesh = None  # single device: skip sharding machinery

    if not args.synthetic:
        # Mesh runs extract BERT/VAE features data-parallel over the
        # batch axis (data/flickr30k.py:extract_features).
        train_split = load_data(split="train", mesh=mesh)
        test_split = load_data(split="test", mesh=mesh)

    prewarm = None
    if args.load_pretrained == "yes":
        model = MultimodalUMAP.load_state_dict(args.save_path)
    else:
        # Warm the eval executables on a background thread while fit
        # keeps the device busy (eval/prewarm.py; returns None --
        # skipped -- on CPU or under MMUMAP_PREWARM=0). Mesh runs pass
        # the mesh so the forged state carries the run's shardings
        # (VERDICT r2 next-step 7). bfloat16 runs skip it: the worker
        # uploads a second full bf16 copy of every modality table next
        # to fit's working set, and HBM headroom at the beyond-f32
        # scales bf16 serves is exactly what the run is spending (same
        # gate as tools/run_flickr_scale_e2e.py).
        if args.feature_dtype == "float32":
            from multimodal_umap_tpu.eval import start_eval_prewarm

            keys = list(train_split)
            prewarm = start_eval_prewarm(
                n_train=int(train_split[keys[0]].shape[0]),
                dims=tuple(int(train_split[k].shape[1]) for k in keys),
                cfg=cfg,
                q_main=int(test_split[keys[0]].shape[0]),
                q_recon=16,
                k_test=args.k_test,
                data_arrays=[train_split[k] for k in keys],
                mesh=mesh,
                feature_dtype=args.feature_dtype,
            )
        model = train(train_split, cfg, mesh=mesh, verbose=True)
        write_loss_log(cfg.log_dir, "fit", model.loss_history["fit"])

    if args.save_path is not None:
        model.save_state_dict(args.save_path)

    if prewarm is not None:
        prewarm.join()
    sim = similarity_test(test_split, cfg, model=model, return_values=True)
    write_loss_log(cfg.log_dir, "transform",
                   model.loss_history.get("transform", []))
    acc = knn_test(test_split, cfg, k=args.k_test, model=model,
                   return_values=True)
    if cfg.log_dir is not None:
        import json
        import os

        os.makedirs(cfg.log_dir, exist_ok=True)
        from multimodal_umap_tpu.ops.knn import resolve_engine

        with open(os.path.join(cfg.log_dir, "metrics.json"), "w") as f:
            json.dump({"cosine_similarity": sim,
                       f"knn_accuracy@{args.k_test}": acc,
                       "knn_engine": resolve_engine(cfg.knn_engine),
                       "spectral_method": cfg.spectral_method,
                       "mesh_devices": 1 if mesh is None
                       else int(mesh.devices.size)}, f, indent=2)

    if args.crossmodal == "yes":
        rng = np.random.default_rng(args.seed)
        keys = list(test_split)
        indices = rng.permutation(test_split[keys[0]].shape[0])[:16]
        samples = [np.asarray(test_split[k])[indices] for k in keys]
        crossmodal_recon(samples, cfg, model=model)
        write_loss_log(cfg.log_dir, "invert",
                       model.loss_history.get("invert", []))


if __name__ == "__main__":
    main()
