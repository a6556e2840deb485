"""Eval metrics + crossmodal app + data pipeline tests."""

import os

import numpy as np
import pytest

from multimodal_umap_tpu import Config
from multimodal_umap_tpu.app import crossmodal_recon
from multimodal_umap_tpu.data import clustered_modalities
from multimodal_umap_tpu.data.flickr30k import load_data
from multimodal_umap_tpu.eval import knn_test, similarity_test
from multimodal_umap_tpu.eval.validation import bidirectional_recall
from multimodal_umap_tpu.models.mixture import MultimodalUMAP


@pytest.fixture(scope="module")
def cfg():
    return Config(k_neighbors=8, out_dim=4, min_dist=0.1, train_epochs=100,
                  num_rep=4, lr=0.05, alpha=0.5, batch_size=64,
                  test_epochs=30)


@pytest.fixture(scope="module")
def fitted_model(cfg):
    data = clustered_modalities(160, dims=(20, 4096), n_clusters=4, seed=3)
    model = MultimodalUMAP(cfg.k_neighbors, cfg.out_dim, cfg.min_dist, 2)
    model.fit([data["texts"], data["images"]], epochs=cfg.train_epochs,
              num_rep=cfg.num_rep, lr=cfg.lr, alpha=cfg.alpha,
              batch_size=cfg.batch_size)
    return model, data


def test_bidirectional_recall_oracle():
    """Perfectly aligned embeddings give recall 1.0; disjoint ones ~0."""
    e = np.random.default_rng(0).normal(size=(50, 4)).astype(np.float32)
    assert float(bidirectional_recall(e, e, 1)) == 1.0
    far = e + 1000.0 * np.sign(e)
    assert float(bidirectional_recall(e, far, 1)) < 0.5


def test_similarity_and_knn_tests(fitted_model, cfg):
    model, data = fitted_model
    test = {k: v[:48] for k, v in data.items()}
    sim = similarity_test(test, cfg, model=model, return_values=True)
    assert -1.0 <= sim <= 1.0
    assert sim > 0.5  # clustered paired data must align
    acc = knn_test(test, cfg, k=5, model=model, return_values=True)
    assert 0.0 <= acc <= 1.0


def test_crossmodal_recon_offline(fitted_model, cfg, tmp_path):
    model, data = fitted_model
    samples = [data["texts"][:4], data["images"][:4]]
    out_dir = os.path.join(tmp_path, "results")
    recons = crossmodal_recon(samples, cfg, model=model, out_dir=out_dir)
    assert np.asarray(recons[0]).shape == (4, 4096)
    # Offline path: latents + PNG comparisons on disk.
    assert os.path.exists(os.path.join(out_dir, "recon_latents.npz"))
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 4


def test_synthetic_pairing():
    data = clustered_modalities(64, dims=(8, 12), n_clusters=4, seed=0)
    assert set(data) == {"texts", "images"}
    assert data["texts"].shape == (64, 8)
    assert data["images"].shape == (64, 12)
    assert data["texts"].dtype == np.float32


def test_load_data_cache_roundtrip(tmp_path):
    cache = os.path.join(tmp_path, "cache")
    os.makedirs(cache)
    fake = clustered_modalities(16, dims=(8, 8), seed=1)
    np.savez(os.path.join(cache, "test_data.npz"), **fake)
    loaded = load_data("test", cache_dir=cache)
    np.testing.assert_array_equal(loaded["texts"], fake["texts"])


def test_load_data_offline_error(tmp_path):
    with pytest.raises(RuntimeError, match="synthetic"):
        load_data("train", cache_dir=os.path.join(tmp_path, "nope"))


def test_crossmodal_recon_with_vae_decode(fitted_model, cfg, tmp_path):
    """The REAL decode path: a tiny random-weight native Flax VAE
    decodes (4, 32, 32) latents to (3, 64, 64) images and the app
    writes original/reconstruction PNG pairs (reference
    impl/crossmodal.py:28-35; VERDICT round 1 task 9)."""
    import jax

    from multimodal_umap_tpu.nn.vae import (
        AutoencoderKL, VAEConfig, make_loaded_vae,
    )

    tiny = VAEConfig(block_out_channels=(8, 16), layers_per_block=1,
                     latent_channels=4, norm_num_groups=4)
    module = AutoencoderKL(tiny)
    params = module.init(
        jax.random.PRNGKey(0), np.zeros((1, 64, 64, 3), np.float32)
    )["params"]
    vae = make_loaded_vae(module, params)

    model, data = fitted_model
    samples = [data["texts"][:3], data["images"][:3]]
    out_dir = os.path.join(tmp_path, "results_vae")
    recons = crossmodal_recon(samples, cfg, model=model, out_dir=out_dir,
                              latent_shape=(4, 32, 32), vae=vae)
    assert np.asarray(recons[0]).shape == (3, 4096)
    # Real decode path: PNG pairs only, no offline latent dump.
    assert not os.path.exists(os.path.join(out_dir, "recon_latents.npz"))
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 3


def test_eval_prewarm_background_thread(fitted_model, cfg):
    """The eval prewarm (eval/prewarm.py) must drive every eval program
    on shape-identical dummy state without error, and the real eval must
    still produce its deterministic values afterwards."""
    from multimodal_umap_tpu.eval import start_eval_prewarm

    model, data = fitted_model
    test = {k: v[:48] for k, v in data.items()}
    thread = start_eval_prewarm(
        n_train=160, dims=(20, 4096), cfg=cfg, q_main=48, q_recon=4,
        k_test=5, force=True,
    )
    thread.join(timeout=600)
    assert not thread.is_alive()
    assert thread.prewarm_status["error"] is None

    # Real eval after prewarm: same deterministic metric values (the
    # transform PRNG stream is seed-keyed, not cache-keyed).
    sim = similarity_test(test, cfg, model=model, return_values=True)
    assert sim > 0.5


def test_eval_prewarm_aliases_data_arrays(fitted_model, cfg):
    """data_arrays lets the prewarm alias the caller's feature tables
    (no dummy copies); the thread must still warm every program."""
    from multimodal_umap_tpu.eval import start_eval_prewarm

    model, data = fitted_model
    thread = start_eval_prewarm(
        n_train=160, dims=(20, 4096), cfg=cfg, q_main=48, q_recon=4,
        k_test=5, data_arrays=[data["texts"], data["images"]],
        force=True,
    )
    thread.join(timeout=600)
    assert not thread.is_alive()
    assert thread.prewarm_status["error"] is None


def test_eval_prewarm_under_mesh(cfg):
    """Mesh runs warm mesh-keyed executables: the forged state is placed
    with the run's ShardingPlan, so the warmed programs carry the same
    shardings the real mesh eval will use (VERDICT r2 next-step 7)."""
    from multimodal_umap_tpu.eval import start_eval_prewarm
    from multimodal_umap_tpu.parallel import create_mesh

    thread = start_eval_prewarm(
        n_train=160, dims=(20, 4096), cfg=cfg, q_main=48, q_recon=4,
        k_test=5, force=True, mesh=create_mesh(),
    )
    thread.join(timeout=600)
    assert not thread.is_alive()
    assert thread.prewarm_status["error"] is None


def test_eval_prewarm_skips_on_cpu_and_validates_data(fitted_model, cfg):
    """Without force, the CPU backend skips the prewarm entirely (the
    warm-up would contend with a host-bound fit); mismatched
    data_arrays fail fast instead of warming wrong-shape programs."""
    from multimodal_umap_tpu.eval import start_eval_prewarm

    assert start_eval_prewarm(
        n_train=160, dims=(20, 4096), cfg=cfg, q_main=48) is None

    model, data = fitted_model
    with pytest.raises(ValueError, match="wrong order or size"):
        start_eval_prewarm(
            n_train=160, dims=(20, 4096), cfg=cfg, q_main=48,
            data_arrays=[data["images"], data["texts"]],  # reversed
            force=True,
        )


def test_eval_prewarm_respects_feature_dtype(fitted_model, cfg):
    """A bfloat16 run's prewarm must forge bf16 tables: f32 forgeries
    would warm executables the real eval never calls AND materialize
    the full-size f32 copy that feature_dtype exists to avoid."""
    from multimodal_umap_tpu.eval import start_eval_prewarm

    model, data = fitted_model
    thread = start_eval_prewarm(
        n_train=160, dims=(20, 4096), cfg=cfg, q_main=48, q_recon=4,
        k_test=5, data_arrays=[data["texts"], data["images"]],
        force=True, feature_dtype="bfloat16",
    )
    thread.join(timeout=600)
    assert not thread.is_alive()
    assert thread.prewarm_status["error"] is None
    assert thread.prewarm_status["data_dtypes"] == ["bfloat16", "bfloat16"]
