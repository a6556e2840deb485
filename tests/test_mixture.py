"""End-to-end model tests: fit, transform, inverse_transform, and the
checkpoint round-trip, on small clustered synthetic data."""

import os

import numpy as np
import pytest

from multimodal_umap_tpu.models.mixture import MultimodalUMAP


@pytest.fixture(scope="module")
def fitted(blobs):
    x0, x1, labels = blobs
    model = MultimodalUMAP(
        k_neighbors=10, out_dim=4, min_dist=0.1, num_encoders=2
    )
    model.fit([x0, x1], epochs=150, num_rep=4, lr=0.05, alpha=0.5,
              batch_size=64)
    return model, x0, x1, labels


def test_fit_shapes_and_loss(fitted):
    model, x0, x1, _ = fitted
    assert len(model.embeds) == 2
    assert model.embeds[0].shape == (x0.shape[0], 4)
    assert model.embeds[1].shape == (x1.shape[0], 4)
    hist = model.loss_history["fit"]
    assert np.all(np.isfinite(hist))
    # Layout optimization should make clear progress.
    assert hist[-10:].mean() < hist[:10].mean()


def test_fit_separates_clusters(fitted):
    """Points sharing a cluster should be latent-closer than strangers."""
    model, _, _, labels = fitted
    emb = np.asarray(model.embeds[0])
    d = np.linalg.norm(emb[:, None] - emb[None, :], axis=2)
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(labels), dtype=bool)
    intra = d[same & off_diag].mean()
    inter = d[~same].mean()
    assert intra < 0.5 * inter, (intra, inter)


def test_transform_lands_near_cluster(fitted):
    """Transforming training rows back should land near their own
    fitted embeddings' clusters."""
    model, x0, _, labels = fitted
    queries = x0[:24]
    out = model.transform([queries], epochs=40, data_indices=[0],
                          num_rep=4, lr=0.05, batch_size=64)
    q_emb = np.asarray(out[0])
    assert q_emb.shape == (24, 4)
    train_emb = np.asarray(model.embeds[0])
    # Nearest fitted neighbor of each query should share its cluster.
    d = np.linalg.norm(q_emb[:, None] - train_emb[None, :], axis=2)
    nearest = d.argmin(axis=1)
    agree = (labels[nearest] == labels[:24]).mean()
    assert agree > 0.8, agree


def test_inverse_transform_reconstructs(fitted):
    """Invert (fixed semantics, SURVEY.md §2.10a): reconstructions of
    fitted embeddings should be closer to their own source rows than a
    shuffled baseline."""
    model, x0, _, _ = fitted
    z = np.asarray(model.embeds[0][:16])
    recon = np.asarray(
        model.inverse_transform([z], epochs=40, data_indices=[0],
                                num_rep=4, lr=0.05, batch_size=64)[0]
    )
    assert recon.shape == (16, x0.shape[1])
    assert np.all(np.isfinite(recon))
    mse = np.mean((recon - x0[:16]) ** 2)
    shuffled_mse = np.mean((recon - x0[16:32]) ** 2)
    assert mse < shuffled_mse, (mse, shuffled_mse)


def test_checkpoint_roundtrip(fitted, tmp_path):
    model, x0, _, _ = fitted
    path = os.path.join(tmp_path, "ckpt", "model.npz")
    model.save_state_dict(path)
    restored = MultimodalUMAP.load_state_dict(path)

    assert restored.k_neighbors == model.k_neighbors
    assert restored.out_dim == model.out_dim
    assert abs(restored.a - model.a) < 1e-6
    np.testing.assert_array_equal(
        np.asarray(restored.embeds[0]), np.asarray(model.embeds[0])
    )
    np.testing.assert_array_equal(
        np.asarray(restored.data[1]), np.asarray(model.data[1])
    )
    np.testing.assert_array_equal(
        np.asarray(restored.graphs[0].rows), np.asarray(model.graphs[0].rows)
    )
    # The restored model must support transform without refitting.
    out = restored.transform([x0[:4]], epochs=5, data_indices=[0],
                             num_rep=2, lr=0.05, batch_size=64)
    assert np.asarray(out[0]).shape == (4, model.out_dim)


def test_unfitted_transform_raises():
    model = MultimodalUMAP(k_neighbors=5, out_dim=2, min_dist=0.1,
                           num_encoders=1)
    with pytest.raises(RuntimeError):
        model.transform([np.zeros((3, 8), np.float32)], epochs=1)


def test_transform_invert_verbose(blobs, capsys):
    """transform/inverse_transform honor verbose (the reference shows
    live loss in ALL modes, impl/model.py:405,478-479)."""
    x0, x1, _ = blobs
    model = MultimodalUMAP(8, 4, 0.1, num_encoders=2)
    model.fit([x0, x1], epochs=10, num_rep=2, lr=0.05, batch_size=64)
    capsys.readouterr()
    out = model.transform([x0[:16]], epochs=5, data_indices=[0],
                          num_rep=2, lr=0.05, batch_size=64, verbose=True)
    text = capsys.readouterr().out
    assert "transform epoch 5/5" in text
    model.inverse_transform([out[0]], epochs=5, data_indices=[0],
                            num_rep=2, lr=0.05, batch_size=64, verbose=True)
    text = capsys.readouterr().out
    assert "invert epoch 5/5" in text


def test_spectral_method_knob(rng):
    """spectral_method flows Config -> model -> encoders -> fit."""
    x0 = rng.normal(size=(120, 12)).astype(np.float32)
    x1 = rng.normal(size=(120, 10)).astype(np.float32)
    model = MultimodalUMAP(6, 4, 0.1, num_encoders=2,
                           spectral_method="chebyshev")
    assert all(e.spectral_method == "chebyshev" for e in model.encoders)
    model.fit([x0, x1], epochs=5, num_rep=2, lr=0.05, batch_size=64)
    assert model.embeds[0].shape == (120, 4)

    from multimodal_umap_tpu import Config

    assert Config(spectral_method="lobpcg").spectral_method == "lobpcg"


def test_feature_dtype_bf16_full_lifecycle(blobs, tmp_path):
    """bf16 feature storage (the beyond-HBM enabler: a 1M x 4096 f32
    table is 16.8 GB > one v5e's HBM). Tables are stored bfloat16,
    the kNN engine ranks bf16 + re-scores exactly w.r.t. the stored
    values, and every downstream consumer (transform, invert,
    checkpoint) handles the dtype; graph/layout math stays f32."""
    import jax.numpy as jnp

    x0, x1, labels = blobs
    model = MultimodalUMAP(10, 4, 0.1, num_encoders=2,
                           feature_dtype="bfloat16")
    model.fit([x0, x1], epochs=60, num_rep=4, lr=0.05, alpha=0.5,
              batch_size=64)
    assert all(d.dtype == jnp.bfloat16 for d in model.data)
    assert all(e.dtype == jnp.float32 for e in model.embeds)
    assert np.all(np.isfinite(model.loss_history["fit"]))

    # Quality survives the storage cast: same-cluster rows stay closer.
    emb = np.asarray(model.embeds[0])
    d = np.linalg.norm(emb[:, None] - emb[None, :], axis=2)
    same = labels[:, None] == labels[None, :]
    off_diag = ~np.eye(len(labels), dtype=bool)
    assert d[same & off_diag].mean() < 0.6 * d[~same].mean()

    # Out-of-sample transform against the bf16 table.
    out = model.transform([x0[:16]], epochs=20, data_indices=[0],
                          num_rep=2, lr=0.05, batch_size=64)
    assert out[0].dtype == jnp.float32
    assert np.all(np.isfinite(np.asarray(out[0])))

    # Invert path: init + losses against the bf16 data table, f32 out.
    rec = model.inverse_transform([out[0]], epochs=20, data_indices=[0],
                                  num_rep=2, lr=0.05, batch_size=64)
    assert rec[0].dtype == jnp.float32
    assert rec[0].shape == (16, x0.shape[1])
    assert np.all(np.isfinite(np.asarray(rec[0])))

    # Checkpoint round-trip preserves the storage dtype (npz bit-view,
    # utils/checkpoint.py) and re-infers feature_dtype on load.
    path = str(tmp_path / "bf16_model.npz")
    model.save_state_dict(path)
    loaded = MultimodalUMAP.load_state_dict(path)
    assert loaded.feature_dtype == "bfloat16"
    assert all(d.dtype == jnp.bfloat16 for d in loaded.data)
    np.testing.assert_array_equal(
        np.asarray(loaded.data[0], dtype=np.float32),
        np.asarray(model.data[0], dtype=np.float32),
    )
    np.testing.assert_allclose(np.asarray(loaded.embeds[0]),
                               np.asarray(model.embeds[0]))


def test_feature_dtype_validation():
    with pytest.raises(ValueError, match="feature_dtype"):
        MultimodalUMAP(5, 2, 0.1, num_encoders=1, feature_dtype="fp8")


def test_feature_offload_lifecycle(blobs, monkeypatch, tmp_path):
    """Beyond-HBM fits park the feature tables on host for the layout
    phase (mixture._offload_features); transform/invert re-upload
    lazily and the checkpoint still persists the tables. Exercised by
    dropping the byte threshold to zero."""
    import jax
    import jax.numpy as jnp

    from multimodal_umap_tpu.models import mixture as MX

    monkeypatch.setattr(MX, "_DATA_OFFLOAD_BYTES", 0)
    x0, x1, labels = blobs
    model = MultimodalUMAP(10, 4, 0.1, num_encoders=2)
    model.fit([x0, x1], epochs=60, num_rep=4, lr=0.05, alpha=0.5,
              batch_size=64)
    # Tables were offloaded after the graph phase: either moved into
    # the backend's host memory space (server-side device_put) or read
    # back to numpy where no such space exists.
    def offloaded(x):
        if not isinstance(x, jax.Array):
            return True
        dev = next(iter(x.devices()))
        return x.sharding.memory_kind != dev.default_memory().kind

    assert all(offloaded(d) for d in model.data)
    assert np.all(np.isfinite(model.loss_history["fit"]))

    # transform re-uploads lazily and caches the device copy back.
    out = model.transform([x0[:16]], epochs=20, data_indices=[0],
                          num_rep=2, lr=0.05, batch_size=64)
    assert isinstance(model.data[0], jax.Array)
    assert not offloaded(model.data[0])
    assert np.all(np.isfinite(np.asarray(out[0])))

    rec = model.inverse_transform([out[0]], epochs=20, data_indices=[0],
                                  num_rep=2, lr=0.05, batch_size=64)
    assert rec[0].shape == (16, x0.shape[1])
    assert np.all(np.isfinite(np.asarray(rec[0])))

    # Checkpoint round-trip works from host-resident tables too.
    path = str(tmp_path / "offload_model.npz")
    model.save_state_dict(path)
    loaded = MultimodalUMAP.load_state_dict(path)
    np.testing.assert_allclose(
        np.asarray(loaded.data[1], dtype=np.float32),
        np.asarray(model.data[1], dtype=np.float32),
    )
    assert loaded.embeds[0].dtype == jnp.float32


def test_no_device_table_pinned_at_layout_entry(blobs, monkeypatch):
    """No fit-internal reference may pin a feature table's DEVICE
    buffer once the layout phase starts.

    Regression test for the 1M-rung OOM (2026-08-20 .ladder try-1
    forensics): the graph-build loop's ``feats`` variable outlived the
    loop, keeping the last modality's 8 GiB bf16 device table live
    through all 600 layout epochs even though _offload_features had
    already staged host copies. Observed here by spying on
    mixture.train_layout: at fit's layout entry, with offload forced,
    zero live jax.Arrays may still carry a feature-table shape (the
    CPU offload fallback reads tables back to numpy, so a surviving
    device buffer can only be a leaked reference).
    """
    import gc

    import jax

    from multimodal_umap_tpu.models import mixture as MX

    monkeypatch.setattr(MX, "_DATA_OFFLOAD_BYTES", 0)
    x0, x1, _ = blobs
    table_shapes = {x0.shape, x1.shape}
    pinned = {}
    real_train_layout = MX.train_layout

    def in_default_memory(a):
        dev = next(iter(a.devices()))
        default_kind = dev.default_memory().kind
        return getattr(a.sharding, "memory_kind",
                       default_kind) == default_kind

    def spy(*args, **kwargs):
        if "n" not in pinned:  # fit's call only
            gc.collect()
            pinned["n"] = sum(
                a.shape in table_shapes and not a.is_deleted()
                and in_default_memory(a)
                for a in jax.live_arrays()
            )
        return real_train_layout(*args, **kwargs)

    monkeypatch.setattr(MX, "train_layout", spy)
    model = MultimodalUMAP(10, 4, 0.1, num_encoders=2)
    model.fit([x0, x1], epochs=12, num_rep=4, lr=0.05, alpha=0.5,
              batch_size=64)
    assert pinned["n"] == 0, (
        f"{pinned['n']} feature-table device buffer(s) still live at "
        f"layout entry -- a fit-internal reference leak")
