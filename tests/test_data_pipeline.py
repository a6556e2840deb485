"""Data pipeline plumbing (offline): batching, first-caption rule,
preprocessing, caching -- with stub encoders standing in for BERT/VAE."""

import numpy as np
import pytest

from multimodal_umap_tpu.data.flickr30k import (
    Encoders,
    extract_features,
    load_cached,
    load_data,
    preprocess_image,
)


def _stub_encoders(calls):
    def encode_texts(texts):
        calls.append(("text", len(texts)))
        # Hash each caption into a 4-d feature for traceability.
        return np.stack([
            np.full(4, float(len(t)), dtype=np.float32) for t in texts
        ])

    def encode_images(pixels):
        calls.append(("image", pixels.shape[0]))
        assert pixels.shape[1:] == (256, 256, 3)
        return pixels.reshape(pixels.shape[0], -1)[:, :6].astype(np.float32)

    return Encoders(encode_texts=encode_texts, encode_images=encode_images)


def _samples(n, rng):
    for i in range(n):
        yield {
            "alt_text": [f"caption {'x' * (i % 5)}", "IGNORED second caption"],
            "image": rng.integers(0, 255, size=(37, 41, 3)).astype(np.uint8),
        }


def test_extract_batches_and_first_caption(rng):
    calls = []
    out = extract_features(_samples(10, rng), _stub_encoders(calls),
                           batch_size=4)
    assert out["texts"].shape == (10, 4)
    assert out["images"].shape == (10, 6)
    # 4 + 4 + 2 (remainder flush)
    assert calls == [("text", 4), ("image", 4), ("text", 4), ("image", 4),
                     ("text", 2), ("image", 2)]
    # First caption only: feature encodes caption length 8 + (i % 5).
    assert out["texts"][0, 0] == len("caption ")


def test_extract_features_mesh_matches_single_device(rng):
    """Mesh-sharded extraction (VERDICT r2 next-step 6): batches run
    data-parallel over the 8-device mesh, the final partial batch is
    padded to the compiled batch shape, and per-sample features are
    identical to the single-device path."""
    import jax

    from multimodal_umap_tpu.data.flickr30k import _batch_placer
    from multimodal_umap_tpu.parallel import create_mesh

    mesh = create_mesh()
    rows = _batch_placer(mesh)
    proj = np.asarray(
        np.random.default_rng(7).normal(size=(256 * 256 * 3, 6)),
        dtype=np.float32,
    )

    @jax.jit
    def image_forward(px):
        return px.reshape(px.shape[0], -1) @ proj

    seen_shardings = []

    def make_encoders(place):
        def encode_texts(texts):
            return np.stack([
                np.full(4, float(len(t)), dtype=np.float32) for t in texts
            ])

        def encode_images(pixels):
            placed = place(np.asarray(pixels))
            if hasattr(placed, "sharding"):
                seen_shardings.append(placed.sharding)
            return np.asarray(image_forward(placed))

        return Encoders(encode_texts=encode_texts,
                        encode_images=encode_images)

    # 21 samples, batch 8: mesh path pads the final 5-row batch to 8.
    # Fresh identically-seeded generators: both paths see the same data.
    single = extract_features(
        _samples(21, np.random.default_rng(3)),
        make_encoders(lambda x: x), batch_size=8,
    )
    sharded = extract_features(
        _samples(21, np.random.default_rng(3)),
        make_encoders(rows), batch_size=8, mesh=mesh,
    )
    assert sharded["texts"].shape == (21, 4)
    assert sharded["images"].shape == (21, 6)
    np.testing.assert_allclose(sharded["texts"], single["texts"])
    # f32 accumulation order differs across device placements; the
    # 196k-long reductions here carry ~1e-3 absolute noise (measured).
    np.testing.assert_allclose(sharded["images"], single["images"],
                               rtol=1e-3, atol=5e-3)
    # Every mesh-path forward really ran on a batch sharded over the
    # 8-device data axis.
    assert len(seen_shardings) == 3
    for s in seen_shardings:
        assert not s.is_fully_replicated
        assert s.num_devices == 8

    with pytest.raises(ValueError, match="not divisible"):
        extract_features(_samples(4, np.random.default_rng(0)),
                         make_encoders(rows), batch_size=4, mesh=mesh)


def test_preprocess_image_range(rng):
    img = rng.integers(0, 255, size=(100, 80, 3)).astype(np.uint8)
    processed = preprocess_image(img)
    assert processed.shape == (256, 256, 3)
    assert processed.min() >= -1.0 - 1e-5
    assert processed.max() <= 1.0 + 1e-5


def test_load_data_caches(rng, tmp_path, monkeypatch):
    calls = []
    encoders = _stub_encoders(calls)

    import multimodal_umap_tpu.data.flickr30k as fl

    def fake_load_dataset(name, split, streaming):
        assert name == "AnyModal/flickr30k"
        return _samples(6, rng)

    import datasets
    monkeypatch.setattr(datasets, "load_dataset", fake_load_dataset)

    cache = str(tmp_path / "cache")
    out = fl.load_data("train", cache_dir=cache, batch_size=4,
                       encoders=encoders)
    assert out["texts"].shape == (6, 4)
    # Second call must hit the npz cache (no new encoder calls).
    n_calls = len(calls)
    again = fl.load_data("train", cache_dir=cache, batch_size=4,
                         encoders=encoders)
    assert len(calls) == n_calls
    np.testing.assert_array_equal(again["texts"], out["texts"])
    assert load_cached("train", cache) is not None


def test_load_data_offline_error(tmp_path):
    with pytest.raises(RuntimeError, match="synthetic"):
        load_data("train", cache_dir=str(tmp_path / "nope"))
