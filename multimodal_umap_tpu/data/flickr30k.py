"""flickr30k feature extraction: BERT captions + SD-VAE image latents.

TPU-native counterpart of reference impl/dataset.py:9-69. Same feature
definitions (SURVEY.md §2.10k):
  * text  -- FIRST caption only, BERT-base-uncased ``pooler_output``
             (768-d);
  * image -- resize 256 -> center-crop 256 -> normalize(0.5, 0.5),
             ``stabilityai/sd-vae-ft-mse`` posterior MEAN (not a
             sample), flattened (4, 32, 32) -> 4096-d.

The torch models are replaced by their Flax counterparts running as
jit-batched JAX inference on device; batches shard over the data mesh.
Features cache to ``data/{split}_data.npz`` (the reference caches to
``.pt``). In zero-egress environments where the HF hub is unreachable
and no cache exists, ``load_data`` raises a clear error -- callers fall
back to :mod:`.synthetic`.
"""

from __future__ import annotations

import os

import numpy as np

_CACHE_DIR = "data"
_PAD_MULTIPLE = 64


def cache_path(split: str, cache_dir: str = _CACHE_DIR) -> str:
    return os.path.join(cache_dir, f"{split}_data.npz")


def load_cached(split: str, cache_dir: str = _CACHE_DIR) -> dict | None:
    path = cache_path(split, cache_dir)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {"texts": z["texts"], "images": z["images"]}


def _resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    """Minimal bilinear resize (H, W, C) -> (size, size, C) via jax."""
    import jax.image

    return np.asarray(
        jax.image.resize(img, (size, size, img.shape[2]), method="bilinear")
    )


def _extract_features(split: str, batch_size: int = 64) -> dict:
    """Streams flickr30k and extracts features with Flax BERT + SD-VAE.

    Requires network access to the HF hub (or a warm HF cache). Batches
    are padded to a fixed multiple so XLA compiles a handful of shapes.
    """
    import jax
    import jax.numpy as jnp
    from datasets import load_dataset
    from transformers import AutoTokenizer, FlaxBertModel

    try:
        from diffusers import FlaxAutoencoderKL
    except ImportError as exc:  # pragma: no cover
        raise RuntimeError(
            "diffusers with Flax support is required for image features"
        ) from exc

    tokenizer = AutoTokenizer.from_pretrained("google-bert/bert-base-uncased")
    bert = FlaxBertModel.from_pretrained(
        "google-bert/bert-base-uncased", dtype=jnp.float32
    )
    vae, vae_params = FlaxAutoencoderKL.from_pretrained(
        "stabilityai/sd-vae-ft-mse", dtype=jnp.float32, from_pt=True
    )

    @jax.jit
    def encode_text(input_ids, attention_mask, token_type_ids):
        out = bert(
            input_ids=input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
        )
        return out.pooler_output

    @jax.jit
    def encode_image(pixels):
        # Posterior MEAN, matching reference impl/dataset.py:57.
        posterior = vae.apply(
            {"params": vae_params}, pixels, method=vae.encode
        ).latent_dist
        return posterior.mean.reshape(pixels.shape[0], -1)

    stream = load_dataset("AnyModal/flickr30k", split=split, streaming=True)
    texts, images = [], []
    batch_texts, batch_imgs = [], []

    def flush():
        if not batch_texts:
            return
        n = len(batch_texts)
        tok = tokenizer(
            batch_texts,
            return_tensors="np",
            padding="max_length",
            truncation=True,
            max_length=128,
        )
        texts.append(
            np.asarray(
                encode_text(
                    tok["input_ids"], tok["attention_mask"],
                    tok["token_type_ids"],
                )
            )[:n]
        )
        pixels = np.stack(batch_imgs).transpose(0, 3, 1, 2)  # NCHW
        images.append(np.asarray(encode_image(jnp.asarray(pixels)))[:n])
        batch_texts.clear()
        batch_imgs.clear()

    for sample in stream:
        # First caption only (reference impl/dataset.py:47).
        batch_texts.append(sample["alt_text"][0])
        img = np.asarray(sample["image"].convert("RGB"), dtype=np.float32)
        img = _resize_bilinear(img, 256) / 255.0
        batch_imgs.append((img - 0.5) / 0.5)
        if len(batch_texts) == batch_size:
            flush()
    flush()

    return {
        "texts": np.concatenate(texts, axis=0),
        "images": np.concatenate(images, axis=0),
    }


def load_data(
    split: str, cache_dir: str = _CACHE_DIR, batch_size: int = 64
) -> dict:
    """Cached flickr30k features (reference impl/dataset.py:9-69).

    Cache hit -> load npz. Miss -> stream + extract + cache. No network
    and no cache -> RuntimeError pointing at the synthetic fallback.
    """
    cached = load_cached(split, cache_dir)
    if cached is not None:
        return cached
    try:
        data = _extract_features(split, batch_size=batch_size)
    except Exception as exc:
        raise RuntimeError(
            f"no cached features at {cache_path(split, cache_dir)} and "
            f"extraction failed ({exc!r}); in offline environments use "
            "multimodal_umap_tpu.data.synthetic.clustered_modalities or "
            "main.py --synthetic"
        ) from exc
    os.makedirs(cache_dir, exist_ok=True)
    np.savez(cache_path(split, cache_dir), **data)
    return data
