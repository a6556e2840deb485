"""flickr30k feature extraction: BERT captions + SD-VAE image latents.

TPU-native counterpart of reference impl/dataset.py:9-69. Same feature
definitions (SURVEY.md §2.10k):
  * text  -- FIRST caption only, BERT-base-uncased ``pooler_output``
             (768-d);
  * image -- resize 256 -> center-crop 256 -> normalize(0.5, 0.5),
             ``stabilityai/sd-vae-ft-mse`` posterior MEAN (not a
             sample), flattened (4, 32, 32) -> 4096-d.

The torch models are replaced by their Flax counterparts running as
jit-batched JAX inference on device. Features cache to
``data/{split}_data.npz`` (the reference caches to ``.pt``). The
streaming/batching/caching plumbing is encoder-agnostic (tested offline
with stub encoders); the HF model loading lives in
:func:`load_hf_encoders`. In zero-egress environments with no cache,
``load_data`` raises a clear error -- callers fall back to
:mod:`.synthetic`.
"""

from __future__ import annotations

import os
import typing

import numpy as np

_CACHE_DIR = "data"


class Encoders(typing.NamedTuple):
    """Feature extractors for one multimodal dataset.

    encode_texts: list[str] -> (B, D_text) array.
    encode_images: (B, H, W, 3) float array in [-1, 1] -> (B, D_img).
    """

    encode_texts: typing.Callable
    encode_images: typing.Callable


def cache_path(split: str, cache_dir: str = _CACHE_DIR) -> str:
    return os.path.join(cache_dir, f"{split}_data.npz")


def load_cached(split: str, cache_dir: str = _CACHE_DIR) -> dict | None:
    path = cache_path(split, cache_dir)
    if not os.path.exists(path):
        return None
    with np.load(path) as z:
        return {"texts": z["texts"], "images": z["images"]}


def _resize_bilinear(img: np.ndarray, size: int) -> np.ndarray:
    """Antialiased bilinear resize (H, W, C) -> (size, size, C).

    ``antialias=True`` (explicit) scales the triangle filter's support
    by the downscale ratio, matching PIL/torchvision semantics --
    ``torchvision.transforms.Resize`` on a PIL image delegates to
    ``PIL.Image.resize(..., BILINEAR)``, which always antialiases on
    downscale (reference impl/dataset.py:35-40). Golden-tested against
    PIL to within uint8 quantization (tests/test_image_resize.py).
    """
    import jax.image

    return np.asarray(
        jax.image.resize(
            img, (size, size, img.shape[2]), method="bilinear",
            antialias=True,
        )
    )


def preprocess_image(img: np.ndarray) -> np.ndarray:
    """Reference transform chain (impl/dataset.py:35-40): resize to
    256x256 + normalize(0.5, 0.5). (Resize already lands at the crop
    size, so center-crop is the identity.)"""
    img = _resize_bilinear(np.asarray(img, dtype=np.float32), 256) / 255.0
    return (img - 0.5) / 0.5


def _batch_placer(mesh):
    """Returns a placer that shards a batch's leading axis over the
    mesh's data axis (identity when ``mesh`` is None).

    The batch must be divisible by the mesh size -- extract_features
    pads its final partial batch up to ``batch_size`` (itself validated
    mesh-divisible) so every forward hits the one compiled
    data-parallel program.
    """
    if mesh is None:
        return lambda x: x
    import jax
    from jax.sharding import NamedSharding, PartitionSpec

    axis = mesh.axis_names[0]

    def rows(x):
        spec = PartitionSpec(axis, *([None] * (np.ndim(x) - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return rows


_BERT_NAME = "google-bert/bert-base-uncased"
_VAE_NAME = "stabilityai/sd-vae-ft-mse"


def resolve_vae_dir(name_or_dir: str = _VAE_NAME) -> str:
    """Resolves a VAE checkpoint location to a local directory.

    Checks (in order): an existing local directory, the
    ``MMUMAP_VAE_DIR`` env override, then ``huggingface_hub`` download
    (reference impl/dataset.py:41 pulls the same repo via diffusers).
    """
    override = os.environ.get("MMUMAP_VAE_DIR")
    if override:
        return override
    if os.path.isdir(name_or_dir):
        return name_or_dir
    from huggingface_hub import snapshot_download

    return snapshot_download(
        name_or_dir,
        allow_patterns=[
            "config.json",
            "diffusion_pytorch_model.safetensors",
            "diffusion_pytorch_model.bin",
        ],
    )


def load_hf_encoders(
    bert_name: str = _BERT_NAME, vae_name: str = _VAE_NAME, mesh=None
) -> Encoders:
    """Flax BERT pooler + native Flax SD-VAE posterior-mean encoders.

    The VAE runs on the package's own Flax AutoencoderKL
    (multimodal_umap_tpu/nn/vae.py; torch-checkpoint weights converted
    directly -- no diffusers dependency). Requires the HF hub or warm
    local checkpoints (``MMUMAP_VAE_DIR`` / local paths accepted).

    With ``mesh`` (a ``jax.sharding.Mesh``), every forward batch is
    placed with its batch axis sharded over the mesh's data axis before
    the jitted forward runs, so GSPMD compiles the frozen-model
    inference data-parallel across the mesh (SURVEY.md §2.9 row 5:
    "jit-batched, data-parallel across the mesh"; the reference's
    extraction is single-device, impl/dataset.py:27-58). Weights stay
    replicated -- BERT-base + SD-VAE fit trivially per chip.
    """
    import jax
    import jax.numpy as jnp
    from transformers import AutoTokenizer, FlaxBertModel

    from ..nn.vae import load_vae

    rows = _batch_placer(mesh)
    tokenizer = AutoTokenizer.from_pretrained(bert_name)
    try:
        bert = FlaxBertModel.from_pretrained(bert_name, dtype=jnp.float32)
    except (OSError, EnvironmentError):
        # torch-only checkpoint: convert (parity proven in
        # tests/test_flax_torch_parity.py::test_bert_pooler_parity).
        bert = FlaxBertModel.from_pretrained(
            bert_name, dtype=jnp.float32, from_pt=True
        )
    vae = load_vae(resolve_vae_dir(vae_name))

    @jax.jit
    def bert_forward(input_ids, attention_mask, token_type_ids):
        return bert(
            input_ids=input_ids,
            attention_mask=attention_mask,
            token_type_ids=token_type_ids,
        ).pooler_output

    def encode_texts(texts: list[str]) -> np.ndarray:
        # Fixed-length padding: every batch hits one compiled program
        # (the reference pads per batch, impl/dataset.py:50; the pooler
        # output is mask-invariant so features agree).
        tok = tokenizer(
            texts, return_tensors="np", padding="max_length",
            truncation=True, max_length=128,
        )
        return np.asarray(bert_forward(
            rows(tok["input_ids"]),
            rows(tok["attention_mask"]),
            rows(tok["token_type_ids"]),
        ))

    def encode_images(pixels_nhwc: np.ndarray) -> np.ndarray:
        # Posterior MEAN, matching reference impl/dataset.py:57; NCHW
        # flattening order matches the reference's (B, 4, 32, 32).
        nchw = np.asarray(pixels_nhwc).transpose(0, 3, 1, 2)
        latents = np.asarray(vae.encode_mean(rows(nchw)))
        return latents.reshape(latents.shape[0], -1)

    return Encoders(encode_texts=encode_texts, encode_images=encode_images)


def extract_features(
    samples: typing.Iterable[dict],
    encoders: Encoders,
    batch_size: int = 64,
    mesh=None,
) -> dict:
    """Streams samples through the encoders in fixed batches.

    Each sample is a dict with ``alt_text`` (list of captions; only the
    FIRST is used, reference impl/dataset.py:47) and ``image`` (a PIL
    image or (H, W, 3) array).

    With ``mesh``, the final partial batch is padded up to
    ``batch_size`` (duplicating the last sample) and the padding rows
    dropped after encoding, so every batch keeps the one
    mesh-divisible shape the data-parallel encoders compiled for
    (``load_hf_encoders(mesh=...)`` places the batch axis sharded).
    Per-sample features are unchanged: both encoders are row-wise maps.
    """
    if mesh is not None and batch_size % mesh.devices.size != 0:
        raise ValueError(
            f"batch_size={batch_size} not divisible by the "
            f"{mesh.devices.size}-device mesh"
        )
    texts, images = [], []
    batch_texts: list[str] = []
    batch_imgs: list[np.ndarray] = []
    total = 0

    def flush():
        nonlocal total
        if not batch_texts:
            return
        total += len(batch_texts)
        if mesh is not None and len(batch_texts) < batch_size:
            pad = batch_size - len(batch_texts)
            batch_texts.extend([batch_texts[-1]] * pad)
            batch_imgs.extend([batch_imgs[-1]] * pad)
        texts.append(encoders.encode_texts(list(batch_texts)))
        images.append(encoders.encode_images(np.stack(batch_imgs)))
        batch_texts.clear()
        batch_imgs.clear()

    for sample in samples:
        batch_texts.append(sample["alt_text"][0])
        img = sample["image"]
        if hasattr(img, "convert"):  # PIL
            img = np.asarray(img.convert("RGB"))
        batch_imgs.append(preprocess_image(img))
        if len(batch_texts) == batch_size:
            flush()
    flush()

    if not texts:
        raise ValueError("no samples to extract features from")
    return {
        "texts": np.concatenate(texts, axis=0)[:total],
        "images": np.concatenate(images, axis=0)[:total],
    }


def load_data(
    split: str,
    cache_dir: str = _CACHE_DIR,
    batch_size: int = 64,
    encoders: Encoders | None = None,
    mesh=None,
) -> dict:
    """Cached flickr30k features (reference impl/dataset.py:9-69).

    Cache hit -> load npz. Miss -> stream + extract + cache. No network
    and no cache -> RuntimeError pointing at the synthetic fallback.
    ``mesh`` makes the extraction forward passes data-parallel
    (see :func:`extract_features` / :func:`load_hf_encoders`).
    """
    cached = load_cached(split, cache_dir)
    if cached is not None:
        return cached
    try:
        from datasets import load_dataset

        stream = load_dataset("AnyModal/flickr30k", split=split,
                              streaming=True)
        if encoders is None:
            encoders = load_hf_encoders(mesh=mesh)
        data = extract_features(stream, encoders, batch_size=batch_size,
                                mesh=mesh)
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
