"""Cross-modal reconstruction app: text -> shared latent -> image.

Counterpart of reference impl/crossmodal.py:9-58: embed text features,
reconstruct into SD-VAE latent space via inverse transform (the fixed
invert semantics, SURVEY.md §2.10a), print the latent-space MSE, decode
through the Flax SD-VAE, and save original/reconstruction PNG pairs.

In offline environments (no VAE weights) the decode step is skipped and
the raw latents are saved as npz plus a latent-channel visualization --
the quantitative metric (reconstruction MSE) is unaffected.
"""

from __future__ import annotations

import os

import numpy as np

from ..config import Config
from ..eval.validation import embed_and_recon
from ..models.mixture import MultimodalUMAP


def _decode_with_vae(latents: np.ndarray, vae=None) -> np.ndarray | None:
    """(B, 4, h, w) SD-VAE latents -> (B, H, W, 3) images in [0, 1],
    or None when no VAE is available (offline, no cached weights).

    ``vae`` is a :class:`multimodal_umap_tpu.nn.vae.LoadedVAE`; when
    None the default checkpoint is resolved (local dir / MMUMAP_VAE_DIR
    / hub). Decode errors with a *loaded* VAE propagate -- only the
    can't-load-weights case falls back to the offline path."""
    if vae is None:
        try:
            from ..data.flickr30k import resolve_vae_dir
            from ..nn.vae import load_vae

            vae = load_vae(resolve_vae_dir())
        except Exception:
            return None
    out = np.asarray(vae.decode(np.asarray(latents)))
    imgs = out.transpose(0, 2, 3, 1)
    return np.clip(imgs / 2.0 + 0.5, 0.0, 1.0)


def _save_pairs(orig: np.ndarray, recon: np.ndarray, out_dir: str) -> None:
    from matplotlib import pyplot as plt

    for i in range(orig.shape[0]):
        _, axes = plt.subplots(2, 1, figsize=(15, 6))
        axes[0].imshow(orig[i])
        axes[0].set_title(f"Original image {i + 1}")
        axes[0].axis("off")
        axes[1].imshow(recon[i])
        axes[1].set_title(f"Reconstructed from text {i + 1}")
        axes[1].axis("off")
        plt.tight_layout()
        plt.savefig(os.path.join(out_dir, f"recon_text_to_image_{i + 1}.png"))
        plt.close()


def crossmodal_recon(
    data: list,
    cfg: Config,
    model: MultimodalUMAP,
    out_dir: str = "results",
    latent_shape: tuple[int, int, int] = (4, 32, 32),
    vae=None,
) -> list:
    """Text->image reconstruction with on-disk visual comparison.

    Args:
        data: [text_features (B, 768), image_latents (B, 4096)].
        cfg: inference hyperparameters.
        model: fitted model.
        out_dir: directory for PNG pairs / latent dumps.
        latent_shape: VAE latent geometry (reference crossmodal.py:30).
        vae: optional pre-loaded :class:`..nn.vae.LoadedVAE`; when None
            the default checkpoint is resolved (offline fallback saves
            latents instead).

    Returns:
        [reconstructed latents (B, D_image)].
    """
    recon = np.asarray(embed_and_recon(model, [data[0]], [0], [1], cfg)[0])
    target = np.asarray(data[1])

    loss = float(np.mean((recon - target) ** 2))
    print(f"Reconstruction loss from text to image: {loss:.4f}")

    os.makedirs(out_dir, exist_ok=True)
    recon_latent = recon.reshape(-1, *latent_shape)
    orig_latent = target.reshape(-1, *latent_shape)

    recon_imgs = _decode_with_vae(recon_latent, vae)
    orig_imgs = (
        _decode_with_vae(orig_latent, vae) if recon_imgs is not None else None
    )
    if recon_imgs is not None and orig_imgs is not None:
        _save_pairs(orig_imgs, recon_imgs, out_dir)
    else:
        # Offline: persist latents and a channel-0 heat-map comparison
        # (min-max normalized per image for display).
        np.savez(
            os.path.join(out_dir, "recon_latents.npz"),
            recon=recon_latent,
            original=orig_latent,
        )

        def to_gray(lat):
            ch = lat[:, 0, :, :]
            lo = ch.min(axis=(1, 2), keepdims=True)
            hi = ch.max(axis=(1, 2), keepdims=True)
            ch = (ch - lo) / np.maximum(hi - lo, 1e-6)
            return ch[..., None].repeat(3, axis=-1)

        _save_pairs(to_gray(orig_latent), to_gray(recon_latent), out_dir)
    return [recon]
