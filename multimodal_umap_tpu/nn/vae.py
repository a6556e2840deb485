"""Native Flax AutoencoderKL (Stable Diffusion VAE architecture).

The reference extracts image features with diffusers'
``AutoencoderKL.encode(...).latent_dist.mean`` and decodes
reconstructions with ``.decode`` (reference impl/dataset.py:41,55-58,
impl/crossmodal.py:28-35). diffusers is not available in this
environment, so the architecture is implemented natively in Flax --
which is also the TPU-correct choice: NHWC layout end-to-end (TPU
convolutions tile NHWC onto the MXU without transposes), one jit per
direction, and weights loadable directly from a diffusers *torch*
checkpoint via :func:`params_from_torch_state_dict` (OIHW->HWIO kernel
transposition, (out,in)->(in,out) linear transposition).

Architecture (diffusers ``AutoencoderKL`` with ``DownEncoderBlock2D`` /
``UpDecoderBlock2D`` blocks; ``stabilityai/sd-vae-ft-mse`` config:
block_out_channels=(128, 256, 512, 512), layers_per_block=2,
latent_channels=4, norm_num_groups=32):

  encoder: conv_in 3x3 -> down blocks (ResNet x layers_per_block +
           strided-conv downsample between blocks, asymmetric (0,1)
           padding) -> mid block (ResNet, single-head spatial
           self-attention, ResNet) -> GroupNorm/SiLU/conv_out ->
           2*latent channels (moments) -> quant_conv 1x1.
  decoder: post_quant_conv 1x1 -> conv_in 3x3 -> mid block -> up blocks
           (ResNet x (layers_per_block+1) + nearest-2x upsample + conv)
           -> GroupNorm/SiLU/conv_out -> image.

The posterior is diagonal Gaussian; ``encode_mean`` returns its mean
(the reference's deterministic feature, SURVEY.md §2.10k).

External array convention is NCHW (B, 4, 32, 32 latents match the
reference's flattened 4096-d features bit-for-bit in memory order);
transposition to NHWC happens at the jit boundary.
"""

from __future__ import annotations

import dataclasses
import json
import os
import typing

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

_GN_EPS = 1e-6


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    in_channels: int = 3
    out_channels: int = 3
    block_out_channels: tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_channels: int = 4
    norm_num_groups: int = 32

    @classmethod
    def from_json(cls, path: str) -> "VAEConfig":
        with open(path) as f:
            raw = json.load(f)
        return cls(
            in_channels=raw.get("in_channels", 3),
            out_channels=raw.get("out_channels", 3),
            block_out_channels=tuple(
                raw.get("block_out_channels", (128, 256, 512, 512))
            ),
            layers_per_block=raw.get("layers_per_block", 2),
            latent_channels=raw.get("latent_channels", 4),
            norm_num_groups=raw.get("norm_num_groups", 32),
        )


class ResnetBlock(nn.Module):
    """GroupNorm -> SiLU -> conv3x3, twice, with a 1x1 shortcut when
    channel counts change (diffusers ResnetBlock2D, output scale 1)."""

    out_channels: int
    groups: int

    @nn.compact
    def __call__(self, x):
        in_channels = x.shape[-1]
        h = nn.GroupNorm(num_groups=self.groups, epsilon=_GN_EPS,
                         name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv1")(h)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=_GN_EPS,
                         name="norm2")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, name="conv2")(h)
        if in_channels != self.out_channels:
            x = nn.Conv(self.out_channels, (1, 1), name="conv_shortcut")(x)
        return x + h


class AttentionBlock(nn.Module):
    """Single-head spatial self-attention over H*W tokens with a
    residual connection (diffusers Attention as used in the VAE mid
    block)."""

    channels: int
    groups: int

    @nn.compact
    def __call__(self, x):
        b, hh, ww, c = x.shape
        h = nn.GroupNorm(num_groups=self.groups, epsilon=_GN_EPS,
                         name="group_norm")(x)
        h = h.reshape(b, hh * ww, c)
        q = nn.Dense(c, name="to_q")(h)
        k = nn.Dense(c, name="to_k")(h)
        v = nn.Dense(c, name="to_v")(h)
        scale = 1.0 / jnp.sqrt(jnp.float32(c))
        attn = jax.nn.softmax(
            jnp.einsum("bqc,bkc->bqk", q, k,
                       preferred_element_type=jnp.float32) * scale,
            axis=-1,
        )
        h = jnp.einsum("bqk,bkc->bqc", attn, v,
                       preferred_element_type=jnp.float32)
        h = nn.Dense(c, name="to_out")(h)
        return x + h.reshape(b, hh, ww, c)


class MidBlock(nn.Module):
    channels: int
    groups: int

    @nn.compact
    def __call__(self, x):
        x = ResnetBlock(self.channels, self.groups, name="resnets_0")(x)
        x = AttentionBlock(self.channels, self.groups,
                           name="attentions_0")(x)
        x = ResnetBlock(self.channels, self.groups, name="resnets_1")(x)
        return x


class Encoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, x):
        cfg = self.config
        chans = cfg.block_out_channels
        x = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block):
                x = ResnetBlock(ch, cfg.norm_num_groups,
                                name=f"down_{i}_resnet_{j}")(x)
            if i < len(chans) - 1:
                # Asymmetric (0, 1) pad + stride-2 valid conv
                # (diffusers Downsample2D with padding=0).
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                x = nn.Conv(ch, (3, 3), strides=2, padding="VALID",
                            name=f"down_{i}_downsample")(x)
        x = MidBlock(chans[-1], cfg.norm_num_groups, name="mid")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=_GN_EPS,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1,
                    name="conv_out")(x)
        return x


class Decoder(nn.Module):
    config: VAEConfig

    @nn.compact
    def __call__(self, z):
        cfg = self.config
        chans = tuple(reversed(cfg.block_out_channels))
        x = nn.Conv(chans[0], (3, 3), padding=1, name="conv_in")(z)
        x = MidBlock(chans[0], cfg.norm_num_groups, name="mid")(x)
        for i, ch in enumerate(chans):
            for j in range(cfg.layers_per_block + 1):
                x = ResnetBlock(ch, cfg.norm_num_groups,
                                name=f"up_{i}_resnet_{j}")(x)
            if i < len(chans) - 1:
                b, hh, ww, c = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, c), "nearest")
                x = nn.Conv(ch, (3, 3), padding=1,
                            name=f"up_{i}_upsample")(x)
        x = nn.GroupNorm(num_groups=cfg.norm_num_groups, epsilon=_GN_EPS,
                         name="conv_norm_out")(x)
        x = nn.silu(x)
        x = nn.Conv(cfg.out_channels, (3, 3), padding=1, name="conv_out")(x)
        return x


class AutoencoderKL(nn.Module):
    """Encoder + decoder + quant convs; all methods take/return NHWC."""

    config: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.config, name="encoder")
        self.decoder = Decoder(self.config, name="decoder")
        self.quant_conv = nn.Conv(
            2 * self.config.latent_channels, (1, 1), name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.config.latent_channels, (1, 1), name="post_quant_conv"
        )

    def encode_moments(self, x):
        """(B, H, W, C) -> (mean, logvar), each (B, h, w, latent)."""
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode_mean(self, x):
        """Posterior mean -- the reference's deterministic feature
        (impl/dataset.py:57)."""
        return self.encode_moments(x)[0]

    def decode(self, z):
        """(B, h, w, latent) -> (B, H, W, C) sample."""
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x):
        mean, _ = self.encode_moments(x)
        return self.decode(mean)


# ---------------------------------------------------------------------------
# Weight conversion from a diffusers torch checkpoint
# ---------------------------------------------------------------------------


def _conv(sd, key):
    """OIHW torch conv -> HWIO flax kernel (+ bias)."""
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    return {
        "kernel": w.transpose(2, 3, 1, 0),
        "bias": np.asarray(sd[f"{key}.bias"], dtype=np.float32),
    }


def _dense(sd, key):
    w = np.asarray(sd[f"{key}.weight"], dtype=np.float32)
    return {
        "kernel": w.T,
        "bias": np.asarray(sd[f"{key}.bias"], dtype=np.float32),
    }


def _norm(sd, key):
    return {
        "scale": np.asarray(sd[f"{key}.weight"], dtype=np.float32),
        "bias": np.asarray(sd[f"{key}.bias"], dtype=np.float32),
    }


def _resnet(sd, key, has_shortcut):
    out = {
        "norm1": _norm(sd, f"{key}.norm1"),
        "conv1": _conv(sd, f"{key}.conv1"),
        "norm2": _norm(sd, f"{key}.norm2"),
        "conv2": _conv(sd, f"{key}.conv2"),
    }
    if has_shortcut:
        out["conv_shortcut"] = _conv(sd, f"{key}.conv_shortcut")
    return out


def _attention(sd, key):
    return {
        "group_norm": _norm(sd, f"{key}.group_norm"),
        "to_q": _dense(sd, f"{key}.to_q"),
        "to_k": _dense(sd, f"{key}.to_k"),
        "to_v": _dense(sd, f"{key}.to_v"),
        "to_out": _dense(sd, f"{key}.to_out.0"),
    }


def _mid(sd, key):
    return {
        "resnets_0": _resnet(sd, f"{key}.resnets.0", False),
        "attentions_0": _attention(sd, f"{key}.attentions.0"),
        "resnets_1": _resnet(sd, f"{key}.resnets.1", False),
    }


def params_from_torch_state_dict(
    sd: typing.Mapping[str, np.ndarray], config: VAEConfig
) -> dict:
    """diffusers AutoencoderKL torch state dict -> flax param tree.

    ``sd`` maps diffusers key names to arrays (torch tensors, numpy
    arrays, or anything ``np.asarray`` accepts).
    """
    sd = {k: np.asarray(v) for k, v in sd.items()}
    chans = config.block_out_channels

    enc: dict = {"conv_in": _conv(sd, "encoder.conv_in")}
    prev = chans[0]
    for i, ch in enumerate(chans):
        for j in range(config.layers_per_block):
            enc[f"down_{i}_resnet_{j}"] = _resnet(
                sd, f"encoder.down_blocks.{i}.resnets.{j}",
                has_shortcut=(prev != ch),
            )
            prev = ch
        if i < len(chans) - 1:
            enc[f"down_{i}_downsample"] = _conv(
                sd, f"encoder.down_blocks.{i}.downsamplers.0.conv"
            )
    enc["mid"] = _mid(sd, "encoder.mid_block")
    enc["conv_norm_out"] = _norm(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    rchans = tuple(reversed(chans))
    dec: dict = {"conv_in": _conv(sd, "decoder.conv_in")}
    dec["mid"] = _mid(sd, "decoder.mid_block")
    prev = rchans[0]
    for i, ch in enumerate(rchans):
        for j in range(config.layers_per_block + 1):
            dec[f"up_{i}_resnet_{j}"] = _resnet(
                sd, f"decoder.up_blocks.{i}.resnets.{j}",
                has_shortcut=(prev != ch),
            )
            prev = ch
        if i < len(rchans) - 1:
            dec[f"up_{i}_upsample"] = _conv(
                sd, f"decoder.up_blocks.{i}.upsamplers.0.conv"
            )
    dec["conv_norm_out"] = _norm(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv(sd, "quant_conv"),
        "post_quant_conv": _conv(sd, "post_quant_conv"),
    }


def _load_state_dict_file(model_dir: str) -> dict:
    st_path = os.path.join(model_dir, "diffusion_pytorch_model.safetensors")
    if os.path.exists(st_path):
        from safetensors.numpy import load_file

        return load_file(st_path)
    bin_path = os.path.join(model_dir, "diffusion_pytorch_model.bin")
    if os.path.exists(bin_path):
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(
        f"no diffusion_pytorch_model.(safetensors|bin) under {model_dir}"
    )


class LoadedVAE(typing.NamedTuple):
    """A ready-to-use VAE: jitted NCHW encode-mean and decode."""

    module: AutoencoderKL
    params: dict
    encode_mean: typing.Callable  # (B, C, H, W) -> (B, latent, h, w)
    decode: typing.Callable  # (B, latent, h, w) -> (B, C, H, W)


def make_loaded_vae(module: AutoencoderKL, params: dict) -> LoadedVAE:
    """Wraps a module + params into jitted NCHW entry points (the
    external convention: the reference's flattened (4, 32, 32) latents
    are NCHW memory order)."""

    @jax.jit
    def encode_mean(x_nchw):
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        mean = module.apply({"params": params}, x,
                            method=module.encode_mean)
        return jnp.transpose(mean, (0, 3, 1, 2))

    @jax.jit
    def decode(z_nchw):
        z = jnp.transpose(z_nchw, (0, 2, 3, 1))
        out = module.apply({"params": params}, z, method=module.decode)
        return jnp.transpose(out, (0, 3, 1, 2))

    return LoadedVAE(module, params, encode_mean, decode)


def load_vae(model_dir: str) -> LoadedVAE:
    """Loads a diffusers-format AutoencoderKL checkpoint directory
    (config.json + diffusion_pytorch_model.safetensors/.bin) into the
    native Flax implementation."""
    config = VAEConfig.from_json(os.path.join(model_dir, "config.json"))
    sd = _load_state_dict_file(model_dir)
    params = params_from_torch_state_dict(sd, config)
    return make_loaded_vae(AutoencoderKL(config), params)
