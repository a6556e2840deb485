"""Native frozen-NN inference components (no diffusers dependency)."""

from .vae import (  # noqa: F401
    AutoencoderKL,
    VAEConfig,
    load_vae,
    params_from_torch_state_dict,
)
