"""Data pipelines: flickr30k feature extraction and synthetic fallback."""

from .flickr30k import load_data
from .synthetic import clustered_modalities

__all__ = ["load_data", "clustered_modalities"]
