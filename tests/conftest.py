"""Test configuration: force an 8-device virtual CPU mesh.

jax is already imported by the jaxtyping pytest plugin before this
conftest runs, so environment variables are too late; ``jax.config``
updates still apply because the backend is not initialized yet
(SURVEY.md §4: multi-device tests need no cluster).
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"
# Zero-egress: never let huggingface_hub attempt a network round-trip.
os.environ.setdefault("HF_HUB_OFFLINE", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def blobs(rng):
    """Two clustered synthetic modalities with paired rows (N=192)."""
    n_per, n_clusters, d0, d1 = 48, 4, 24, 16
    centers0 = rng.normal(size=(n_clusters, d0)) * 6.0
    centers1 = rng.normal(size=(n_clusters, d1)) * 6.0
    labels = np.repeat(np.arange(n_clusters), n_per)
    x0 = centers0[labels] + rng.normal(size=(n_per * n_clusters, d0))
    x1 = centers1[labels] + rng.normal(size=(n_per * n_clusters, d1))
    return (
        x0.astype(np.float32),
        x1.astype(np.float32),
        labels.astype(np.int32),
    )
