"""Synthetic multimodal datasets for tests and benchmarks.

Generates paired clustered modalities: rows with the same index share a
cluster, so cross-modal alignment is learnable -- mirroring the
structure (paired text/image rows) of the flickr30k workload without
any network access.
"""

from __future__ import annotations

import numpy as np


def clustered_modalities_device(
    n_samples: int,
    dims: tuple[int, ...] = (768, 4096),
    n_clusters: int = 32,
    cluster_scale: float = 6.0,
    noise_scale: float = 1.0,
    seed: int = 0,
    centers_seed: int | None = None,
) -> dict:
    """Device-side variant of :func:`clustered_modalities` (jax.random).

    The bench/profile path: this host has a single vCPU, so numpy
    generation at flickr scale takes minutes while the TPU does it in
    milliseconds. Distribution matches the numpy variant (not bitwise).

    ``centers_seed`` fixes the cluster geometry independently of the
    sample draws, so a test split (different ``seed``, same
    ``centers_seed``) lies on the same manifold as the train split --
    required for out-of-sample evaluation to be meaningful.
    """
    import jax
    import jax.numpy as jnp

    if centers_seed is None:
        centers_seed = seed
    key = jax.random.PRNGKey(seed)
    centers_key = jax.random.PRNGKey(centers_seed ^ 0x5EED)
    key_l, key = jax.random.split(key)
    labels = jax.random.randint(key_l, (n_samples,), 0, n_clusters)
    names = (
        ["texts", "images"]
        if len(dims) == 2
        else [f"mod{i}" for i in range(len(dims))]
    )
    out = {}
    for name, d in zip(names, dims):
        key_c, centers_key = jax.random.split(centers_key)
        key_n, key = jax.random.split(key)
        centers = jax.random.normal(key_c, (n_clusters, d)) * cluster_scale
        out[name] = (
            centers[labels]
            + jax.random.normal(key_n, (n_samples, d)) * noise_scale
        ).astype(jnp.float32)
    return out


def clustered_modalities(
    n_samples: int,
    dims: tuple[int, ...] = (768, 4096),
    n_clusters: int = 32,
    cluster_scale: float = 6.0,
    noise_scale: float = 1.0,
    seed: int = 0,
    centers_seed: int | None = None,
) -> dict[str, np.ndarray]:
    """Paired clustered features, one array per modality.

    Returns a dict keyed ``mod0``, ``mod1``, ... matching the reference
    data-dict shape (``{"texts": ..., "images": ...}`` for 2 modalities,
    reference impl/dataset.py:60-63). ``centers_seed`` fixes the cluster
    geometry independently of the sample draws so test splits lie on the
    train manifold.
    """
    rng = np.random.default_rng(seed)
    # centers_seed=None keeps the legacy single-stream draw order (test
    # fixtures and the e2e reference golden depend on it bitwise).
    centers_rng = (
        rng if centers_seed is None else np.random.default_rng(centers_seed)
    )
    labels = rng.integers(0, n_clusters, size=n_samples)
    names = (
        ["texts", "images"]
        if len(dims) == 2
        else [f"mod{i}" for i in range(len(dims))]
    )
    out = {}
    for name, d in zip(names, dims):
        centers = centers_rng.normal(size=(n_clusters, d)) * cluster_scale
        out[name] = (
            centers[labels] + rng.normal(size=(n_samples, d)) * noise_scale
        ).astype(np.float32)
    return out
