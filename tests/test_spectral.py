"""Spectral initializer: LOBPCG path vs exact dense path."""

import jax.numpy as jnp
import numpy as np

from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize
from multimodal_umap_tpu.ops.knn import knn
from multimodal_umap_tpu.ops.spectral import spectral_embedding
import pytest

pytestmark = pytest.mark.fast


def _graph(rng, n=300, d=10, k=8):
    x = jnp.asarray(rng.normal(size=(n, d)).astype(np.float32))
    dists, nbrs = knn(x, x, k, exclude_self=True)
    w, _, _ = fuzzy_weights(dists)
    return symmetrize(nbrs, w)


def test_lobpcg_matches_dense_subspace(rng):
    graph = _graph(rng)
    dense = np.asarray(spectral_embedding(graph, 4, method="dense"))
    lob = np.asarray(spectral_embedding(graph, 4, method="lobpcg",
                                        max_iters=300))
    q_d, _ = np.linalg.qr(dense)
    q_l, _ = np.linalg.qr(lob)
    sv = np.linalg.svd(q_d.T @ q_l, compute_uv=False)
    assert sv.min() > 0.98, sv


def test_chebyshev_low_energy_subspace(rng):
    """The Chebyshev-filtered init must land in a low-energy subspace:
    its total Rayleigh energy within ~2x of the exact dense optimum and
    far below random init (the init-quality contract, SURVEY.md §7)."""
    from multimodal_umap_tpu.ops.graph import to_dense

    graph = _graph(rng, n=400, k=8)
    adj = np.asarray(to_dense(graph))
    deg = np.maximum(adj.sum(1), 1e-6) ** -0.5
    lap = np.eye(400, dtype=np.float32) * (1 + 1e-6) \
        - deg[:, None] * adj * deg[None, :]

    def energy(v):
        q, _ = np.linalg.qr(np.asarray(v))
        return float(np.trace(q.T @ lap @ q))

    dense = spectral_embedding(graph, 4, method="dense")
    cheb = spectral_embedding(graph, 4, method="chebyshev")
    rnd = rng.normal(size=(400, 4)).astype(np.float32)
    e_dense, e_cheb, e_rnd = energy(dense), energy(cheb), energy(rnd)
    assert e_cheb < 2.0 * e_dense + 1e-3, (e_cheb, e_dense)
    assert e_cheb < 0.25 * e_rnd, (e_cheb, e_rnd)

    # Subspace agreement with the exact dense bottom eigenvectors
    # (principal angles): the filtered block must essentially contain
    # the true low subspace, not merely have low total energy.
    q_d, _ = np.linalg.qr(np.asarray(dense))
    q_c, _ = np.linalg.qr(np.asarray(cheb))
    sv = np.linalg.svd(q_d.T @ q_c, compute_uv=False)
    assert sv.min() > 0.9, sv


def test_auto_dispatch_small_uses_dense(rng):
    graph = _graph(rng, n=40, k=5)
    # out_dim=16 -> 4*17+4=72 > 40 -> dense path must be chosen (lobpcg
    # would violate its size guardrail).
    emb = np.asarray(spectral_embedding(graph, 16))
    assert emb.shape == (40, 16)
    assert np.all(np.isfinite(emb))


def test_spectral_orthogonal_columns(rng):
    graph = _graph(rng)
    emb = np.asarray(spectral_embedding(graph, 4, method="dense"))
    gram = emb.T @ emb
    off = gram - np.diag(np.diag(gram))
    assert np.abs(off).max() < 1e-3


def test_chebyshev_small_n_falls_back_to_dense(rng):
    """Explicit method="chebyshev" below the block-size guardrail must
    still return out_dim columns (a wide-block QR would silently
    truncate them); it falls back to the exact dense path."""
    graph = _graph(rng, n=50, k=5)
    out = spectral_embedding(graph, 16, method="chebyshev")
    assert out.shape == (50, 16)


def test_blocked_adjacency_apply_matches_direct(rng):
    """The edge-blocked Laplacian matvec (used above _EDGE_BLOCK edges
    so the (E, B) gather transient stays constant in N) must match the
    direct segment-sum form."""
    import jax.numpy as jnp

    from multimodal_umap_tpu.ops import spectral as S
    from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize
    from multimodal_umap_tpu.ops.knn import knn

    x = rng.normal(size=(300, 12)).astype(np.float32)
    d, i = knn(jnp.asarray(x), jnp.asarray(x), 6, exclude_self=True)
    w, _, _ = fuzzy_weights(d)
    graph = symmetrize(i, w)
    y = jnp.asarray(rng.normal(size=(300, 9)).astype(np.float32))

    direct = S._adjacency_apply(graph, y)
    old = S._EDGE_BLOCK
    S._EDGE_BLOCK = 512  # force the scan path with a padded tail
    try:
        blocked = S._adjacency_apply(graph, y)
    finally:
        S._EDGE_BLOCK = old
    np.testing.assert_allclose(np.asarray(direct), np.asarray(blocked),
                               rtol=1e-5, atol=1e-5)


def test_chebyshev_hostloop_matches_fused(rng):
    """The per-round host-loop driver (dispatch-duration guard at very
    large N) must reproduce the fused while_loop filter exactly: same
    init, same round math, same residual stopping rule."""
    from multimodal_umap_tpu.ops.spectral import (
        _spectral_chebyshev,
        _spectral_chebyshev_hostloop,
    )

    graph = _graph(rng, n=300, k=6)
    e0 = np.asarray(_spectral_chebyshev(graph, 8))
    e1 = np.asarray(_spectral_chebyshev_hostloop(graph, 8))
    np.testing.assert_allclose(e0, e1, rtol=2e-4, atol=2e-4)


def test_dest_sharded_chebyshev_matches_single_device(rng):
    """Mesh spectral (destination-bucketed edges, all-gather-only
    matvec) must reproduce the single-program filter exactly up to
    per-column sign."""
    import jax

    from multimodal_umap_tpu.ops.spectral import (
        _spectral_chebyshev,
        dest_shard_graph,
    )
    from multimodal_umap_tpu.parallel.mesh import DATA_AXIS

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), (DATA_AXIS,))
    graph = _graph(rng, n=512, k=6)
    e0 = np.asarray(_spectral_chebyshev(graph, 8))
    dest = dest_shard_graph(graph, mesh, DATA_AXIS)
    e1 = np.asarray(_spectral_chebyshev(dest, 8))
    for j in range(8):
        err = min(np.linalg.norm(e0[:, j] - e1[:, j]),
                  np.linalg.norm(e0[:, j] + e1[:, j]))
        assert err < 1e-3, (j, err)


def test_dest_sharded_blocked_edges_matches_single_device(rng):
    """Regression: the edge-blocked matvec under DestShardedGraph must
    accumulate into (N/P, B) local rows, not zeros_like the all-gathered
    (N, B) block -- engage the blocked path on the mesh at small N."""
    import jax

    from multimodal_umap_tpu.ops import spectral as S
    from multimodal_umap_tpu.ops.spectral import (
        _spectral_chebyshev,
        dest_shard_graph,
    )
    from multimodal_umap_tpu.parallel.mesh import DATA_AXIS

    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), (DATA_AXIS,))
    graph = _graph(rng, n=512, k=6)
    e0 = np.asarray(_spectral_chebyshev(graph, 8))
    dest = dest_shard_graph(graph, mesh, DATA_AXIS)
    old = S._EDGE_BLOCK
    S._EDGE_BLOCK = 256  # per-shard padded edges exceed this -> scan path
    try:
        e1 = np.asarray(_spectral_chebyshev(dest, 8))
    finally:
        S._EDGE_BLOCK = old
    for j in range(8):
        err = min(np.linalg.norm(e0[:, j] - e1[:, j]),
                  np.linalg.norm(e0[:, j] + e1[:, j]))
        assert err < 1e-3, (j, err)


def test_dest_sharded_hostloop_via_public_api(rng, monkeypatch):
    """spectral_embedding(mesh=...) with the host-loop driver forced
    (the >=400k dispatch-duration guard): the destination-bucketed
    graph must flow through the per-round program and match the
    single-device filter up to per-column sign."""
    import jax

    from multimodal_umap_tpu.ops.spectral import spectral_embedding
    from multimodal_umap_tpu.parallel.mesh import DATA_AXIS

    monkeypatch.setenv("MMUMAP_SPECTRAL_HOSTLOOP_N", "1")
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:8]), (DATA_AXIS,))
    graph = _graph(rng, n=512, k=6)
    e0 = np.asarray(spectral_embedding(graph, 8, method="chebyshev"))
    e1 = np.asarray(
        spectral_embedding(graph, 8, method="chebyshev", mesh=mesh))
    for j in range(8):
        err = min(np.linalg.norm(e0[:, j] - e1[:, j]),
                  np.linalg.norm(e0[:, j] + e1[:, j]))
        assert err < 1e-3, (j, err)
