"""Spectral initialization: smallest eigenvectors of the normalized
Laplacian of the symmetric fuzzy graph.

The reference builds sparse torch tensors and runs ``torch.lobpcg``
(reference impl/model.py:211-234). Here the Laplacian never needs to be
materialized: its matvec is a ``segment_sum`` over the fixed-shape edge
list, and we run ``jax.experimental.sparse.linalg.lobpcg_standard`` on
the spectrally *shifted* operator c*I - L (eigenvalues of the
normalized Laplacian lie in [0, 2]), whose largest eigenpairs are L's
smallest. A dense ``eigh`` path covers small problems and serves as the
robust fallback.

The reference's exact operator is reproduced: L = I - D^{-1/2} A D^{-1/2}
+ 1e-6*I with degrees clamped >= 1e-6 (impl/model.py:223-229), and the
trivial first eigenvector is dropped (impl/model.py:232-234).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct
from jax.experimental.sparse.linalg import lobpcg_standard
from jax.sharding import NamedSharding, PartitionSpec as P

from .graph import EdgeGraph, to_dense

_EPS_SHIFT = 1e-6
_LOBPCG_SHIFT = 2.0 + 2.0 * _EPS_SHIFT


@struct.dataclass
class DestShardedGraph:
    """Edge list bucketed by DESTINATION shard for mesh spectral runs.

    Under GSPMD the Laplacian matvec's segment_sum emits one (N, m)
    all-reduce per matvec (~26 per filter program, measured): the
    symmetric edge list is source-row-sharded, so a shard's transposed
    edges scatter into rows other shards own. Bucketing edges by the
    shard that owns their destination row makes every segment_sum
    LOCAL; the matvec's only collective is ONE all-gather of the
    (N, m) block per application -- half the wire bytes of the
    all-reduce, and the textbook minimum (every destination needs
    every source column). No reference counterpart (single-device,
    reference impl/model.py:10); SURVEY.md §2.9's mesh mapping.

    ``rows`` are LOCAL destination ids (global minus the shard's row
    offset); padded slots carry weight 0 into local row 0 -- exact
    no-ops. Arrays are (P, E_pad), sharded on the leading axis.
    """

    rows: jax.Array  # (P, E_pad) int32, local destination ids
    cols: jax.Array  # (P, E_pad) int32, global source ids
    weights: jax.Array  # (P, E_pad) f32, 0 where padded/invalid
    num_rows: int = struct.field(pytree_node=False)
    mesh: jax.sharding.Mesh = struct.field(pytree_node=False)
    axis: str = struct.field(pytree_node=False)


def dest_shard_graph(graph: EdgeGraph, mesh, axis: str) -> DestShardedGraph:
    """Buckets a symmetric EdgeGraph by destination shard (eager; once
    per fit). Requires ``num_rows`` divisible by the mesh size (the
    same precondition as the ring kNN path that feeds it)."""
    p = int(mesh.shape[axis])
    n = graph.num_rows
    if n % p:
        raise ValueError(f"num_rows={n} not divisible by mesh size {p}")
    rows_per = n // p
    num_e = graph.rows.shape[0]
    w = jnp.where(graph.valid, graph.weights, 0.0)
    shard_of = graph.rows // rows_per
    order = jnp.argsort(shard_of, stable=True)
    rows_s = jnp.asarray(graph.rows)[order]
    cols_s = jnp.asarray(graph.cols)[order]
    w_s = w[order]
    counts = jnp.bincount(shard_of, length=p)
    e_pad = int(jnp.max(counts))
    e_pad = -(-e_pad // 8) * 8  # lane-friendly
    starts = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)[:-1].astype(jnp.int32)]
    )
    idx = starts[:, None] + jnp.arange(e_pad, dtype=jnp.int32)[None, :]
    valid = jnp.arange(e_pad)[None, :] < counts[:, None]
    idx = jnp.minimum(idx, num_e - 1)
    offs = (jnp.arange(p, dtype=jnp.int32) * rows_per)[:, None]
    shard = NamedSharding(mesh, P(axis, None))
    return DestShardedGraph(
        rows=jax.device_put(
            jnp.where(valid, rows_s[idx] - offs, 0).astype(jnp.int32),
            shard),
        cols=jax.device_put(
            jnp.where(valid, cols_s[idx], 0).astype(jnp.int32), shard),
        weights=jax.device_put(jnp.where(valid, w_s[idx], 0.0), shard),
        num_rows=n,
        mesh=mesh,
        axis=axis,
    )


def _degrees(graph) -> jax.Array:
    if isinstance(graph, DestShardedGraph):
        rows_per = graph.num_rows // int(graph.mesh.shape[graph.axis])

        def body(rows_b, w_b):
            return jax.ops.segment_sum(
                w_b[0], rows_b[0], num_segments=rows_per)

        deg = jax.shard_map(
            body, mesh=graph.mesh,
            in_specs=(P(graph.axis, None), P(graph.axis, None)),
            out_specs=P(graph.axis),
        )(graph.rows, graph.weights)
        return jnp.maximum(deg, 1e-6)
    w = jnp.where(graph.valid, graph.weights, 0.0)
    deg = jax.ops.segment_sum(w, graph.rows, num_segments=graph.num_rows)
    return jnp.maximum(deg, 1e-6)


# Edge-block size for the Laplacian matvec: the (E, B) gather transient
# is E*B*4 bytes -- at N=1M, k=15, B=73 the unblocked form needs ~9 GB,
# OOMing the filter program; 4M-edge blocks cap it at ~1.2 GB.
_EDGE_BLOCK = 4 * 1024 * 1024


def _edge_apply(rows, cols, w, y, num_rows: int,
                vma_axis: str | None = None) -> jax.Array:
    """segment_sum(w * y[cols] -> rows) blocked over edges above
    ``_EDGE_BLOCK`` so the (edges, B) gather transient stays constant
    in N. Weights must already be zeroed where invalid/padded.
    ``vma_axis``: when called inside a shard_map body over that axis,
    the blocked path's zero scan carry must be marked varying to match
    the per-shard segment_sum output."""
    num_e = rows.shape[0]
    if num_e <= _EDGE_BLOCK:
        scaled = y[cols] * w[:, None]
        return jax.ops.segment_sum(scaled, rows, num_segments=num_rows)

    pad = -(-num_e // _EDGE_BLOCK) * _EDGE_BLOCK - num_e
    # Padded edges carry weight 0 into row 0: exact no-ops.
    rows = jnp.pad(rows, (0, pad))
    cols = jnp.pad(cols, (0, pad))
    wp = jnp.pad(w, (0, pad))
    starts = jnp.arange((num_e + pad) // _EDGE_BLOCK, dtype=jnp.int32)

    def step(acc, i):
        e0 = i * _EDGE_BLOCK
        cols_b = jax.lax.dynamic_slice(cols, (e0,), (_EDGE_BLOCK,))
        rows_b = jax.lax.dynamic_slice(rows, (e0,), (_EDGE_BLOCK,))
        w_b = jax.lax.dynamic_slice(wp, (e0,), (_EDGE_BLOCK,))
        scaled = y[cols_b] * w_b[:, None]
        return acc + jax.ops.segment_sum(
            scaled, rows_b, num_segments=num_rows), None

    # NOT zeros_like(y): under DestShardedGraph the output has num_rows
    # = N/P local rows while y is the all-gathered (N, B) block.
    init = jnp.zeros((num_rows, y.shape[1]), y.dtype)
    if vma_axis is not None:
        init = jax.lax.pcast(init, (vma_axis,), to="varying")
    acc, _ = jax.lax.scan(step, init, starts)
    return acc


def _adjacency_apply(graph, y: jax.Array) -> jax.Array:
    """A @ y via segment-sum over the edge list.

    EdgeGraph: single program (GSPMD under a mesh). DestShardedGraph:
    shard_map whose ONLY collective is one all-gather of y -- every
    destination segment_sum is shard-local by construction."""
    if isinstance(graph, DestShardedGraph):
        rows_per = graph.num_rows // int(graph.mesh.shape[graph.axis])
        axis = graph.axis

        def body(rows_b, cols_b, w_b, y_shard):
            y_full = jax.lax.all_gather(y_shard, axis, axis=0, tiled=True)
            return _edge_apply(
                rows_b[0], cols_b[0], w_b[0], y_full, rows_per,
                vma_axis=axis)

        return jax.shard_map(
            body, mesh=graph.mesh,
            in_specs=(P(axis, None), P(axis, None), P(axis, None),
                      P(axis, None)),
            out_specs=P(axis, None),
        )(graph.rows, graph.cols, graph.weights, y)
    w = jnp.where(graph.valid, graph.weights, 0.0)
    return _edge_apply(graph.rows, graph.cols, w, y, graph.num_rows)


def _laplacian_matvec(graph, d_inv_sqrt: jax.Array, x: jax.Array):
    """(c*I - L) @ x for x of shape (N, B); L = I - D^-1/2 A D^-1/2 + eps*I."""
    ax = _adjacency_apply(graph, d_inv_sqrt[:, None] * x)
    lx = (1.0 + _EPS_SHIFT) * x - d_inv_sqrt[:, None] * ax
    return _LOBPCG_SHIFT * x - lx


@functools.partial(jax.jit, static_argnames=("out_dim", "max_iters"))
def _spectral_lobpcg(graph: EdgeGraph, out_dim: int, max_iters: int = 64):
    n = graph.num_rows
    d_inv_sqrt = _degrees(graph) ** -0.5
    matvec = functools.partial(_laplacian_matvec, graph, d_inv_sqrt)

    key = jax.random.PRNGKey(42)
    x0 = jax.random.normal(key, (n, out_dim + 1), dtype=jnp.float32)
    # Seed with the known trivial eigenvector d^{1/2} so the smallest
    # eigenpair converges immediately and the rest orthogonalize to it.
    trivial = 1.0 / d_inv_sqrt
    x0 = x0.at[:, 0].set(trivial / jnp.linalg.norm(trivial))
    # Iteration cap: each LOBPCG iteration runs a small Rayleigh-Ritz
    # eigendecomposition that is disproportionately slow on TPU, and the
    # spectral INIT only has to be low-energy -- the 600-epoch layout
    # optimization washes out residual inaccuracy (SURVEY.md §7). Loose
    # tolerances were tried and measurably corrupt the subspace; the cap
    # keeps machine-precision convergence checks.
    theta, vecs, _ = lobpcg_standard(matvec, x0, m=max_iters)
    # Largest of (c*I - L) == smallest of L; lobpcg returns descending
    # theta, i.e. vecs columns are already ordered by ascending L-eigenvalue.
    del theta
    return vecs[:, 1:]


@functools.partial(
    jax.jit,
    static_argnames=("out_dim", "degree", "max_rounds", "guard", "tol"),
)
def _spectral_chebyshev(
    graph: EdgeGraph,
    out_dim: int,
    degree: int = 24,
    max_rounds: int = 8,
    guard: int = 8,
    tol: float = 2e-3,
):
    """Chebyshev-filtered subspace iteration + one Rayleigh-Ritz.

    The spectral INIT only has to span a low-energy subspace of the
    normalized Laplacian (the layout optimization washes out residual
    inaccuracy, SURVEY.md §7); machine-precision eigenpairs are wasted
    work. LOBPCG pays a (3m x 3m) dense eigendecomposition + basis
    orthonormalization EVERY iteration -- ~15 s at N=31744/out_dim=64
    on v5e. This filter pays ``rounds * degree`` sparse matvecs (each a
    segment-sum over the fixed edge list, ~ms), ``rounds`` QRs, and a
    single (m x m) Rayleigh-Ritz: same low-energy subspace at a
    fraction of the cost.

    The degree-p Chebyshev polynomial T_p mapped to the damp interval
    [lo, 2] grows exponentially on [0, lo) and stays in [-1, 1] on the
    damp interval, so components with L-eigenvalue below ``lo`` dominate
    after filtering; Rayleigh-Ritz then extracts the best (out_dim+1)
    vectors from the filtered block. ``guard`` extra block vectors
    absorb filter leakage at the subspace edge.

    The damp interval adapts per round from the block's Ritz values
    (the ChebFD scheme): the lower damp edge is the largest Ritz value
    of the current block, which monotonically tightens toward the true
    (m)-th eigenvalue -- no spectrum knowledge needed up front.

    Stopping is residual-based (VERDICT r2 next-step 10): rounds repeat
    in a ``lax.while_loop`` until the worst per-vector residual
    ``max_j ||L v_j - theta_j v_j||`` over the RETURNED (non-guard)
    columns falls to ``tol``, capped at ``max_rounds``. The fixed
    (degree=24, rounds=3) schedule was tuned at N=31744/out_dim=64 and
    could silently under-converge at other scales; the residual check
    costs one extra block matvec per round (~1/degree of the round) and
    makes convergence a measured property at every N
    (tools/check_spectral_convergence.py records it at scale).
    """
    x, theta, d_inv_sqrt = _cheb_init(graph, out_dim, guard)

    def one_round(carry):
        x, theta, _, i = carry
        x, theta = _cheb_filter_round(graph, d_inv_sqrt, x, theta, degree)
        resid = _cheb_residual(graph, d_inv_sqrt, x, theta, out_dim)
        return x, theta, resid, i + 1

    def keep_going(carry):
        _, _, resid, i = carry
        return (i < max_rounds) & (resid > tol)

    x, theta, _, _ = jax.lax.while_loop(
        keep_going, one_round,
        (x, theta, jnp.float32(jnp.inf), jnp.int32(0)),
    )

    # Drop the trivial eigenvector, keep the next out_dim.
    return x[:, 1 : out_dim + 1]


def _cheb_lap(graph: EdgeGraph, d_inv_sqrt: jax.Array, x: jax.Array):
    """L @ x (the un-shifted operator; _laplacian_matvec applies the
    LOBPCG shift, which the filter does not want)."""
    return _LOBPCG_SHIFT * x - _laplacian_matvec(graph, d_inv_sqrt, x)


def _cheb_rayleigh_ritz(graph: EdgeGraph, d_inv_sqrt, x):
    """Orthonormal Ritz block (ascending) + its Ritz values."""
    b = x.T @ _cheb_lap(graph, d_inv_sqrt, x)
    b = (b + b.T) / 2.0
    theta, v = jnp.linalg.eigh(b)  # ascending
    return x @ v, theta


def _cheb_residual(graph: EdgeGraph, d_inv_sqrt, x, theta, out_dim: int):
    """Worst ||L v_j - theta_j v_j|| over the returned columns
    (Ritz vectors are unit-norm after Rayleigh-Ritz)."""
    keep = x[:, : out_dim + 1]
    r = (_cheb_lap(graph, d_inv_sqrt, keep)
         - keep * theta[None, : out_dim + 1])
    return jnp.max(jnp.sqrt(jnp.sum(r * r, axis=0)))


def _cheb_filter_round(graph: EdgeGraph, d_inv_sqrt, x, theta,
                       degree: int):
    """One Chebyshev filter application + QR + Rayleigh-Ritz.

    Damp [lo, hi] where lo is the block's largest Ritz value, kept
    strictly inside the spectrum interval. The three-term recurrence
    for T_p((L - c I)/e) @ x amplifies low-eigenvalue components by up
    to cosh(p*acosh(.)) ~ 1e17, whose squared norms overflow f32 inside
    QR; rescaling BOTH recurrence terms by the same factor preserves
    the filtered direction (the recurrence is linear).
    """
    hi = 2.0 + 2.0 * _EPS_SHIFT
    lo = jnp.clip(theta[-1], 0.05 * hi, 0.95 * hi)
    half_w = (hi - lo) / 2.0
    center = (lo + hi) / 2.0
    y_prev = x
    y = (_cheb_lap(graph, d_inv_sqrt, x) - center * x) / half_w
    for _ in range(degree - 1):
        y_next = (2.0 * (_cheb_lap(graph, d_inv_sqrt, y) - center * y)
                  / half_w - y_prev)
        y_prev, y = y, y_next
        scale = 1.0 / jnp.maximum(jnp.max(jnp.abs(y)), 1.0)
        y = y * scale
        y_prev = y_prev * scale
    x, _ = jnp.linalg.qr(y)
    return _cheb_rayleigh_ritz(graph, d_inv_sqrt, x)


@functools.partial(jax.jit, static_argnames=("out_dim", "guard"))
def _cheb_init(graph: EdgeGraph, out_dim: int, guard: int):
    """Seeded orthonormal start block + its Ritz values."""
    n = graph.num_rows
    m = out_dim + 1 + guard
    d_inv_sqrt = _degrees(graph) ** -0.5
    key = jax.random.PRNGKey(42)
    x = jax.random.normal(key, (n, m), dtype=jnp.float32)
    trivial = 1.0 / d_inv_sqrt
    x = x.at[:, 0].set(trivial / jnp.linalg.norm(trivial))
    x, _ = jnp.linalg.qr(x)
    x, theta = _cheb_rayleigh_ritz(graph, d_inv_sqrt, x)
    return x, theta, d_inv_sqrt


@functools.partial(jax.jit, static_argnames=("out_dim", "degree"))
def _cheb_round_program(graph: EdgeGraph, d_inv_sqrt, x, theta,
                        out_dim: int, degree: int):
    x, theta = _cheb_filter_round(graph, d_inv_sqrt, x, theta, degree)
    resid = _cheb_residual(graph, d_inv_sqrt, x, theta, out_dim)
    return x, theta, resid


def _spectral_chebyshev_hostloop(
    graph: EdgeGraph,
    out_dim: int,
    degree: int = 24,
    max_rounds: int = 8,
    guard: int = 8,
    tol: float = 2e-3,
):
    """The SAME filter as :func:`_spectral_chebyshev` (shared round
    helpers, identical math and round count) with one jitted dispatch
    per round and the residual read back on host.

    At N >= ~500k a full `max_rounds` while_loop is a multi-minute
    single dispatch, which reproducibly kills the axon-tunneled TPU
    worker (the same dispatch-duration limit as the kNN sweep --
    ops/knn_stream.knn_streamed). Per-round dispatches cost
    ~29 ms x rounds of extra RPC latency: noise at this scale.
    """
    import numpy as np

    x, theta, d_inv_sqrt = _cheb_init(graph, out_dim, guard)
    for _ in range(max_rounds):
        x, theta, resid = _cheb_round_program(
            graph, d_inv_sqrt, x, theta, out_dim, degree)
        if float(np.asarray(resid)) <= tol:
            break
    return x[:, 1 : out_dim + 1]


@functools.partial(jax.jit, static_argnames=("out_dim",))
def _spectral_dense(graph: EdgeGraph, out_dim: int):
    adj = to_dense(graph)
    deg = jnp.maximum(jnp.sum(adj, axis=1), 1e-6)
    d_inv_sqrt = deg ** -0.5
    n = graph.num_rows
    lap = (
        jnp.eye(n, dtype=jnp.float32) * (1.0 + _EPS_SHIFT)
        - d_inv_sqrt[:, None] * adj * d_inv_sqrt[None, :]
    )
    _, vecs = jnp.linalg.eigh(lap)  # ascending
    return vecs[:, 1 : out_dim + 1]


def spectral_embedding(
    graph: EdgeGraph,
    out_dim: int,
    method: str = "auto",
    max_iters: int = 64,
    mesh=None,
) -> jax.Array:
    """Smallest non-trivial Laplacian eigenvectors of the fuzzy graph.

    Args:
        graph: symmetric EdgeGraph from :func:`symmetrize`.
        out_dim: number of eigenvectors returned.
        method: "dense", "lobpcg", "chebyshev", or "auto" (dense below
            the small-n guardrail, else chebyshev).
        max_iters: LOBPCG iteration cap.
        mesh: optional jax.sharding.Mesh: the Chebyshev filter then
            buckets edges by destination shard so every matvec's only
            collective is one all-gather of the block
            (:class:`DestShardedGraph`; requires N divisible by the
            mesh size, the ring-kNN precondition).

    Returns:
        (N, out_dim) float32 spectral coordinates.
    """
    n = graph.num_rows
    small_n = n < 4 * (out_dim + 1) + 4
    if method == "auto":
        # Chebyshev-filtered Rayleigh-Ritz by default: ~10x faster than
        # LOBPCG at 31k (1.3s vs ~15s warm on v5e) at equal-or-lower
        # subspace energy (tools/check_spectral_convergence.py). Dense
        # eigh only below the small-n guardrail (the block needs room:
        # m = out_dim + 1 + guard <= n), where eigh is trivial anyway --
        # dense is pathologically slow on TPU at N>=2000 (QR iteration).
        method = "dense" if small_n else "chebyshev"
    elif method == "chebyshev" and small_n:
        # The filter block (out_dim + 1 + guard columns) needs room: a
        # QR of a wide (n, m) block would silently return fewer than
        # out_dim columns. Dense is exact and trivial at this size.
        method = "dense"
    if method == "dense":
        return _spectral_dense(graph, out_dim)
    if method == "lobpcg":
        return _spectral_lobpcg(graph, out_dim, max_iters=max_iters)
    if method == "chebyshev":
        import os

        tracing = isinstance(graph.rows, jax.core.Tracer)
        if (mesh is not None and not tracing
                and int(mesh.devices.size) > 1
                and n % int(mesh.devices.size) == 0):
            from ..parallel.mesh import DATA_AXIS

            graph = dest_shard_graph(graph, mesh, DATA_AXIS)
        hostloop_n = int(
            os.environ.get("MMUMAP_SPECTRAL_HOSTLOOP_N", 400_000))
        if n >= hostloop_n and not tracing:
            # Past ~500k the fused while_loop is a multi-minute single
            # dispatch -- over the tunnel's dispatch-duration limit.
            return _spectral_chebyshev_hostloop(graph, out_dim)
        return _spectral_chebyshev(graph, out_dim)
    raise ValueError(f"unknown spectral method: {method}")
