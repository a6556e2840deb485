"""Exact k-nearest-neighbor search, tiled for the TPU MXU.

The reference builds an *approximate*, randomized kNN graph with
NN-descent over sparse COO tensors (reference impl/model.py:63-209).
On TPU the idiomatic design is an **exact** blocked search: distance
panels ``|q|^2 + |r|^2 - 2 q r^T`` are computed on the MXU for a block
of query rows against ALL reference columns, followed by one full-width
``lax.top_k`` -- no sparse bookkeeping, fixed (Q, k) output shapes, and
a strict quality upgrade over NN-descent (SURVEY.md §2.10i).

Blocking is over *rows* at the host level: every block reuses one
compiled kernel (same shapes), and panel memory is bounded at
``row_block * N`` floats. Full-width top_k on TPU is fast (measured:
(4096, 31744) panel -> 6 ms); a scan-carried running top-k merge was
measured 20x slower to compile and no faster to run, so it was
deliberately rejected.

Distances are Euclidean (not squared), matching the reference's
``LA.vector_norm`` convention (impl/model.py:109) which feeds the
sigma/rho solver. Numerical note: the ``|x|^2+|y|^2-2xy`` form cancels
catastrophically for (near-)duplicate rows, leaving an O(eps*|x|^2)
residue instead of exact zero -- selection order is unaffected and the
downstream sigma/weight guards absorb it (tests/test_duplicates.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "precision")
)
def _knn_block(
    q_block: jax.Array,
    references: jax.Array,
    r_sq: jax.Array,
    row_offset: jax.Array,
    num_valid_rows: jax.Array,
    k: int,
    exclude_self: bool,
    precision: str,
) -> tuple[jax.Array, jax.Array]:
    """One row block against all references: panel + full-width top_k."""
    q_sq = jnp.sum(q_block * q_block, axis=1, keepdims=True)
    panel = q_sq + r_sq[None, :] - 2.0 * jnp.dot(
        q_block, references.T,
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    panel = jnp.maximum(panel, 0.0)
    if exclude_self:
        local_rows = jnp.arange(q_block.shape[0], dtype=jnp.int32)
        global_rows = (row_offset + local_rows)[:, None]
        cols = jnp.arange(references.shape[0], dtype=jnp.int32)[None, :]
        panel = jnp.where(cols == global_rows, _INF, panel)
    neg_d, ids = jax.lax.top_k(-panel, k)
    del num_valid_rows  # rows beyond Q are padding; caller slices them off
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), ids.astype(jnp.int32)


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "recall_target")
)
def _knn_approx_block(
    q_block: jax.Array,
    references: jax.Array,
    r_sq: jax.Array,
    row_offset: jax.Array,
    k: int,
    exclude_self: bool,
    recall_target: float = 0.99,
) -> tuple[jax.Array, jax.Array]:
    """One row block, approximate selection (lax.approx_max_k /
    PartialReduce).  Row-blocked exactly like ``_knn_block`` so peak
    memory stays ``row_block * N`` -- the engine exists for
    beyond-flickr scale, where a one-shot (Q, N) panel would OOM first.
    """
    q_sq = jnp.sum(q_block * q_block, axis=1, keepdims=True)
    panel = q_sq + r_sq[None, :] - 2.0 * jnp.dot(
        q_block, references.T,
        preferred_element_type=jnp.float32,
        precision="highest",
    )
    panel = jnp.maximum(panel, 0.0)
    if exclude_self:
        local_rows = jnp.arange(q_block.shape[0], dtype=jnp.int32)
        global_rows = (row_offset + local_rows)[:, None]
        cols = jnp.arange(references.shape[0], dtype=jnp.int32)[None, :]
        panel = jnp.where(cols == global_rows, _INF, panel)
    neg_d, ids = jax.lax.approx_max_k(
        -panel, k, recall_target=recall_target, aggregate_to_topk=True
    )
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), ids.astype(jnp.int32)


def knn(
    queries: jax.Array,
    references: jax.Array,
    k: int,
    *,
    exclude_self: bool = False,
    row_block: int = 8192,
    precision: str = "highest",
) -> tuple[jax.Array, jax.Array]:
    """Exact kNN of ``queries`` against ``references``.

    Engine selection via ``MMUMAP_KNN_ENGINE``:
      * unset/"xla" (default) -- exact: blocked panels + full-width top_k;
      * "pallas" (TPU only) -- exact: fused Pallas panel/top-k kernel
        (ops/knn_pallas.py; measured ~15% faster on v5e at flickr scale);
      * "approx" -- lax.approx_max_k (TPU PartialReduce), recall ~0.99+.

    Args:
        queries: (Q, D) float array.
        references: (N, D) float array.
        k: number of neighbors to return.
        exclude_self: mask the diagonal (query i vs reference i); used in
            fit mode where queries *are* the references
            (reference impl/model.py:87-90 removes self edges).
        row_block: query rows per panel; bounds peak memory at
            ``row_block * N`` floats while every block reuses one
            compiled kernel.
        precision: matmul precision; "highest" keeps f32 accuracy so
            neighbor selection matches a direct computation.

    Returns:
        (dists, ids): (Q, k) Euclidean distances (ascending per row) and
        (Q, k) int32 reference indices.
    """
    engine = os.environ.get("MMUMAP_KNN_ENGINE", "xla")
    if engine == "pallas" and jax.default_backend() == "tpu":
        from .knn_pallas import knn_pallas

        return knn_pallas(queries, references, k, exclude_self=exclude_self)

    # Column-streamed engine: explicit opt-in, or automatic once a
    # single row_block x N panel would exceed ~4 GiB (beyond-flickr
    # scale, where full-width panels stop fitting HBM; see
    # ops/knn_stream.py / SURVEY.md §5.7).
    panel_bytes = 4 * row_block * references.shape[0]
    if engine == "stream" or (
        engine == "xla" and panel_bytes > 4 * 1024**3
    ):
        from .knn_stream import knn_streamed

        return knn_streamed(
            queries, references, k, exclude_self=exclude_self,
            row_block=row_block,
        )

    if engine == "approx":
        # TPU-KNN-style approximate selection (lax.approx_max_k /
        # PartialReduce): linear-time in the column width, measured
        # recall ~1.0 at flickr scale with recall_target=0.99. Useful
        # headroom beyond ~100k points where exact full-width top_k
        # starts to dominate; the graph quality gate stays statistical
        # (the reference's own NN-descent is approximate, SURVEY §2.10i).
        def block_fn(q_blk, r, r_sq, off):
            return _knn_approx_block(q_blk, r, r_sq, off, k, exclude_self)
    else:
        def block_fn(q_blk, r, r_sq, off):
            return _knn_block(
                q_blk, r, r_sq, off, jnp.int32(queries.shape[0]), k,
                exclude_self, precision,
            )

    q = queries.astype(jnp.float32)
    r = references.astype(jnp.float32)
    num_q, num_r = q.shape[0], r.shape[0]
    if k > num_r - (1 if exclude_self else 0):
        raise ValueError(f"k={k} exceeds available references ({num_r})")

    r_sq = jnp.sum(r * r, axis=1)

    if num_q <= row_block:
        return block_fn(q, r, r_sq, jnp.int32(0))

    # Pad Q to a block multiple; every block hits the same compiled fn.
    num_blocks = -(-num_q // row_block)
    padded_q = num_blocks * row_block
    if padded_q != num_q:
        q = jnp.pad(q, ((0, padded_q - num_q), (0, 0)))
    d_parts, i_parts = [], []
    for b in range(num_blocks):
        d, i = block_fn(
            jax.lax.dynamic_slice_in_dim(q, b * row_block, row_block),
            r,
            r_sq,
            jnp.int32(b * row_block),
        )
        d_parts.append(d)
        i_parts.append(i)
    dists = jnp.concatenate(d_parts)[:num_q]
    ids = jnp.concatenate(i_parts)[:num_q]
    return dists, ids
