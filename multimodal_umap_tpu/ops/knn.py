"""Exact k-nearest-neighbor search, tiled for the TPU MXU.

The reference builds an *approximate*, randomized kNN graph with
NN-descent over sparse COO tensors (reference impl/model.py:63-209).
On TPU the idiomatic design is an **exact** blocked search: distance
panels ``|q|^2 + |r|^2 - 2 q r^T`` are computed on the MXU one column
block at a time while a running per-row top-k is folded with
``lax.scan`` -- no sparse bookkeeping, fixed output shapes (Q, k), and
a strict quality upgrade over NN-descent (SURVEY.md §2.10i).

Distances are Euclidean (not squared), matching the reference's
``LA.vector_norm`` convention (impl/model.py:109) which feeds the
sigma/rho solver.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)


def _pad_rows(x: jax.Array, multiple: int) -> tuple[jax.Array, int]:
    """Zero-pads the leading axis of ``x`` to a multiple of ``multiple``."""
    n = x.shape[0]
    padded = (n + multiple - 1) // multiple * multiple
    if padded != n:
        x = jnp.pad(x, ((0, padded - n),) + ((0, 0),) * (x.ndim - 1))
    return x, padded


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "block_cols", "precision")
)
def knn(
    queries: jax.Array,
    references: jax.Array,
    k: int,
    *,
    exclude_self: bool = False,
    block_cols: int = 1024,
    precision: str = "highest",
) -> tuple[jax.Array, jax.Array]:
    """Exact kNN of ``queries`` against ``references``.

    Args:
        queries: (Q, D) float array.
        references: (N, D) float array.
        k: number of neighbors to return.
        exclude_self: mask the diagonal (query i vs reference i); used in
            fit mode where queries *are* the references
            (reference impl/model.py:87-90 removes self edges).
        block_cols: column-block width for the panel scan.
        precision: matmul precision; "highest" keeps f32 accuracy so
            neighbor selection matches a direct computation.

    Returns:
        (dists, ids): (Q, k) Euclidean distances (ascending per row) and
        (Q, k) int32 reference indices.
    """
    q = queries.astype(jnp.float32)
    r = references.astype(jnp.float32)
    num_q, num_r = q.shape[0], r.shape[0]
    if k > num_r - (1 if exclude_self else 0):
        raise ValueError(f"k={k} exceeds available references ({num_r})")

    r_padded, padded_n = _pad_rows(r, block_cols)
    num_blocks = padded_n // block_cols
    r_blocks = r_padded.reshape(num_blocks, block_cols, -1)

    q_sq = jnp.sum(q * q, axis=1, keepdims=True)  # (Q, 1)
    r_sq_blocks = jnp.sum(r_blocks * r_blocks, axis=2)  # (B, block)
    row_ids = jnp.arange(num_q, dtype=jnp.int32)[:, None]  # (Q, 1)

    init_d = jnp.full((num_q, k), _INF, dtype=jnp.float32)
    init_i = jnp.full((num_q, k), -1, dtype=jnp.int32)

    def fold_block(carry, blk):
        best_d, best_i = carry
        r_blk, r_sq, blk_idx = blk
        # Squared-distance panel on the MXU.
        panel = q_sq + r_sq[None, :] - 2.0 * jnp.dot(
            q, r_blk.T, preferred_element_type=jnp.float32,
            precision=precision,
        )
        panel = jnp.maximum(panel, 0.0)
        col_ids = blk_idx * block_cols + jnp.arange(
            block_cols, dtype=jnp.int32
        )[None, :]
        # Mask column padding (and the diagonal in fit mode).
        invalid = col_ids >= num_r
        if exclude_self:
            invalid = invalid | (col_ids == row_ids)
        panel = jnp.where(invalid, _INF, panel)

        cand_d = jnp.concatenate([best_d, panel], axis=1)
        cand_i = jnp.concatenate(
            [best_i, jnp.broadcast_to(col_ids, panel.shape)], axis=1
        )
        top_neg, top_pos = jax.lax.top_k(-cand_d, k)
        best_d = -top_neg
        best_i = jnp.take_along_axis(cand_i, top_pos, axis=1)
        return (best_d, best_i), None

    (best_d, best_i), _ = jax.lax.scan(
        fold_block,
        (init_d, init_i),
        (r_blocks, r_sq_blocks, jnp.arange(num_blocks, dtype=jnp.int32)),
    )
    return jnp.sqrt(best_d), best_i
