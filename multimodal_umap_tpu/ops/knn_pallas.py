"""Pallas TPU kernel: fused pairwise-distance panel + tile-local top-k.

The XLA path (ops/knn.py) materializes each (row_block, N) distance
panel in HBM and runs a full-width top_k over it. This kernel fuses the
panel computation with k-selection so the panel never leaves VMEM:

  grid (row tiles, col tiles, d tiles), d innermost;
  * each d step accumulates the -2 * q @ r^T partial product on the MXU
    into a VMEM scratch panel;
  * on the last d step the squared-norm terms are added, padding/self
    columns are masked to +inf, and the tile's k smallest entries per
    row are extracted by k iterative min-extraction passes on the VPU
    (lax.top_k does not lower inside Mosaic);
  * per-(row, col-tile) candidates (dists, global ids) are written out;
    a cheap XLA top_k over (num_col_tiles * k) merges them exactly.

Selection is exact: per tile the k minima are found by repeated
min+mask (ties resolved to the lowest column id), and the cross-tile
merge sees every tile's true top-k.

``bf16=True`` switches the panel matmul to single-pass bf16 on the MXU
(~6x the FLOP rate of the f32-highest default, which the MXU emulates
in six passes). Norms are then accumulated from the bf16-ROUNDED tiles
in f32, so the panel equals the exact squared distance of the rounded
vectors -- a consistent geometry whose ranking error vs true f32 is
bounded by input rounding (~2^-9 relative). The kernel extracts a
widened per-tile candidate set, the merge keeps the best ``cand``
global candidates under bf16 scoring, and the caller re-scores them
EXACTLY in f32 (direct ``sum((q-r)^2)`` form, ops/knn.py) before the
final top-k -- returned distances are exact f32 and ids match the
exact engine whenever every true neighbor ranks inside the candidate
margins (measured recall 1.0 at the bench fixture, tools/ +
tests/test_knn_pallas.py).

Interpret mode (pltpu interpreter) drives the same kernel on CPU for
tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _knn_tile_kernel(
    q_ref, r_ref, d_out_ref, i_out_ref, panel_ref, q_sq_ref, r_sq_ref,
    *, k: int, num_r: int, tile_r: int, tile_c: int, exclude_self: bool,
    bf16: bool = False,
):
    dk = pl.program_id(2)
    num_dk = pl.num_programs(2)

    @pl.when(dk == 0)
    def _():
        panel_ref[:] = jnp.zeros_like(panel_ref)
        q_sq_ref[:] = jnp.zeros_like(q_sq_ref)
        r_sq_ref[:] = jnp.zeros_like(r_sq_ref)

    q_tile = q_ref[:]
    r_tile = r_ref[:]
    if bf16:
        # Single-pass bf16 MXU matmul, f32 accumulation. Norms from the
        # bf16-rounded tiles (cast up so the squares accumulate in f32):
        # the panel is then the EXACT squared distance of the rounded
        # vectors -- non-negative, no catastrophic cancellation.
        panel_ref[:] += -2.0 * jnp.dot(
            q_tile, r_tile.T, preferred_element_type=jnp.float32,
        )
        q_f32 = q_tile.astype(jnp.float32)
        r_f32 = r_tile.astype(jnp.float32)
        q_sq_ref[:] += jnp.sum(q_f32 * q_f32, axis=1, keepdims=True)
        r_sq_ref[:] += jnp.sum(r_f32 * r_f32, axis=1, keepdims=True)
    else:
        panel_ref[:] += -2.0 * jnp.dot(
            q_tile, r_tile.T, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        # Squared norms accumulate across d tiles in VMEM scratch
        # (passing them as 1-D inputs trips Mosaic/XLA layout
        # disagreements).
        q_sq_ref[:] += jnp.sum(q_tile * q_tile, axis=1, keepdims=True)
        r_sq_ref[:] += jnp.sum(r_tile * r_tile, axis=1, keepdims=True)

    @pl.when(dk == num_dk - 1)
    def _():
        ri = pl.program_id(0)
        cj = pl.program_id(1)
        panel = panel_ref[:] + q_sq_ref[:].reshape(tile_r, 1)
        panel = panel + r_sq_ref[:].reshape(1, tile_c)
        panel = jnp.maximum(panel, 0.0)

        local_cols = jax.lax.broadcasted_iota(
            jnp.int32, (tile_r, tile_c), 1
        )
        global_cols = cj * tile_c + local_cols
        invalid = global_cols >= num_r
        if exclude_self:
            local_rows = jax.lax.broadcasted_iota(
                jnp.int32, (tile_r, tile_c), 0
            )
            global_rows = ri * tile_r + local_rows
            invalid = invalid | (global_cols == global_rows)
        panel = jnp.where(invalid, jnp.inf, panel)

        # k iterative min-extractions (exact; ties -> lowest column id).
        for t in range(k):
            row_min = jnp.min(panel, axis=1)  # (tile_r,)
            is_min = panel == row_min[:, None]
            min_col = jnp.min(
                jnp.where(is_min, local_cols, 2**30), axis=1
            )
            d_out_ref[0, :, t] = row_min
            i_out_ref[0, :, t] = cj * tile_c + min_col
            panel = jnp.where(local_cols == min_col[:, None], jnp.inf, panel)


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "exclude_self", "tile_r", "tile_c", "tile_d", "interpret",
        "bf16", "tile_k", "cand",
    ),
)
def knn_pallas(
    queries: jax.Array,
    references: jax.Array,
    k: int,
    *,
    exclude_self: bool = False,
    tile_r: int = 256,
    tile_c: int = 512,
    tile_d: int = 512,
    interpret: bool = False,
    bf16: bool = False,
    tile_k: int | None = None,
    cand: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact kNN via the fused Pallas panel/top-k kernel.

    Same contract as :func:`multimodal_umap_tpu.ops.knn.knn`: returns
    ((Q, k) ascending Euclidean distances, (Q, k) int32 ids).

    With ``bf16`` the panel ranks at single-pass MXU speed and the
    merged global top-``cand`` candidates (per-tile width ``tile_k``)
    are re-scored exactly in f32 before the final top-k (see module
    docstring). Distances returned are exact f32 either way.
    """
    q32 = queries.astype(jnp.float32)
    r32 = references.astype(jnp.float32)
    num_q, dim = q32.shape
    num_r = r32.shape[0]
    if k > num_r - (1 if exclude_self else 0):
        raise ValueError(f"k={k} exceeds available references ({num_r})")
    if bf16:
        # Per-tile margin absorbs in-tile bf16 misranking; the global
        # margin absorbs cross-tile misranking (both re-scored away).
        tile_k = min(k + 8, tile_c) if tile_k is None else tile_k
        cand = max(4 * k, 64) if cand is None else cand
    else:
        tile_k = k
    if tile_k > tile_c:
        raise ValueError(f"tile_k={tile_k} exceeds tile_c={tile_c}")

    def pad_to(x, m, axis):
        size = x.shape[axis]
        padded = -(-size // m) * m
        if padded == size:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, padded - size)
        return jnp.pad(x, widths)

    dtype = jnp.bfloat16 if bf16 else jnp.float32
    q = pad_to(pad_to(q32.astype(dtype), tile_r, 0), tile_d, 1)
    r = pad_to(pad_to(r32.astype(dtype), tile_c, 0), tile_d, 1)

    num_ri = q.shape[0] // tile_r
    num_cj = r.shape[0] // tile_c
    num_dk = q.shape[1] // tile_d

    kernel = functools.partial(
        _knn_tile_kernel,
        k=tile_k, num_r=num_r, tile_r=tile_r, tile_c=tile_c,
        exclude_self=exclude_self, bf16=bf16,
    )
    d_cand, i_cand = pl.pallas_call(
        kernel,
        grid=(num_ri, num_cj, num_dk),
        in_specs=[
            pl.BlockSpec((tile_r, tile_d), lambda i, j, d: (i, d)),
            pl.BlockSpec((tile_c, tile_d), lambda i, j, d: (j, d)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r, tile_k), lambda i, j, d: (j, i, 0)),
            pl.BlockSpec((1, tile_r, tile_k), lambda i, j, d: (j, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_cj, q.shape[0], tile_k), jnp.float32),
            jax.ShapeDtypeStruct((num_cj, q.shape[0], tile_k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_r, tile_c), jnp.float32),
            pltpu.VMEM((tile_r, 1), jnp.float32),
            pltpu.VMEM((tile_c, 1), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(q, r)

    # Exact cross-tile merge: top-k over all tiles' candidates.
    width = num_cj * tile_k
    cand_d = d_cand[:, :num_q].transpose(1, 0, 2).reshape(num_q, width)
    cand_i = i_cand[:, :num_q].transpose(1, 0, 2).reshape(num_q, width)
    if not bf16:
        neg_d, pos = jax.lax.top_k(-cand_d, k)
        ids = jnp.take_along_axis(cand_i, pos, axis=1)
        return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), ids

    # bf16: keep the best `cand` global candidates under bf16 scoring,
    # then re-score them exactly in f32 (direct form -- ops/knn.py).
    from .knn import _exact_rescore_sq

    c = min(cand, width)
    _, pos = jax.lax.top_k(-cand_d, c)
    ids_c = jnp.take_along_axis(cand_i, pos, axis=1)
    d2 = _exact_rescore_sq(
        q32, r32, jnp.clip(ids_c, 0, num_r - 1), chunk=min(512, num_q)
    )
    # Exhausted tiles emit +inf entries whose ids can point at padded
    # or self columns; the f32 path drops them by distance, but the
    # rescore recomputes finite distances from ids -- re-assert the
    # masks on the exact values.
    invalid = ids_c >= num_r
    if exclude_self:
        rows = jnp.arange(num_q, dtype=jnp.int32)[:, None]
        invalid = invalid | (ids_c == rows)
    d2 = jnp.where(invalid, jnp.inf, d2)
    neg_d, sel = jax.lax.top_k(-d2, k)
    ids = jnp.take_along_axis(ids_c, sel, axis=1)
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), ids
