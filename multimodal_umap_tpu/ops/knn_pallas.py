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
    panel_ref[:] += -2.0 * jnp.dot(
        q_tile, r_tile.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # Squared norms accumulate across d tiles in VMEM scratch (passing
    # them as 1-D inputs trips Mosaic/XLA layout disagreements).
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
        "k", "exclude_self", "tile_r", "tile_c", "tile_d", "interpret"
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
) -> tuple[jax.Array, jax.Array]:
    """Exact kNN via the fused Pallas panel/top-k kernel.

    Same contract as :func:`multimodal_umap_tpu.ops.knn.knn`: returns
    ((Q, k) ascending Euclidean distances, (Q, k) int32 ids).
    """
    q = queries.astype(jnp.float32)
    r = references.astype(jnp.float32)
    num_q, dim = q.shape
    num_r = r.shape[0]
    if k > num_r - (1 if exclude_self else 0):
        raise ValueError(f"k={k} exceeds available references ({num_r})")
    if k > tile_c:
        raise ValueError(f"k={k} exceeds tile_c={tile_c}")

    def pad_to(x, m, axis):
        size = x.shape[axis]
        padded = -(-size // m) * m
        if padded == size:
            return x
        widths = [(0, 0)] * x.ndim
        widths[axis] = (0, padded - size)
        return jnp.pad(x, widths)

    q = pad_to(pad_to(q, tile_r, 0), tile_d, 1)
    r = pad_to(pad_to(r, tile_c, 0), tile_d, 1)

    num_ri = q.shape[0] // tile_r
    num_cj = r.shape[0] // tile_c
    num_dk = q.shape[1] // tile_d

    kernel = functools.partial(
        _knn_tile_kernel,
        k=k, num_r=num_r, tile_r=tile_r, tile_c=tile_c,
        exclude_self=exclude_self,
    )
    d_cand, i_cand = pl.pallas_call(
        kernel,
        grid=(num_ri, num_cj, num_dk),
        in_specs=[
            pl.BlockSpec((tile_r, tile_d), lambda i, j, d: (i, d)),
            pl.BlockSpec((tile_c, tile_d), lambda i, j, d: (j, d)),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_r, k), lambda i, j, d: (j, i, 0)),
            pl.BlockSpec((1, tile_r, k), lambda i, j, d: (j, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_cj, q.shape[0], k), jnp.float32),
            jax.ShapeDtypeStruct((num_cj, q.shape[0], k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_r, tile_c), jnp.float32),
            pltpu.VMEM((tile_r, 1), jnp.float32),
            pltpu.VMEM((tile_c, 1), jnp.float32),
        ],
        interpret=pltpu.InterpretParams() if interpret else False,
    )(q, r)

    # Exact cross-tile merge: top-k over all tiles' candidates.
    cand_d = d_cand[:, :num_q].transpose(1, 0, 2).reshape(num_q, num_cj * k)
    cand_i = i_cand[:, :num_q].transpose(1, 0, 2).reshape(num_q, num_cj * k)
    neg_d, pos = jax.lax.top_k(-cand_d, k)
    ids = jnp.take_along_axis(cand_i, pos, axis=1)
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), ids
