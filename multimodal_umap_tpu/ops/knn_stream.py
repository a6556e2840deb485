"""Scale-out exact kNN: column streaming + ring-sharded references.

The default engine (ops/knn.py) computes ``row_block x N`` panels, so
peak memory grows linearly with the reference count N and the full
reference table is replicated per device under the mesh
(parallel/mesh.py). Both stop scaling past ~100k points (a 128k^2 f32
panel row-block is 4 GB; a replicated 1M x 4096 table is 16 GB). This
module is the SURVEY.md §5.7 design -- the project's ring-attention
analogue:

* :func:`knn_streamed` -- single device: the column axis is blocked
  too; each (row_block, col_block) panel merges into a running
  per-row k-best via concat + ``lax.top_k`` over 2k candidates. Peak
  memory is ``row_block * col_block`` + ``row_block * 2k``, independent
  of N. Both block loops are ``lax.scan``s inside ONE compiled
  program: at 262k the host-driven variant issued 256 panel dispatches
  whose per-RPC tunnel latency dominated the sweep (minutes of wall
  for ~20 s of panel math); the scanned form is a single dispatch.
  (Round 1 measured a scan-carried merge "20x slower to compile at no
  runtime win" -- that held at 31k where 4 full-width panels saturate
  the device; past the 4 GiB panel threshold the dispatch count grows
  as (N/row_block)*(N/col_block) and the trade inverts. Small-N cold
  runs pay the scan's compile cost once per (shape, k); the persistent
  on-disk compile cache -- utils/cache.py, enabled by every entry
  point -- amortizes it across processes, which is why no host-loop
  small-N special case is kept.)

* :func:`knn_ring` -- multi-chip: queries AND references both row-shard
  across the mesh (no replicated table). Each device computes its query
  shard against the reference shard it currently holds, merges into its
  running k-best with global column ids, then passes the shard around
  the ring with ``lax.ppermute`` (ICI neighbor exchange). After
  ``mesh_size`` steps every query row has seen every reference row;
  results come back row-sharded. Peak per-device memory is
  ``(Q/P) * (N/P)`` panel + one (N/P, D) shard in flight.

Both engines support the bf16-panel + exact-f32-rescore design of
ops/knn.py: panels *rank* a widened candidate set at single-pass MXU
speed; candidates are re-scored exactly (direct ``sum((q-r)^2)`` form)
before the final top-k, so returned distances are always exact f32.
The streamed sweep carries the widened candidate set across column
blocks and re-scores once at the end; the ring re-scores per step
against the resident shard (a local gather -- the table is never
replicated). Per-panel selection rides the exact hierarchical
bin-min pruning of ops/knn.py:hier_topk_smallest (measured ~2.5x the
speed of full-width ``lax.top_k`` at identical results).

No counterpart exists in the reference (single device, NN-descent,
SURVEY.md §2.9); cited design: SURVEY.md §5.7, §2.9 "all-gather (ICI)
ring over column blocks".
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .knn import _candidate_width, _exact_rescore_sq, hier_topk_smallest

_INF = jnp.float32(jnp.inf)


def dispatch_flops_budget() -> float:
    """Max panel FLOPs a single fused-sweep dispatch may carry
    (``MMUMAP_KNN_DISPATCH_FLOPS``; ~<=20 s of bf16 panel math at the
    default). See :func:`knn_streamed` for why the cap exists. The
    default was 1e15 (~60 s dispatches): the 1M sweep's chunks at that
    length still reproducibly killed the tunneled worker mid-dispatch,
    while ~40 s dispatches survive -- 3e14 keeps each chunk well clear
    of the limit for ~1 s of total extra RPC latency at 1M."""
    return float(os.environ.get("MMUMAP_KNN_DISPATCH_FLOPS", 3e14))


def exceeds_dispatch_budget(num_q: int, num_r: int, dim: int) -> bool:
    """True when a (num_q x num_r x dim) sweep must be host-chunked --
    callers that normally fuse the kNN into a larger jitted program
    (models/encoder.py) switch to the eager chunked engine, because
    host-level chunking cannot run under a trace."""
    return 2.0 * num_q * num_r * dim > dispatch_flops_budget()


def _panel_sq(
    q_blk: jax.Array, r_blk: jax.Array, bf16: bool = False
) -> jax.Array:
    """Squared-distance panel on the MXU (|q|^2 + |r|^2 - 2 q r^T).

    With ``bf16`` the matmul runs single-pass bf16 (f32 accumulation):
    ~6x the f32-highest FLOP rate, values good only for *ranking*.

    Inputs may be stored bf16 (beyond-HBM feature tables -- a 1M x 4096
    f32 table is 16.8 GB, over one v5e's HBM): the squared-norm
    reductions upcast to f32 element-wise (XLA fuses the upcast, no
    materialized copy) and the cross term feeds the MXU at its native
    input dtype.
    """
    qf = q_blk.astype(jnp.float32)
    rf = r_blk.astype(jnp.float32)
    q_sq = jnp.sum(qf * qf, axis=1, keepdims=True)
    r_sq = jnp.sum(rf * rf, axis=1)
    if bf16:
        cross = jnp.dot(
            q_blk.astype(jnp.bfloat16), r_blk.astype(jnp.bfloat16).T,
            preferred_element_type=jnp.float32,
        )
    else:
        cross = jnp.dot(
            qf, rf.T,
            preferred_element_type=jnp.float32,
            precision="highest",
        )
    panel = q_sq + r_sq[None, :] - 2.0 * cross
    return jnp.maximum(panel, 0.0)


def _merge_topk(
    best_d: jax.Array,
    best_i: jax.Array,
    cand_d: jax.Array,
    cand_i: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merges (rows, k) running best with (rows, c) candidates."""
    d_all = jnp.concatenate([best_d, cand_d], axis=1)
    i_all = jnp.concatenate([best_i, cand_i], axis=1)
    neg_d, sel = jax.lax.top_k(-d_all, k)
    return -neg_d, jnp.take_along_axis(i_all, sel, axis=1)


def _panel_merge(
    q_blk: jax.Array,
    r_blk: jax.Array,
    row_offset: jax.Array,
    col_offset: jax.Array,
    num_valid_cols: jax.Array,
    best_d: jax.Array,
    best_i: jax.Array,
    k: int,
    exclude_self: bool,
    bf16: bool,
) -> tuple[jax.Array, jax.Array]:
    """One (row_block, col_block) panel merged into the running k-best.

    ``best_d`` carries SQUARED distances during streaming (sqrt once at
    the end; bf16-approximate values when ``bf16`` -- re-scored by the
    caller). Padded columns (global id >= num_valid_cols) are masked.
    """
    panel = _panel_sq(q_blk, r_blk, bf16=bf16)
    cols = col_offset + jnp.arange(r_blk.shape[0], dtype=jnp.int32)
    panel = jnp.where(cols[None, :] >= num_valid_cols, _INF, panel)
    if exclude_self:
        rows = row_offset + jnp.arange(q_blk.shape[0], dtype=jnp.int32)
        panel = jnp.where(cols[None, :] == rows[:, None], _INF, panel)
    c = min(k, r_blk.shape[0])
    d, ids = hier_topk_smallest(panel, c)
    return _merge_topk(best_d, best_i, d, cols[ids], k)


@functools.partial(
    jax.jit,
    static_argnames=("k", "exclude_self", "row_block", "col_block", "bf16"),
)
def _stream_all(
    q: jax.Array,
    r: jax.Array,
    num_valid_cols: jax.Array,
    row_offset0: jax.Array,
    k: int,
    exclude_self: bool,
    row_block: int,
    col_block: int,
    bf16: bool,
) -> tuple[jax.Array, jax.Array]:
    """The full block sweep as nested ``lax.scan``s -- ONE dispatch.

    ``q``/``r`` must already be padded to block multiples; reshaping to
    (blocks, block, D) is layout-free, so the scans stream slices of
    the original tables without copies. ``k`` here is the carried
    selection width (the caller widens it to the candidate width in
    bf16 mode). ``row_offset0`` is the global id of query row 0 (used
    by the exclude-self mask when the caller sweeps a query CHUNK of a
    larger table -- see the dispatch budget in :func:`knn_streamed`).
    """
    n_rb = q.shape[0] // row_block
    n_cb = r.shape[0] // col_block
    q_blocks = q.reshape(n_rb, row_block, q.shape[1])
    r_blocks = r.reshape(n_cb, col_block, r.shape[1])
    row_offs = row_offset0 + jnp.arange(n_rb, dtype=jnp.int32) * row_block
    col_offs = jnp.arange(n_cb, dtype=jnp.int32) * col_block

    def row_step(_, rx):
        q_blk, row_off = rx

        def col_step(carry, cx):
            r_blk, col_off = cx
            return _panel_merge(
                q_blk, r_blk, row_off, col_off, num_valid_cols,
                carry[0], carry[1], k, exclude_self, bf16,
            ), None

        init = (
            jnp.full((row_block, k), _INF),
            jnp.full((row_block, k), -1, dtype=jnp.int32),
        )
        (best_d, best_i), _ = jax.lax.scan(
            col_step, init, (r_blocks, col_offs)
        )
        return None, (best_d, best_i)

    _, (d, i) = jax.lax.scan(row_step, None, (q_blocks, row_offs))
    return d.reshape(-1, k), i.reshape(-1, k)


@functools.partial(
    jax.jit, static_argnames=("k", "exclude_self", "chunk")
)
def _rescore_topk(
    q: jax.Array,
    r: jax.Array,
    cand_i: jax.Array,
    num_valid_cols: jax.Array,
    row_offset0: jax.Array,
    k: int,
    exclude_self: bool,
    chunk: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact f32 re-score of streamed candidates + final top-k."""
    safe_ids = jnp.clip(cand_i, 0, r.shape[0] - 1)
    d2 = _exact_rescore_sq(q, r, safe_ids, chunk)
    invalid = (cand_i < 0) | (cand_i >= num_valid_cols)
    if exclude_self:
        rows = (row_offset0
                + jnp.arange(q.shape[0], dtype=jnp.int32))[:, None]
        invalid = invalid | (cand_i == rows)
    d2 = jnp.where(invalid, _INF, d2)
    neg_d, sel = jax.lax.top_k(-d2, k)
    ids = jnp.take_along_axis(cand_i, sel, axis=1)
    return jnp.sqrt(jnp.maximum(-neg_d, 0.0)), ids


@functools.partial(
    jax.jit,
    static_argnames=("k", "exclude_self", "row_block", "col_block", "bf16",
                     "num_valid_cols"),
)
def _streamed_fused(
    q: jax.Array,
    r: jax.Array,
    row_offset0: jax.Array,
    k: int,
    exclude_self: bool,
    row_block: int,
    col_block: int,
    bf16: bool,
    num_valid_cols: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Pad + sweep + (rescore) + slice as ONE program: on the tunneled
    single-host setup every separate dispatch costs ~29 ms of RPC/sync
    latency -- at flickr scale that is comparable to the whole device
    work, so the entire engine compiles to a single executable.
    ``row_offset0``: global id of query row 0 (exclude-self under the
    dispatch-budget query chunking of :func:`knn_streamed`).
    ``num_valid_cols``: true reference count when ``r`` arrives already
    padded to a ``col_block`` multiple (the chunked caller pads ONCE --
    re-padding the full table inside every per-chunk dispatch would
    materialize a whole extra (N, D) copy per dispatch)."""
    num_q, num_r = q.shape[0], r.shape[0]
    if num_valid_cols is None:
        num_valid_cols = num_r
    n_rb = -(-num_q // row_block)
    n_cb = -(-num_r // col_block)
    q_pad = q
    if n_rb * row_block != num_q:
        q_pad = jnp.pad(q, ((0, n_rb * row_block - num_q), (0, 0)))
    r_pad = r
    if n_cb * col_block != num_r:
        r_pad = jnp.pad(r, ((0, n_cb * col_block - num_r), (0, 0)))

    sel_width = (
        _candidate_width(k, num_valid_cols - (1 if exclude_self else 0))
        if bf16 else k
    )
    best_d, best_i = _stream_all(
        q_pad, r_pad, jnp.int32(num_valid_cols), row_offset0, sel_width,
        exclude_self, row_block, col_block, bf16,
    )
    if bf16:
        return _rescore_topk(
            q, r_pad, best_i[:num_q], jnp.int32(num_valid_cols),
            row_offset0, k, exclude_self, chunk=512,
        )
    return jnp.sqrt(best_d[:num_q]), best_i[:num_q]


def knn_streamed(
    queries: jax.Array,
    references: jax.Array,
    k: int,
    *,
    exclude_self: bool = False,
    row_block: int = 8192,
    col_block: int = 32768,
    bf16: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Exact kNN with both axes blocked; memory independent of N.

    Same contract as :func:`..knn.knn`: returns (Q, k) ascending
    Euclidean distances and int32 reference ids. With ``bf16`` the
    sweep ranks a widened candidate set at bf16 speed and re-scores it
    exactly at the end (see module docstring). The whole engine is one
    dispatch (:func:`_streamed_fused`).

    bf16-STORED tables pass through without an f32 copy (the copy is
    what would not fit -- that is why they are bf16); ranking is then
    forced to the bf16 path and the re-score upcasts per chunk, so
    distances are exact w.r.t. the stored values.

    DISPATCH BUDGET: a single fused sweep at N=1M runs for several
    MINUTES of device time in one executable, and the axon-tunneled
    worker reproducibly dies under it (measured: the 1M x 1M D=768
    sweep crashes the worker; the 512k sweep, ~40 s, completes). Past
    ``MMUMAP_KNN_DISPATCH_FLOPS`` (default 1e15 ~ <=60 s of bf16 panel
    math) the query axis is therefore chunked at the HOST level: each
    chunk is the same fused executable (compiled once), synced before
    the next dispatch, so no single dispatch exceeds the budget. The
    extra RPC cost is ~29 ms x (chunks - 1) -- noise at this scale.
    """
    q = jnp.asarray(queries)
    r = jnp.asarray(references)
    if r.dtype == jnp.bfloat16 or q.dtype == jnp.bfloat16:
        bf16 = True
    else:
        q = q.astype(jnp.float32)
        r = r.astype(jnp.float32)
    num_q, num_r = q.shape[0], r.shape[0]
    if k > num_r - (1 if exclude_self else 0):
        raise ValueError(f"k={k} exceeds available references ({num_r})")
    row_block = min(row_block, num_q)
    col_block = min(col_block, num_r)

    tracing = isinstance(q, jax.core.Tracer) or isinstance(
        r, jax.core.Tracer)
    total_flops = 2.0 * num_q * num_r * q.shape[1]
    if (tracing or total_flops <= dispatch_flops_budget()
            or num_q <= row_block):
        # Under a trace the host chunk loop cannot sync, so the sweep
        # stays one program -- eager callers past the budget go through
        # exceeds_dispatch_budget() and call this function eagerly.
        return _streamed_fused(
            q, r, jnp.int32(0), k, exclude_self, row_block, col_block,
            bf16,
        )

    # Query chunks: multiples of row_block, each within the budget.
    rows_per_budget = max(
        1, int(dispatch_flops_budget() / (2.0 * num_r * q.shape[1])))
    q_chunk = max(row_block, rows_per_budget // row_block * row_block)
    n_chunks = -(-num_q // q_chunk)
    q_pad = q
    if n_chunks * q_chunk != num_q:
        q_pad = jnp.pad(q, ((0, n_chunks * q_chunk - num_q), (0, 0)))
    # Pad the reference table to a col_block multiple ONCE: done inside
    # _streamed_fused it would materialize a full extra (N, D) copy in
    # every per-chunk dispatch.
    n_cb = -(-num_r // col_block)
    r_pad = r
    if n_cb * col_block != num_r:
        r_pad = jnp.pad(r, ((0, n_cb * col_block - num_r), (0, 0)))
        np.asarray(r_pad[:1, :1])  # materialize before the loop
    d_parts, i_parts = [], []
    for c in range(n_chunks):
        d, i = _streamed_fused(
            jax.lax.dynamic_slice_in_dim(q_pad, c * q_chunk, q_chunk),
            r_pad, jnp.int32(c * q_chunk), k, exclude_self, row_block,
            col_block, bf16, num_valid_cols=num_r,
        )
        # True host sync between dispatches: on the tunnel only a
        # readback drains the queue, and the point of chunking is that
        # no in-flight window exceeds the budget.
        np.asarray(d[:1, :1])
        d_parts.append(d)
        i_parts.append(i)
    dists = jnp.concatenate(d_parts)[:num_q]
    ids = jnp.concatenate(i_parts)[:num_q]
    return dists, ids


def knn_ring(
    queries: jax.Array,
    references: jax.Array,
    k: int,
    mesh: jax.sharding.Mesh,
    *,
    exclude_self: bool = False,
    axis: str | None = None,
    bf16: bool | None = None,
    num_valid_rows: int | None = None,
    num_valid_cols: int | None = None,
    rescore_chunk: int = 512,
    lower_only: bool = False,
) -> tuple[jax.Array, jax.Array] | str:
    """Exact kNN with the reference table ring-sharded over the mesh.

    Queries and references must both have row counts divisible by the
    mesh size (use :func:`pad_rows_to_multiple` at the caller and pass
    the true counts via ``num_valid_rows``/``num_valid_cols`` -- padded
    columns are masked out of every panel; padded query rows return
    garbage the caller slices off). Results return row-sharded over the
    same axis. ``exclude_self`` requires queries and references to be
    the same table (fit mode).

    ``bf16`` (default: on when the backend is TPU) ranks each resident
    shard's panel in bf16, then re-scores the shard-local candidates
    exactly with a chunked local gather before merging -- the full
    reference table is never replicated and returned distances are
    exact f32.

    ``lower_only`` returns the compiled HLO text instead of running
    (communication-volume testing, parallel/collectives.py): the ring
    must move exactly P-1 collective-permutes of one (N/P, D) shard and
    nothing else -- no all-gather of the table.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel.mesh import DATA_AXIS

    axis = axis or DATA_AXIS
    if bf16 is None:
        bf16 = jax.default_backend() == "tpu"
    p = int(mesh.shape[axis])
    num_q, num_r = queries.shape[0], references.shape[0]
    n_valid_q = num_q if num_valid_rows is None else int(num_valid_rows)
    n_valid_r = num_r if num_valid_cols is None else int(num_valid_cols)
    if num_q % p or num_r % p:
        raise ValueError(
            f"knn_ring needs row counts divisible by mesh size {p}; "
            f"got Q={num_q}, N={num_r} (pad at the caller)"
        )
    if exclude_self and num_q != num_r:
        raise ValueError("exclude_self requires queries == references")
    if k > n_valid_r - (1 if exclude_self else 0):
        raise ValueError(f"k={k} exceeds available references ({n_valid_r})")

    q_rows, r_rows = num_q // p, num_r // p
    perm = [(j, (j + 1) % p) for j in range(p)]
    sel_width = (
        min(_candidate_width(k, n_valid_r - (1 if exclude_self else 0)),
            r_rows)
        if bf16 else min(k, r_rows)
    )
    chunk = min(rescore_chunk, q_rows)

    def body(q_shard, r_shard):
        me = jax.lax.axis_index(axis)
        rows = me * q_rows + jnp.arange(q_rows, dtype=jnp.int32)
        best_d = jnp.full((q_rows, k), _INF)
        best_i = jnp.full((q_rows, k), -1, dtype=jnp.int32)
        cur = r_shard
        for step in range(p):
            # After `step` rotations, this device holds the shard that
            # started at (me - step) mod p.
            col_offset = ((me - step) % p) * r_rows
            panel = _panel_sq(q_shard, cur, bf16=bf16)
            cols = col_offset + jnp.arange(r_rows, dtype=jnp.int32)
            invalid_col = cols[None, :] >= n_valid_r
            if exclude_self:
                invalid_col = invalid_col | (cols[None, :] == rows[:, None])
            panel = jnp.where(invalid_col, _INF, panel)
            d_sel, local_ids = hier_topk_smallest(panel, sel_width)
            if bf16:
                # Exact re-score against the RESIDENT shard: a local
                # gather, chunked to bound the (chunk, c, D) transient.
                d2 = _exact_rescore_sq(q_shard, cur, local_ids, chunk)
                gids = cols[local_ids]
                invalid = gids >= n_valid_r
                if exclude_self:
                    invalid = invalid | (gids == rows[:, None])
                d2 = jnp.where(invalid, _INF, d2)
            else:
                d2 = d_sel
                gids = cols[local_ids]
            best_d, best_i = _merge_topk(best_d, best_i, d2, gids, k)
            if step < p - 1:
                if cur.dtype == jnp.bfloat16:
                    # Rotate the RAW bf16 bits: XLA otherwise sinks the
                    # panel's f32 upcast through the ppermute and moves
                    # a 2x-sized f32 shard around the ring (verified in
                    # lowered HLO; tests/test_layout_sharded_collectives
                    # gates the wire bytes).
                    bits = jax.lax.bitcast_convert_type(cur, jnp.uint16)
                    bits = jax.lax.ppermute(bits, axis, perm)
                    cur = jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
                else:
                    cur = jax.lax.ppermute(cur, axis, perm)
        return jnp.sqrt(jnp.maximum(best_d, 0.0)), best_i

    def _stored(x):
        # Preserve bf16 storage: upcasting here would materialize a
        # 2x-sized per-shard copy of the very tables feature_dtype
        # halves, and double the ppermute ring's ICI bytes. _panel_sq /
        # _exact_rescore_sq upcast element-wise where math needs f32.
        x = jnp.asarray(x)
        if x.dtype != jnp.bfloat16:
            x = x.astype(jnp.float32)
        return x

    shard = NamedSharding(mesh, P(axis, None))
    q = jax.device_put(_stored(queries), shard)
    r = jax.device_put(_stored(references), shard)
    fn = jax.jit(
        jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(axis, None), P(axis, None)),
            out_specs=(P(axis, None), P(axis, None)),
        )
    )
    del n_valid_q  # padded query rows: garbage out, caller slices
    if lower_only:
        return fn.lower(q, r).compile().as_text()
    return fn(q, r)


def pad_rows_to_multiple(x: np.ndarray | jax.Array, multiple: int):
    """(array padded with zero rows to a multiple, original row count)."""
    n = x.shape[0]
    padded = -(-n // multiple) * multiple
    if padded == n:
        return x, n
    return jnp.pad(jnp.asarray(x), ((0, padded - n), (0, 0))), n
