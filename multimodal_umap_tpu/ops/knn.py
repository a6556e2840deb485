"""Exact k-nearest-neighbor search, tiled for the TPU MXU.

The reference builds an *approximate*, randomized kNN graph with
NN-descent over sparse COO tensors (reference impl/model.py:63-209).
On TPU the idiomatic design is an **exact** blocked search: distance
panels ``|q|^2 + |r|^2 - 2 q r^T`` are computed on the MXU for a block
of query rows against ALL reference columns, followed by one full-width
``lax.top_k`` -- no sparse bookkeeping, fixed (Q, k) output shapes, and
a strict quality upgrade over NN-descent (SURVEY.md §2.10i).

Engines (``engine=`` argument, or the ``MMUMAP_KNN_ENGINE`` env var):

* ``bf16`` (TPU default) -- the panel matmul runs single-pass bf16 on
  the MXU with f32 accumulation (~6x the FLOP rate of f32-highest,
  which the MXU emulates in multiple bf16 passes), ranking a widened
  candidate set (>= 2k per row); the candidates are then re-scored
  EXACTLY in f32 with the direct ``sum((q - r)^2)`` form -- more
  accurate than the expanded form, which cancels catastrophically for
  near-duplicates -- and the true top-k selected from them. Distances
  returned are exact f32; ids are exact whenever every true neighbor
  ranks inside the candidate set under bf16 scoring (bf16 rounding is
  ~0.4% relative; verified tie-aware vs a float64 oracle in
  tests/test_knn.py and tools/run_knn_oracle.py). Runs on the
  single-dispatch streamed sweep (ops/knn_stream.py) at every size:
  on the tunneled single-host setup each dispatch costs ~29 ms of RPC
  latency, so host-side block loops lose to one fused program.
* ``xla`` (CPU default) -- exact f32 ``precision="highest"`` panels +
  hierarchical exact selection, row-blocked at the host level (every
  block reuses one compiled kernel); streams past the ~4 GiB panel
  threshold.
* ``pallas`` (TPU only) -- fused Pallas panel/top-k kernel
  (ops/knn_pallas.py; kept as an explicit option -- measured slower
  than the streamed bf16 engine at flickr scale because its per-tile
  min-extraction loop outweighs the fused-panel win).
* ``approx`` -- ``lax.approx_max_k`` (TPU PartialReduce), recall ~0.99+.
* ``stream`` -- column-streamed engine (ops/knn_stream.py), explicit.

Selection: ``lax.top_k`` over a full-width panel costs as much as the
bf16 matmul that produced it (~38 ms vs ~30 ms per 8192 x 31744 block
on v5e). :func:`hier_topk_smallest` replaces it everywhere with an
EXACT two-level selection (per-bin minima -> top bins -> members),
measured ~2.5x faster at equal results.

Distances are Euclidean (not squared), matching the reference's
``LA.vector_norm`` convention (impl/model.py:109) which feeds the
sigma/rho solver.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

_INF = jnp.float32(jnp.inf)

# Valid engine names (module docstring / main.py --knn_engine).
_ENGINES = frozenset({"bf16", "xla", "pallas", "approx", "stream"})


def resolve_engine(engine: str | None = None) -> str:
    """Engine resolution: explicit argument > MMUMAP_KNN_ENGINE env var
    > backend default (bf16 on TPU, xla elsewhere).

    Resolved at the *caller* (encoder / CLI) and threaded into jitted
    graph builders as a static argument, so an env-var change can never
    be masked by a stale jit-cache entry.

    Unknown names raise: silently falling through to the full-width f32
    panel path would skip the streaming guard (an 8192 x N f32 panel is
    ~17 GB at N=524k) and run a different engine than requested.
    """
    resolved = engine or os.environ.get("MMUMAP_KNN_ENGINE", "") or (
        "bf16" if jax.default_backend() == "tpu" else "xla"
    )
    if resolved not in _ENGINES:
        raise ValueError(
            f"unknown kNN engine {resolved!r}; expected one of "
            f"{sorted(_ENGINES)}")
    return resolved


def _candidate_width(k: int, n_avail: int) -> int:
    """Candidate-set width for the bf16 engine: >= 2x margin over k,
    rounded up to a multiple of 8 (top_k-friendly), capped at the
    available reference count."""
    cand = max(2 * k, k + 16)
    cand = ((cand + 7) // 8) * 8
    return min(cand, n_avail)


def hier_topk_smallest(
    panel: jax.Array,
    c: int,
    bin_size: int = 64,
    bin_margin: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """EXACT per-row c smallest panel entries via bin-min pruning.

    ``lax.top_k`` over a (rows, W) panel costs ~38 ms per 8192 x 31744
    f32 block on v5e -- comparable to the bf16 distance matmul that
    produced it. This helper reduces the panel to per-bin minima (one
    cheap VPU pass), keeps the B = c + margin best bins per row, and
    runs the expensive selection only on their members: measured 15 ms
    per block, identical results.

    Exactness: at most c-1 entries are strictly smaller than the c-th
    value d_(c), so at most c-1 bins have min < d_(c) and every bin
    containing a top-c entry ranks within the top (c-1) + ties bins by
    min. With B >= c the kept bins therefore contain every entry
    < d_(c) plus at least enough entries == d_(c): the returned VALUES
    are always exact, ids exact up to permutations of exact ties (the
    same guarantee lax.top_k gives). The margin only pads against tie
    crowding at the boundary.

    Returns (vals ascending, column ids), both (rows, c).
    """
    rows, w = panel.shape
    nb = -(-w // bin_size)
    if nb < c + bin_margin or w <= 2 * c:
        # Too few bins to prune anything -- plain top_k is optimal.
        neg, idx = jax.lax.top_k(-panel, min(c, w))
        return -neg, idx.astype(jnp.int32)
    padded = nb * bin_size
    if padded != w:
        panel = jnp.pad(panel, ((0, 0), (0, padded - w)),
                        constant_values=jnp.inf)
    p3 = panel.reshape(rows, nb, bin_size)
    mins = p3.min(axis=2)
    b = min(nb, c + bin_margin)
    _, bins = jax.lax.top_k(-mins, b)  # (rows, b) best bins by min
    members = jnp.take_along_axis(p3, bins[:, :, None], axis=1)
    neg, pos = jax.lax.top_k(-members.reshape(rows, b * bin_size), c)
    cols = (
        jnp.take_along_axis(bins, pos // bin_size, axis=1) * bin_size
        + pos % bin_size
    )
    return -neg, cols.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("chunk",))
def _exact_rescore_sq(
    q: jax.Array, references: jax.Array, ids: jax.Array, chunk: int
) -> jax.Array:
    """Exact f32 squared distances of each query to its candidate rows.

    Direct ``sum((q - r)^2)`` form (no cancellation). The (rows, cand,
    D) candidate gather is the transient -- scanned in ``chunk``-row
    slices so peak extra memory is ``chunk * cand * D`` floats.
    bf16-stored tables upcast per chunk, so "exact" means exact w.r.t.
    the stored values at every storage dtype.
    """
    num_q, cand = ids.shape
    pad = -(-num_q // chunk) * chunk - num_q
    if pad:
        q = jnp.pad(q, ((0, pad), (0, 0)))
        ids = jnp.pad(ids, ((0, pad), (0, 0)))
    qs = q.reshape(-1, chunk, q.shape[1])
    idss = ids.reshape(-1, chunk, cand)

    def chunk_step(_, xs):
        q_c, id_c = xs
        rows = references[id_c].astype(jnp.float32)  # (chunk, cand, D)
        diff = q_c.astype(jnp.float32)[:, None, :] - rows
        return None, jnp.sum(diff * diff, axis=2)

    _, d2 = jax.lax.scan(chunk_step, None, (qs, idss))
    return d2.reshape(-1, cand)[:num_q]


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
    d, ids = hier_topk_smallest(panel, k)
    del num_valid_rows  # rows beyond Q are padding; caller slices them off
    return jnp.sqrt(jnp.maximum(d, 0.0)), ids


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
    engine: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exact kNN of ``queries`` against ``references``.

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
        precision: matmul precision for the "xla" engine.
        engine: see module docstring; None resolves via
            :func:`resolve_engine`.

    Returns:
        (dists, ids): (Q, k) Euclidean distances (ascending per row) and
        (Q, k) int32 reference indices.
    """
    engine = resolve_engine(engine)
    bf16_stored = (
        getattr(queries, "dtype", None) == jnp.bfloat16
        or getattr(references, "dtype", None) == jnp.bfloat16
    )
    if (engine == "pallas" and jax.default_backend() == "tpu"
            and not bf16_stored):
        # bf16-STORED tables skip the Pallas kernel: it upcasts both
        # tables to f32, materializing exactly the full-size copies
        # feature_dtype="bfloat16" exists to avoid -- they route
        # through the streamed rank+rescore path like every other
        # engine value.
        from .knn_pallas import knn_pallas

        return knn_pallas(queries, references, k, exclude_self=exclude_self)

    # The bf16 engine and the column-streamed engine share one body:
    # knn_streamed runs the whole row/column block sweep as ONE
    # dispatch (nested lax.scans) -- on the tunneled single-host setup
    # each dispatch costs ~29 ms of RPC latency, so a host-side block
    # loop would spend more time on round-trips than on math. The
    # streamed sweep degrades gracefully to a single panel at small
    # sizes. engine="xla" keeps flat per-block dispatches below the
    # ~4 GiB panel threshold and streams above it -- WITHOUT switching
    # rank precision: an explicit "xla" is the exact-f32-highest
    # isolation baseline the bf16 path is validated against, so its
    # streamed panels stay f32 at every size.
    panel_bytes = 4 * row_block * references.shape[0]
    if bf16_stored or engine in ("bf16", "stream") or (
        engine == "xla" and panel_bytes > 4 * 1024**3
    ):
        from .knn_stream import knn_streamed

        # engine="stream" keeps bf16 ranking on TPU (f32 elsewhere);
        # MMUMAP_STREAM_F32=1 forces f32-highest panels for isolation.
        # bf16-stored tables need no term here: knn_streamed forces
        # bf16 ranking itself whenever either input is stored bf16.
        bf16 = engine == "bf16" or (
            engine == "stream"
            and jax.default_backend() == "tpu"
            and os.environ.get("MMUMAP_STREAM_F32", "") != "1"
        )
        return knn_streamed(
            queries, references, k, exclude_self=exclude_self,
            row_block=row_block, bf16=bf16,
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
