"""shard_map layout epoch: O(table) collectives, not O(uses x table).

VERDICT r2 next-step 3. Under GSPMD the fit epoch's collective volume
measured ~22x the (N, D) embedding table per device per epoch
(tools/inspect_epoch_collectives.py): every global gather re-gathered
the table (4 full-table all-gathers), ``jnp.roll`` with a traced offset
lowered to concat-then-slice (4 MORE all-gathers at 2x table each), and
the gradient came back as a full all-reduce instead of a reduce-scatter.

This engine replaces declarative GSPMD with an explicit
``jax.shard_map`` program whose communication is the textbook minimum
for a row-sharded embedding table with k-neighbor gathers (k > P, so
one table all-gather beats per-neighbor fetches -- see the tool's
docstring):

  * forward: ONE ``all_gather`` of each modality's (N, D) table per
    epoch -- every neighbor / negative / InfoNCE access then reads the
    local gathered copy;
  * backward: the all-gather's VJP is ONE ``psum_scatter`` of the
    accumulated (N, D) cotangent per modality -- attraction, repulsion
    and InfoNCE gradient paths merge into it;
  * bookkeeping: one (N,) psum (transposed-slot counts) and one (N,)
    all-gather (row counts) -- negligible next to the table;
  * transform/invert: the frozen reference table is gathered ONCE PER
    CHUNK (it is scan-invariant), after which epochs run with NO
    table-sized collectives at all -- only the scalar loss psum.

Measured on the 8-device virtual mesh: fit-epoch collective bytes drop
from ~22x to ~4.3x the table (2 modalities: 1 AG + 1 RS each, float32),
asserted by tests/test_sharding.py::test_sharded_fit_epoch_collectives.

PRNG exactness: every random draw is made at FULL table shape with the
same key on every device and sliced to the local rows, so the sharded
trajectory reproduces the single-program path bit-for-bit at draw level
(reduction order still differs -- equivalence tests use fp tolerance,
tests/test_sharding.py::test_sharded_layout_matches_single_device).

Scale note: the FIT-mode gathered embedding tables are transient per
epoch and materialize (N, out_dim) per device -- communication-optimal,
and small (out_dim=64). The QUERY-mode frozen reference table is the
wide one ((N, feature_dim): 16 GB per device at 1M x 4096 f32 -- over
one v5e's HBM), so past ``MMUMAP_REF_GATHER_BYTES`` (default 1 GiB) it
is never gathered: :func:`_ring_rows` fetches exactly the rows each
query slot needs by rotating the resident (N/P, D) shard around the
mesh ring with ``ppermute`` (VERDICT r3 item 6). Attraction rows are
scan-invariant and ring-gathered ONCE per chunk; negative rows ride one
ring per epoch (same ICI bytes per epoch as one all-gather, but peak
memory stays O(N/P + Q*k*D/P) per device). Draws remain full-shape/
sliced, so the ring trajectory equals the gathered one exactly.

Reference parity: semantics identical to models/layout.py (reference
impl/model.py:396-481); this module only changes WHERE arrays live and
HOW they move.
"""

from __future__ import annotations

import functools
import typing

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from ..ops import losses as L
from ..parallel.mesh import DATA_AXIS
from .layout import (
    LayoutTask,
    TaskStatic,
    _inv_window_coef,
    _window_means_from_rows,
    make_loss_fn,  # noqa: F401  (re-exported for parity tooling)
)


def _slice_rows(full: jax.Array, row0: jax.Array, n_local: int) -> jax.Array:
    return jax.lax.dynamic_slice_in_dim(full, row0, n_local, axis=0)


def _ring_rows(ref_shard: jax.Array, ids: jax.Array,
               p_size: int) -> jax.Array:
    """Rows of a row-sharded table selected by GLOBAL id, via a
    ppermute ring: each device serves the ids that fall in its resident
    shard, then passes the shard to its ring neighbor -- P-1 rotations
    and no shard ever holds more than one (N/P, D) visitor. Returns
    ``(*ids.shape, D)`` in the table's storage dtype (bf16 shards ride
    the ring as raw bits -- same guarantee as ops/knn_stream.knn_ring).
    Must run inside the engine's shard_map."""
    r_rows, d = ref_shard.shape
    me = jax.lax.axis_index(DATA_AXIS)
    perm = [(j, (j + 1) % p_size) for j in range(p_size)]
    out = jnp.zeros((*ids.shape, d), ref_shard.dtype)
    cur = ref_shard
    for step in range(p_size):
        lo = ((me - step) % p_size) * r_rows
        local = ids - lo
        mask = (local >= 0) & (local < r_rows)
        rows = cur[jnp.clip(local, 0, r_rows - 1)]
        out = jnp.where(mask[..., None], rows, out)
        if step < p_size - 1:
            if cur.dtype == jnp.bfloat16:
                bits = jax.lax.bitcast_convert_type(cur, jnp.uint16)
                bits = jax.lax.ppermute(bits, DATA_AXIS, perm)
                cur = jax.lax.bitcast_convert_type(bits, jnp.bfloat16)
            else:
                cur = jax.lax.ppermute(cur, DATA_AXIS, perm)
    return out


def _fit_modality_loss_local(
    embed_local: jax.Array,
    embed_full: jax.Array,
    task: LayoutTask,
    static: TaskStatic,
    key: jax.Array,
    *,
    a: jax.Array,
    b: jax.Array,
    num_rep: int,
    batch_size: int,
) -> jax.Array:
    """Local-shard partial of the fit-mode modality loss: psum over the
    mesh equals models/layout.py:_fit_modality_loss exactly (same keys,
    same draws -- full-shape, sliced; see module docstring)."""
    n_local, k = task.nbrs.shape
    n = static.num_rows
    row0 = jax.lax.axis_index(DATA_AXIS) * n_local
    key_f, key_b, key_neg = jax.random.split(key, 3)

    u_f = _slice_rows(jax.random.uniform(key_f, (n, k)), row0, n_local)
    u_b = _slice_rows(jax.random.uniform(key_b, (n, k)), row0, n_local)
    keep_f = (u_f < task.weights).astype(jnp.float32)
    keep_b = ((u_b < task.weights) & task.bwd_valid).astype(jnp.float32)

    # Transposed-slot counts anchored at every global row: local partial
    # segment-sum + one (N,) psum.
    bwd_cnt = jax.lax.psum(
        jax.ops.segment_sum(
            keep_b.reshape(-1), task.nbrs.reshape(-1), num_segments=n
        ),
        DATA_AXIS,
    )
    rowcnt = (
        jax.lax.all_gather(keep_f.sum(axis=1), DATA_AXIS, tiled=True)
        + bwd_cnt
    )
    inv_row = _inv_window_coef(rowcnt, batch_size, static.num_windows)
    inv_local = _slice_rows(inv_row, row0, n_local)
    coef = keep_f * inv_local[:, None] + keep_b * inv_row[task.nbrs]

    y = embed_full[task.nbrs]  # local gather from the gathered table
    attr = L.umap_attr(embed_local[:, None, :], y, a, b)
    loss_attr = jnp.sum(coef * attr)

    if num_rep == 0:
        return loss_attr

    rep_coef = _slice_rows(rowcnt, row0, n_local) * inv_local

    key_negperm, key_base, key_negoff = jax.random.split(key_neg, 3)
    pi = jax.random.permutation(key_negperm, static.rep_count).astype(
        jnp.int32
    )
    rows_global = row0 + jnp.arange(n_local, dtype=jnp.int32)

    def fold_neg(acc, off):
        # roll(table[pi], -off)[i] == table[pi[(i + off) % n]]: gather
        # the local rows straight from the gathered table. (The VJP is
        # a small (n_local, D) scatter into the table cotangent -- the
        # full-permutation gather-only trick of ops/scatter_free.py
        # needs the whole permuted table, which no shard holds.)
        neg = embed_full[pi[(rows_global + off) % static.rep_count]]
        return acc + L.umap_rep(embed_local, neg, a, b), None

    stride = max(1, static.rep_count // num_rep)
    base = jax.random.randint(key_base, (), 0, static.rep_count)
    intra = jax.random.randint(key_negoff, (num_rep,), 0, stride)
    offs = (
        base + jnp.arange(num_rep, dtype=jnp.int32) * stride + intra
    ) % static.rep_count
    rep_sum, _ = jax.lax.scan(
        fold_neg, jnp.zeros(n_local, dtype=jnp.float32), offs
    )
    return loss_attr + jnp.sum(rep_coef * (rep_sum / num_rep))


def _query_modality_loss_local(
    embed_local: jax.Array,
    task: LayoutTask,
    static: TaskStatic,
    key: jax.Array,
    *,
    mode: str,
    a: jax.Array,
    b: jax.Array,
    num_rep: int,
    batch_size: int,
    p_size: int,
) -> jax.Array:
    """Local partial of the transform/invert loss (task.ref / sigmas /
    rhos arrive FULL -- gathered once per chunk by the runner). Anchor
    gradients are purely local; the only epoch collective left is the
    window-mean bookkeeping ((Q,) all-gathers) and the loss psum."""
    n_local, k = task.nbrs.shape
    q = static.num_rows
    row0 = jax.lax.axis_index(DATA_AXIS) * n_local
    key_keep, key_neg = jax.random.split(key)

    u = _slice_rows(jax.random.uniform(key_keep, (q, k)), row0, n_local)
    keep = (u < task.weights).astype(jnp.float32)

    y_j = task.ref[task.nbrs]
    x = embed_local[:, None, :]
    if mode == "invert":
        attr = L.inv_attr(x, y_j, a, b, task.sigmas[task.nbrs])
    else:
        attr = L.umap_attr(x, y_j, a, b)

    if num_rep > 0:
        def fold_neg(acc, nk):
            neg_full = jax.random.randint(nk, (q, k), 0, static.rep_count)
            neg_idx = _slice_rows(neg_full, row0, n_local)
            y_neg = task.ref[neg_idx]
            if mode == "invert":
                rep = L.inv_rep(
                    x, y_neg, task.sigmas[neg_idx], task.rhos[neg_idx]
                )
            else:
                rep = L.umap_rep(x, y_neg, a, b)
            return acc + rep, None

        rep_sum, _ = jax.lax.scan(
            fold_neg,
            jnp.zeros((n_local, k), dtype=jnp.float32),
            jax.random.split(key_neg, num_rep),
        )
        per_slot = keep * (attr + rep_sum / num_rep)
    else:
        per_slot = keep * attr

    row_vals = jax.lax.all_gather(
        per_slot.sum(axis=1), DATA_AXIS, tiled=True
    )
    row_cnt = jax.lax.all_gather(keep.sum(axis=1), DATA_AXIS, tiled=True)
    win_mean = _window_means_from_rows(
        row_vals, row_cnt, batch_size, static.num_windows
    )
    # Replicated after the gathers; divide so the runner's psum
    # restores it exactly once.
    return jnp.mean(win_mean) / p_size


def _query_modality_loss_ring(
    embed_local: jax.Array,
    y_attr: jax.Array,
    task: LayoutTask,
    static: TaskStatic,
    key: jax.Array,
    *,
    mode: str,
    a: jax.Array,
    b: jax.Array,
    num_rep: int,
    batch_size: int,
    p_size: int,
) -> jax.Array:
    """:func:`_query_modality_loss_local` with the frozen reference
    table kept ROW-SHARDED (``task.ref`` is the local shard): attraction
    rows arrive pre-gathered per chunk (``y_attr``, scan-invariant);
    negative rows are fetched per epoch by :func:`_ring_rows`. Draws are
    full-shape from the same keys as the single-device path, so the
    trajectory matches within reduction-order fp tolerance. ``sigmas``/
    ``rhos`` arrive FULL (they are (N,) -- 4 MB at 1M, not worth
    ringing)."""
    n_local, k = task.nbrs.shape
    q = static.num_rows
    row0 = jax.lax.axis_index(DATA_AXIS) * n_local
    key_keep, key_neg = jax.random.split(key)

    u = _slice_rows(jax.random.uniform(key_keep, (q, k)), row0, n_local)
    keep = (u < task.weights).astype(jnp.float32)

    x = embed_local[:, None, :]
    if mode == "invert":
        attr = L.inv_attr(x, y_attr, a, b, task.sigmas[task.nbrs])
    else:
        attr = L.umap_attr(x, y_attr, a, b)

    if num_rep > 0:
        # Same per-rep keys/draws as the gathered path (full-shape
        # randint, sliced local); ONE ring pass serves every rep.
        neg_idx = jnp.stack([
            _slice_rows(
                jax.random.randint(nk, (q, k), 0, static.rep_count),
                row0, n_local)
            for nk in jax.random.split(key_neg, num_rep)
        ])  # (num_rep, n_local, k)
        y_negs = jax.lax.stop_gradient(
            _ring_rows(task.ref, neg_idx, p_size))

        def fold_neg(acc, xs):
            ni, y_neg = xs
            if mode == "invert":
                rep = L.inv_rep(x, y_neg, task.sigmas[ni], task.rhos[ni])
            else:
                rep = L.umap_rep(x, y_neg, a, b)
            return acc + rep, None

        rep_sum, _ = jax.lax.scan(
            fold_neg,
            jnp.zeros((n_local, k), dtype=jnp.float32),
            (neg_idx, y_negs),
        )
        per_slot = keep * (attr + rep_sum / num_rep)
    else:
        per_slot = keep * attr

    row_vals = jax.lax.all_gather(
        per_slot.sum(axis=1), DATA_AXIS, tiled=True
    )
    row_cnt = jax.lax.all_gather(keep.sum(axis=1), DATA_AXIS, tiled=True)
    win_mean = _window_means_from_rows(
        row_vals, row_cnt, batch_size, static.num_windows
    )
    return jnp.mean(win_mean) / p_size


def _make_local_loss_fn(
    statics: typing.Sequence[TaskStatic],
    *,
    mode: str,
    num_rep: int,
    alpha: float,
    batch_size: int,
    p_size: int,
    n_neg_infonce: int = 8,
    infonce_temperature: float = 0.5,
):
    """Per-device loss whose psum equals models/layout.py:make_loss_fn's
    global loss, with the module-docstring collective structure.
    ``y_attrs[i]`` non-None routes modality i through the ring engine
    (sharded ref + pre-gathered attraction rows)."""
    num_modes = len(statics)

    def loss_fn(params, tasks, y_attrs, ab, key):
        a, b = ab
        keys = jax.random.split(key, num_modes + 1)
        total = jnp.float32(0.0)
        if mode == "fit":
            fulls = [
                jax.lax.all_gather(p, DATA_AXIS, tiled=True)
                for p in params
            ]
            for i in range(num_modes):
                total = total + _fit_modality_loss_local(
                    params[i], fulls[i], tasks[i], statics[i], keys[i],
                    a=a, b=b, num_rep=num_rep, batch_size=batch_size,
                )
            if num_modes > 1 and alpha != 0.0:
                # Same keys/values as the GSPMD path, computed on the
                # gathered tables identically per device; the 1/P makes
                # the psum restore loss AND gradient exactly once
                # (every device contributes ct/P to the tables'
                # reduce-scattered cotangent).
                pair_key = keys[-1]
                for i in range(num_modes):
                    for j in range(i + 1, num_modes):
                        pair_key, k_ij, k_ji = jax.random.split(
                            pair_key, 3
                        )
                        l_ij = L.infonce(
                            k_ij, fulls[i], fulls[j],
                            n_neg=n_neg_infonce,
                            temperature=infonce_temperature,
                        )
                        l_ji = L.infonce(
                            k_ji, fulls[j], fulls[i],
                            n_neg=n_neg_infonce,
                            temperature=infonce_temperature,
                        )
                        total = total + alpha * (l_ij + l_ji) / p_size
        else:
            for i in range(num_modes):
                if y_attrs is not None and y_attrs[i] is not None:
                    total = total + _query_modality_loss_ring(
                        params[i], y_attrs[i], tasks[i], statics[i],
                        keys[i], mode=mode, a=a, b=b, num_rep=num_rep,
                        batch_size=batch_size, p_size=p_size,
                    )
                else:
                    total = total + _query_modality_loss_local(
                        params[i], tasks[i], statics[i], keys[i],
                        mode=mode, a=a, b=b, num_rep=num_rep,
                        batch_size=batch_size, p_size=p_size,
                    )
        return jax.lax.psum(total, DATA_AXIS)

    return loss_fn


def _row_spec(ndim: int) -> P:
    return P(DATA_AXIS, *([None] * (ndim - 1)))


def _task_specs(task: LayoutTask) -> LayoutTask:
    def rows(x):
        return _row_spec(x.ndim) if x is not None else None

    return LayoutTask(
        nbrs=rows(task.nbrs),
        weights=rows(task.weights),
        bwd_valid=rows(task.bwd_valid),
        ref=rows(task.ref),
        sigmas=rows(task.sigmas),
        rhos=rows(task.rhos),
    )


def sharded_compatible(params, tasks, statics, mesh) -> bool:
    """True when every row axis divides the mesh size -- the gate for
    routing train_layout through this engine (odd sizes fall back to
    the GSPMD path, which handles them via replication)."""
    p = int(mesh.devices.size)
    if p <= 1:
        return False
    for e, t, s in zip(params, tasks, statics):
        if e.shape[0] % p or t.nbrs.shape[0] % p:
            return False
        if e.shape[0] != t.nbrs.shape[0] or s.num_rows != t.nbrs.shape[0]:
            return False
        for leaf in (t.ref, t.sigmas, t.rhos):
            if leaf is not None and leaf.shape[0] % p:
                return False
    return True


@functools.lru_cache(maxsize=64)
def sharded_chunk_runner(
    statics: tuple,
    mode: str,
    num_rep: int,
    lr: float,
    alpha: float,
    batch_size: int,
    mesh,
    ref_gather: str = "full",
):
    """(optimizer, run_chunk) with models/layout.py:_chunk_runner's
    interface, executing the chunk as ONE jitted shard_map program
    (scan over epochs inside; Adam on local shards). ``ref_gather``:
    "full" gathers the frozen reference tables once per chunk (fast,
    O(N*D) per device); "ring" keeps them row-sharded and fetches rows
    by ppermute ring (O(N/P) per device -- the beyond-HBM query path,
    see module docstring)."""
    if ref_gather not in ("full", "ring"):
        raise ValueError(f"ref_gather must be full|ring, got {ref_gather!r}")
    p_size = int(mesh.devices.size)
    loss_fn = _make_local_loss_fn(
        statics, mode=mode, num_rep=num_rep, alpha=alpha,
        batch_size=batch_size, p_size=p_size,
    )
    optimizer = optax.adam(lr)

    def chunk_body(params, opt_state, tasks, ab, chunk_keys):
        y_attrs = None
        if mode != "fit":
            def gather(x):
                return (
                    jax.lax.all_gather(x, DATA_AXIS, tiled=True)
                    if x is not None else None
                )

            if ref_gather == "ring":
                # Keep the wide (N, D_feat) table sharded; bandwidths
                # are (N,) -- a full gather is bookkeeping-sized.
                tasks = tuple(
                    t._replace(
                        sigmas=gather(t.sigmas),
                        rhos=gather(t.rhos),
                    )
                    for t in tasks
                )
                # Attraction rows are scan-invariant: ONE ring per chunk.
                y_attrs = tuple(
                    jax.lax.stop_gradient(
                        _ring_rows(t.ref, t.nbrs, p_size))
                    for t in tasks
                )
            else:
                tasks = tuple(
                    t._replace(
                        ref=gather(t.ref),
                        sigmas=gather(t.sigmas),
                        rhos=gather(t.rhos),
                    )
                    for t in tasks
                )

        def epoch_step(carry, ekey):
            params, opt_state = carry
            loss, grads = jax.value_and_grad(loss_fn)(
                params, tasks, y_attrs, ab, ekey
            )
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), hist = jax.lax.scan(
            epoch_step, (params, opt_state), chunk_keys
        )
        return params, opt_state, hist

    state = {}

    def run_chunk(params, opt_state, tasks, ab, chunk_keys,
                  lower_only: bool = False):
        p_specs = tuple(_row_spec(p.ndim) for p in params)
        t_specs = tuple(_task_specs(t) for t in tasks)
        if "jitted" not in state:
            o_specs = jax.tree.map(
                lambda x: P() if x.ndim == 0 else _row_spec(x.ndim),
                opt_state,
            )
            mapped = jax.shard_map(
                chunk_body,
                mesh=mesh,
                in_specs=(p_specs, o_specs, t_specs, P(), P()),
                out_specs=(p_specs, o_specs, P()),
                check_vma=False,
            )
            state["jitted"] = jax.jit(mapped, donate_argnums=(0, 1))
            state["o_specs"] = o_specs

        def place(x, spec):
            return jax.device_put(x, NamedSharding(mesh, spec))

        params = tuple(
            place(p, s) for p, s in zip(params, p_specs)
        )
        opt_state = jax.tree.map(place, opt_state, state["o_specs"])
        tasks = tuple(
            jax.tree.map(place, t, s) for t, s in zip(tasks, t_specs)
        )
        if lower_only:
            # Compiled-HLO text for collective accounting
            # (tools/inspect_epoch_collectives.py, tests).
            return state["jitted"].lower(
                params, opt_state, tasks, ab, chunk_keys
            ).compile().as_text()
        return state["jitted"](params, opt_state, tasks, ab, chunk_keys)

    return optimizer, run_chunk
