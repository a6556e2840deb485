"""Communication-volume regression gate on the shard_map layout epoch.

VERDICT r2 next-step 3: multi-chip performance is unmeasurable on a
single-chip tunnel, but communication volume is not -- lower the
production mesh engine (models/layout_sharded.py) over the 8-device
virtual CPU mesh and account its compiled-HLO collectives. The GSPMD
formulation of the same semantics measured ~22x the (N, D) embedding
table per device per epoch; the shard_map engine must stay at the
textbook minimum: ONE table all-gather forward + ONE reduce-scatter
backward per modality, plus O(N) bookkeeping.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_umap_tpu.models.layout import fit_task, query_task
from multimodal_umap_tpu.models.layout_sharded import (
    sharded_chunk_runner,
)
from multimodal_umap_tpu.ops.graph import symmetrize_dense
from multimodal_umap_tpu.parallel import (
    DATA_AXIS,
    collective_summary,
    create_mesh,
)

N, K, D = 1024, 8, 16
TABLE_BYTES = N * D * 4


@pytest.fixture(scope="module")
def mesh():
    return create_mesh()


def _fit_setup(mesh, num_modes=2):
    rng = np.random.default_rng(0)
    shard = NamedSharding(mesh, P(DATA_AXIS, None))
    tasks, statics, params = [], [], []
    for _ in range(num_modes):
        nbrs = rng.integers(0, N, size=(N, K)).astype(np.int32)
        w = rng.uniform(0.1, 1.0, size=(N, K)).astype(np.float32)
        dense = symmetrize_dense(
            jax.device_put(jnp.asarray(nbrs), shard),
            jax.device_put(jnp.asarray(w), shard),
        )
        task, static = fit_task(dense, batch_size=128)
        tasks.append(task)
        statics.append(static)
        params.append(jax.device_put(
            jnp.asarray(rng.normal(size=(N, D)).astype(np.float32)), shard
        ))
    return tuple(tasks), tuple(statics), tuple(params)


def test_fit_epoch_collective_bytes_bounded(mesh):
    """Per epoch: exactly num_modes table all-gathers, num_modes
    reduce-scatters, and total collective bytes < 3x the tables (the
    GSPMD baseline was ~22x)."""
    tasks, statics, params = _fit_setup(mesh)
    _, run_chunk = sharded_chunk_runner(
        statics, "fit", 4, 0.01, 1.0, 128, mesh
    )
    opt_state = optax.adam(0.01).init(params)
    ab = (jnp.float32(1.577), jnp.float32(0.8951))
    keys = jax.random.split(jax.random.PRNGKey(0), 1)  # ONE epoch
    hlo = run_chunk(params, opt_state, tasks, ab, keys, lower_only=True)
    s = collective_summary(hlo)

    table_gathers = [
        b for kind, _, b in s["ops"]
        if kind == "all-gather" and b >= TABLE_BYTES
    ]
    assert len(table_gathers) == 2, s["ops"]
    assert all(b == TABLE_BYTES for b in table_gathers), s["ops"]
    # Gradient comes back as reduce-scatter (result = one shard), never
    # as a full-table all-reduce.
    rs = [b for kind, _, b in s["ops"] if kind == "reduce-scatter"]
    assert len(rs) == 2, s["ops"]
    big_ar = [
        (kind, b) for kind, _, b in s["ops"]
        if kind == "all-reduce" and b >= TABLE_BYTES
    ]
    assert not big_ar, s["ops"]
    assert s["total_bytes"] < 3 * 2 * TABLE_BYTES, s["by_kind"]


def test_transform_epochs_have_no_table_collectives(mesh):
    """The frozen reference table is gathered once per CHUNK; epochs
    then run with no table-sized collectives at all. Gate: a 4-epoch
    chunk carries exactly ONE ref-table all-gather (scan-invariant,
    hoisted), and total bytes stay ~independent of epoch count."""
    rng = np.random.default_rng(1)
    q = 256
    shard2 = NamedSharding(mesh, P(DATA_AXIS, None))
    nbrs = rng.integers(0, N, size=(q, K)).astype(np.int32)
    w = rng.uniform(0.1, 1.0, size=(q, K)).astype(np.float32)
    ref = rng.normal(size=(N, D)).astype(np.float32)
    task, static = query_task(
        jax.device_put(jnp.asarray(nbrs), shard2),
        jax.device_put(jnp.asarray(w), shard2),
        batch_size=128,
        ref=jax.device_put(jnp.asarray(ref), shard2),
    )
    params = (jax.device_put(
        jnp.asarray(rng.normal(size=(q, D)).astype(np.float32)), shard2
    ),)
    _, run_chunk = sharded_chunk_runner(
        (static,), "transform", 4, 0.01, 0.0, 128, mesh
    )
    opt_state = optax.adam(0.01).init(params)
    ab = (jnp.float32(1.577), jnp.float32(0.8951))

    def bytes_for(epochs):
        keys = jax.random.split(jax.random.PRNGKey(0), epochs)
        hlo = run_chunk(params, opt_state, (task,), ab, keys,
                        lower_only=True)
        return collective_summary(hlo)

    s4 = bytes_for(4)
    ref_bytes = N * D * 4
    table_gathers = [
        b for kind, _, b in s4["ops"]
        if kind == "all-gather" and b >= ref_bytes
    ]
    assert len(table_gathers) == 1, s4["ops"]
    # No per-epoch gradient reduction exists in query mode (anchor-side
    # gradients are local): nothing table-sized beyond the one gather.
    assert s4["total_bytes"] < 2 * ref_bytes, s4["by_kind"]


def test_ring_knn_collective_bytes_are_p_minus_1_shards(mesh):
    """The ring kNN's ONLY communication must be the ring itself:
    P-1 collective-permutes of one (N/P, D) reference shard -- never an
    all-gather/all-reduce of the table (SURVEY.md §2.9 "all-gather
    (ICI) ring over column blocks"; the whole point of the mesh path is
    that no device ever holds the full reference table)."""
    from multimodal_umap_tpu.ops.knn_stream import knn_ring

    p = int(mesh.devices.size)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    hlo = knn_ring(x, x, K, mesh, exclude_self=True, lower_only=True)
    summary = collective_summary(hlo)
    by_kind = summary["by_kind"]
    permute_ops = [op for op in summary["ops"]
                   if op[0] == "collective-permute"]
    shard_bytes = (N // p) * D * 4
    assert len(permute_ops) == p - 1, summary["ops"]
    assert by_kind.get("collective-permute", 0) == (p - 1) * shard_bytes
    assert by_kind.get("all-gather", 0) == 0, summary["ops"]
    assert by_kind.get("all-reduce", 0) == 0, summary["ops"]
    assert by_kind.get("all-to-all", 0) == 0, summary["ops"]


def test_ring_knn_collective_bytes_bf16_halved(mesh):
    """bf16-stored tables must ride the ring at 2 bytes/element -- the
    dtype-preservation guarantee (review finding: an f32 upcast before
    sharding doubled the ICI bytes feature_dtype halves)."""
    from multimodal_umap_tpu.ops.knn_stream import knn_ring

    p = int(mesh.devices.size)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32),
                    dtype=jnp.bfloat16)
    # bf16=True is the TPU production configuration (bf16 rank + exact
    # re-score). With bf16=False XLA legitimately permutes the f32
    # upcast it needs for the panel anyway, so only the bf16-rank mode
    # carries the storage dtype around the ring.
    hlo = knn_ring(x, x, K, mesh, exclude_self=True, bf16=True,
                   lower_only=True)
    by_kind = collective_summary(hlo)["by_kind"]
    assert by_kind.get("collective-permute", 0) == (p - 1) * (N // p) * D * 2
    assert by_kind.get("all-gather", 0) == 0


def test_mesh_spectral_matvec_is_all_gather_only(mesh):
    """The destination-bucketed spectral filter must not all-reduce the
    (N, m) block: bucketing makes every destination segment_sum local,
    so each matvec's only collective is ONE all-gather of the block
    (half the wire bytes of the GSPMD all-reduce it replaces -- which
    measured ~26 full-table all-reduces per filter program)."""
    import functools

    from multimodal_umap_tpu.ops import spectral as S

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(N, D)).astype(np.float32))
    from multimodal_umap_tpu.ops.graph import fuzzy_weights, symmetrize
    from multimodal_umap_tpu.ops.knn import knn

    dists, nbrs = knn(x, x, K, exclude_self=True)
    w, _, _ = fuzzy_weights(dists)
    graph = symmetrize(nbrs, w)
    dest = S.dest_shard_graph(graph, mesh, DATA_AXIS)
    out_dim = 8
    m = out_dim + 1 + 8  # block width incl. trivial + guard columns
    fn = jax.jit(functools.partial(S._spectral_chebyshev, out_dim=out_dim))
    hlo = fn.lower(dest).compile().as_text()
    by_kind = collective_summary(hlo)["by_kind"]
    # all-reduces must be (m, m)-bookkeeping only, never the (N, m)
    # block; generous bound: a handful of m x m reductions.
    assert by_kind.get("all-reduce", 0) < 8 * m * m * 4, by_kind
    assert by_kind.get("all-gather", 0) > 0
    assert by_kind.get("all-to-all", 0) == 0


def _query_setup(mesh, mode, q=256, seed=7):
    rng = np.random.default_rng(seed)
    shard = NamedSharding(mesh, P(DATA_AXIS, None))
    nbrs = rng.integers(0, N, size=(q, K)).astype(np.int32)
    w = rng.uniform(0.1, 1.0, size=(q, K)).astype(np.float32)
    ref = rng.normal(size=(N, D)).astype(np.float32)
    kwargs = {}
    if mode == "invert":
        shard1 = NamedSharding(mesh, P(DATA_AXIS))
        kwargs = dict(
            sigmas=jax.device_put(jnp.asarray(
                rng.uniform(0.5, 1.5, size=(N,)).astype(np.float32)),
                shard1),
            rhos=jax.device_put(jnp.asarray(
                rng.uniform(0.0, 0.5, size=(N,)).astype(np.float32)),
                shard1),
        )
    task, static = query_task(
        jax.device_put(jnp.asarray(nbrs), shard),
        jax.device_put(jnp.asarray(w), shard),
        batch_size=128,
        ref=jax.device_put(jnp.asarray(ref), shard),
        **kwargs,
    )
    params = (jax.device_put(
        jnp.asarray(rng.normal(size=(q, D)).astype(np.float32)), shard
    ),)
    return task, static, params


@pytest.mark.parametrize("mode", ["transform", "invert"])
def test_ring_query_chunk_has_no_table_all_gather(mesh, mode):
    """VERDICT r3 item 6: with ref_gather="ring" the lowered query
    chunk must contain NO all-gather of the (N, D) frozen reference
    table -- rows move only as (N/P, D) collective-permutes. The (N,)
    bandwidth gathers and (Q,) bookkeeping stay."""
    task, static, params = _query_setup(mesh, mode)
    _, run_chunk = sharded_chunk_runner(
        (static,), mode, 4, 0.01, 0.0, 128, mesh, "ring"
    )
    opt_state = optax.adam(0.01).init(params)
    ab = (jnp.float32(1.577), jnp.float32(0.8951))
    keys = jax.random.split(jax.random.PRNGKey(0), 3)
    hlo = run_chunk(params, opt_state, (task,), ab, keys, lower_only=True)
    s = collective_summary(hlo)
    ref_bytes = N * D * 4
    table_gathers = [
        b for kind, _, b in s["ops"]
        if kind == "all-gather" and b >= ref_bytes
    ]
    assert not table_gathers, s["ops"]
    assert any(kind == "collective-permute" for kind, _, b in s["ops"]), \
        s["ops"]
    big_ar = [b for kind, _, b in s["ops"]
              if kind == "all-reduce" and b >= ref_bytes]
    assert not big_ar, s["ops"]


@pytest.mark.parametrize("mode", ["transform", "invert"])
def test_ring_query_engine_matches_full_gather(mesh, mode):
    """The ring engine must reproduce the gathered engine's trajectory
    (same full-shape draws, same keys) within reduction-order fp
    tolerance."""
    task, static, params = _query_setup(mesh, mode)
    ab = (jnp.float32(1.577), jnp.float32(0.8951))
    keys = jax.random.split(jax.random.PRNGKey(2), 4)

    results = {}
    for gather_mode in ("full", "ring"):
        _, run_chunk = sharded_chunk_runner(
            (static,), mode, 4, 0.01, 0.0, 128, mesh, gather_mode
        )
        # donate_argnums: hand each engine its own param/opt copies.
        p = tuple(jnp.array(x, copy=True) for x in params)
        opt_state = optax.adam(0.01).init(p)
        out, _, hist = run_chunk(p, opt_state, (task,), ab, keys)
        results[gather_mode] = (np.asarray(out[0]), np.asarray(hist))

    np.testing.assert_allclose(
        results["ring"][1], results["full"][1], rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(
        results["ring"][0], results["full"][0], rtol=2e-4, atol=2e-5)
