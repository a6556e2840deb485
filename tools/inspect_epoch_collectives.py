"""Lower the sharded fit-layout epoch and account for its collectives.

VERDICT r2 next-step 3: multi-chip *performance* cannot be measured in
this single-chip environment, but communication volume can -- lower the
jitted epoch over an 8-device virtual CPU mesh and parse the compiled
HLO for collective ops (all-gather / all-reduce / reduce-scatter /
all-to-all / collective-permute), with operand shapes -> bytes.

Context for reading the numbers (documented in BASELINE.md): with k=15
neighbors per row over P=8 devices, ONE all-gather of the (N, D)
embedding table moves ~(P-1)/P * N*D*4 bytes onto each device and makes
every neighbor gather local. Fetching each neighbor row individually
would move (N/P)*k*D*4 bytes per device -- k/P ~ 1.9x MORE -- so a
per-epoch table all-gather is the communication-OPTIMAL plan whenever
k > P, not a scaling bug. What this tool guards is the multiplicity:
the epoch must not all-gather the table once per loss term (the
gradient path can silently double everything), and the gradient
reduction must be a reduce-scatter/all-reduce of O(N*D), not O(N*k*D).

Usage:
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu \
      XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python tools/inspect_epoch_collectives.py [n] [k] [out_dim]
"""

from __future__ import annotations

import sys

from multimodal_umap_tpu.parallel.collectives import collective_summary


def lower_sharded_fit_chunk(n: int, k: int, out_dim: int, mesh=None):
    """Compiles ONE chunk (1 epoch) of the production shard_map engine
    (models/layout_sharded.py -- what train_layout actually runs under
    a mesh) and returns its HLO text."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_umap_tpu.models.layout import fit_task
    from multimodal_umap_tpu.models.layout_sharded import (
        sharded_chunk_runner,
    )
    from multimodal_umap_tpu.ops.graph import symmetrize_dense
    from multimodal_umap_tpu.parallel.mesh import DATA_AXIS, create_mesh

    mesh = mesh or create_mesh()
    rng = np.random.default_rng(0)
    shard = NamedSharding(mesh, P(DATA_AXIS, None))

    tasks, statics, params = [], [], []
    for _ in range(2):
        nbrs = rng.integers(0, n, size=(n, k)).astype(np.int32)
        w = rng.uniform(0.1, 1.0, size=(n, k)).astype(np.float32)
        dense = symmetrize_dense(
            jax.device_put(jnp.asarray(nbrs), shard),
            jax.device_put(jnp.asarray(w), shard),
        )
        task, static = fit_task(dense, batch_size=256)
        tasks.append(task)
        statics.append(static)
        params.append(
            jax.device_put(
                jnp.asarray(
                    rng.normal(size=(n, out_dim)).astype(np.float32)
                ),
                shard,
            )
        )

    import optax

    optimizer, run_chunk = sharded_chunk_runner(
        tuple(statics), "fit", 4, 0.01, 1.0, 256, mesh
    )
    params = tuple(params)
    opt_state = optax.adam(0.01).init(params)
    ab = (jnp.float32(1.577), jnp.float32(0.8951))
    keys = jax.random.split(jax.random.PRNGKey(0), 1)
    hlo = run_chunk(params, opt_state, tuple(tasks), ab, keys,
                    lower_only=True)
    return hlo, mesh


def lower_fit_epoch(n: int, k: int, out_dim: int, mesh=None):
    """Compiles ONE sharded fit epoch (loss+grad+adam, num_rep=4,
    2 modalities, InfoNCE on) and returns its HLO text."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_umap_tpu.models.layout import (
        fit_task,
        make_loss_fn,
    )
    from multimodal_umap_tpu.ops.graph import symmetrize_dense
    from multimodal_umap_tpu.parallel.mesh import DATA_AXIS, create_mesh

    mesh = mesh or create_mesh()
    rng = np.random.default_rng(0)
    shard = NamedSharding(mesh, P(DATA_AXIS, None))

    tasks, statics, params = [], [], []
    for _ in range(2):
        nbrs = rng.integers(0, n, size=(n, k)).astype(np.int32)
        w = rng.uniform(0.1, 1.0, size=(n, k)).astype(np.float32)
        dense = symmetrize_dense(
            jax.device_put(jnp.asarray(nbrs), shard),
            jax.device_put(jnp.asarray(w), shard),
        )
        task, static = fit_task(dense, batch_size=256)
        tasks.append(task)
        statics.append(static)
        params.append(
            jax.device_put(
                jnp.asarray(
                    rng.normal(size=(n, out_dim)).astype(np.float32)
                ),
                shard,
            )
        )

    loss_fn = make_loss_fn(
        tuple(statics), mode="fit", num_rep=4, alpha=1.0, batch_size=256
    )
    optimizer = optax.adam(0.01)
    params = tuple(params)
    opt_state = optimizer.init(params)
    ab = (jnp.float32(1.577), jnp.float32(0.8951))
    key = jax.random.PRNGKey(0)

    def epoch(params, opt_state, tasks, ab, key):
        loss, grads = jax.value_and_grad(loss_fn)(params, tasks, ab, key)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    lowered = jax.jit(epoch).lower(
        params, opt_state, tuple(tasks), ab, key
    )
    return lowered.compile().as_text(), mesh


def _report(title: str, hlo: str, table: int) -> None:
    s = collective_summary(hlo)
    print(title)
    for kind, shapes, b in s["ops"]:
        print(f"  {kind:20s} {b / 1e6:9.3f} MB   {shapes[:90]}")
    print("-" * 72)
    for kind, b in sorted(s["by_kind"].items()):
        print(f"  {kind:20s} {b / 1e6:9.3f} MB total")
    print(f"  TOTAL collective result bytes: {s['total_bytes'] / 1e6:.2f} MB"
          f"  = {s['total_bytes'] / table:.2f}x the (N,D) table")


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 15
    out_dim = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    table = n * out_dim * 4
    hlo, mesh = lower_fit_epoch(n, k, out_dim)
    p = mesh.devices.size
    print(f"n={n} k={k} D={out_dim} P={p} (table = {table / 1e6:.2f} MB)\n")
    _report("[GSPMD epoch -- declarative shardings, for comparison]",
            hlo, table)
    print()
    hlo_s, _ = lower_sharded_fit_chunk(n, k, out_dim, mesh=mesh)
    _report("[shard_map chunk (1 epoch) -- the production mesh engine]",
            hlo_s, table)


if __name__ == "__main__":
    main()
