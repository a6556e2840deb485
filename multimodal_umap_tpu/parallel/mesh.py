"""Device mesh + sharding plan: data parallelism over the point axis.

The reference is single-process, single-device (reference
impl/model.py:10 is its entire device policy; SURVEY.md §2.9). The
honest TPU mapping is data parallelism over N: features, kNN results,
edge lists, and embedding tables shard on their row/edge axis across a
1-D ``Mesh(("data",))``; XLA GSPMD inserts the collectives (all-gather
of the small embedding tables for cross-shard gathers, scatter-add
reductions for segment sums, psum for the loss/grad reduction). No
bespoke communication code -- shardings are declared, not programmed.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def create_mesh(n_devices: int | None = None) -> Mesh:
    """A 1-D data-parallel mesh over the first ``n_devices`` devices."""
    devices = jax.devices()
    if n_devices is not None:
        if n_devices > len(devices):
            raise ValueError(
                f"requested {n_devices} devices, have {len(devices)}"
            )
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


@dataclasses.dataclass(frozen=True)
class ShardingPlan:
    """Placement helpers for the data-parallel axis."""

    mesh: Mesh

    def rows(self, x: jax.Array) -> jax.Array:
        """Shards the leading axis across the mesh.

        ``device_put`` requires the sharded axis to be divisible by the
        mesh size; non-divisible tables fall back to replication (the
        query paths pad to a multiple before sharding -- see
        MultimodalUMAP.transform -- so this fallback only triggers for
        odd-sized FIT tables, where padding would corrupt the
        self-graph)."""
        if x.shape[0] % self.mesh.devices.size:
            return self.replicated(x)
        spec = P(DATA_AXIS, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(self.mesh, spec))

    def replicated(self, x: jax.Array) -> jax.Array:
        return jax.device_put(x, NamedSharding(self.mesh, P()))

    def row_spec(self, ndim: int) -> NamedSharding:
        return NamedSharding(self.mesh, P(DATA_AXIS, *([None] * (ndim - 1))))

    def replicated_spec(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())


def shard_task(plan: ShardingPlan, task, init_embed: jax.Array):
    """Places a LayoutTask + its initial embeddings on the mesh.

    (N, k)/(Q, k) slot arrays and the padded column map shard on rows;
    the embedding parameters shard on rows. Frozen reference tables
    shard on rows too (``plan.rows`` falls back to replication when
    indivisible): the shard_map engine gathers or rings them explicitly
    per chunk (models/layout_sharded.py), and replicating here would
    materialize the full (N, D_feat) table per device -- the exact
    memory term the ring engine exists to avoid. Fit-time bandwidths
    ((N,) arrays) replicate so per-slot reads stay local.
    """

    def maybe_rows(x):
        return plan.rows(x) if x is not None else None

    def maybe_repl(x):
        return plan.replicated(x) if x is not None else None

    replaced = task._replace(
        nbrs=plan.rows(task.nbrs),
        weights=plan.rows(task.weights),
        bwd_valid=maybe_rows(task.bwd_valid),
        ref=maybe_rows(task.ref),
        sigmas=maybe_repl(task.sigmas),
        rhos=maybe_repl(task.rhos),
    )
    return replaced, plan.rows(init_embed)
