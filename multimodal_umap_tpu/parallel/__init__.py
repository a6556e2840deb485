"""Parallelism: device mesh and data-parallel sharding plan."""

from .collectives import collective_summary
from .mesh import DATA_AXIS, ShardingPlan, create_mesh, shard_task

__all__ = ["DATA_AXIS", "ShardingPlan", "collective_summary",
           "create_mesh", "shard_task"]
