"""Parallelism: device mesh and data-parallel sharding plan."""

from .mesh import DATA_AXIS, ShardingPlan, create_mesh, shard_task

__all__ = ["DATA_AXIS", "ShardingPlan", "create_mesh", "shard_task"]
