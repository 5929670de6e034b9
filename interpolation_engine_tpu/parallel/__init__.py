"""Multi-chip scaling: data-parallel instance sharding over a device mesh."""

from .mesh import make_mesh, shard_batch, batched_run_sharded

__all__ = ["make_mesh", "shard_batch", "batched_run_sharded"]
