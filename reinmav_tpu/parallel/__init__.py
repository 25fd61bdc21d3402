from . import distributed
from .mesh import BATCH_AXIS, batch_sharding, make_mesh, replicated, shard_batch, sharded_control_rollout

__all__ = [
    "BATCH_AXIS", "batch_sharding", "distributed", "make_mesh", "replicated",
    "shard_batch", "sharded_control_rollout",
]
