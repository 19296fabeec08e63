"""Multi-chip scaling: shard the lane axis over a device mesh."""

from .sharding import (lane_mesh, lane_sharding, shard_state, sharded_run,
                       sharded_run_sweep)

__all__ = ["lane_mesh", "shard_state", "lane_sharding", "sharded_run",
           "sharded_run_sweep"]
