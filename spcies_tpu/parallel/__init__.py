from spcies_tpu.parallel.mesh import (
    batch_mesh,
    shard_batch,
    sharded_solver,
    fleet_metrics,
)

__all__ = ["batch_mesh", "shard_batch", "sharded_solver", "fleet_metrics"]
