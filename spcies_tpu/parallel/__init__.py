from spcies_tpu.parallel.mesh import (
    batch_mesh,
    shard_batch,
    sharded_solver,
    fleet_metrics,
)
from spcies_tpu.parallel.distributed import (
    initialize,
    is_distributed,
    host_chip_mesh,
    batch_spec,
    from_process_local,
    shard_map_solver,
    global_fleet_metrics,
)

__all__ = ["batch_mesh", "shard_batch", "sharded_solver", "fleet_metrics",
           "initialize", "is_distributed", "host_chip_mesh", "batch_spec",
           "from_process_local", "shard_map_solver",
           "global_fleet_metrics"]
