from vit2spn_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from vit2spn_tpu.parallel.shard_map_dp import shard_map_dp_step

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_map_dp_step",
]
