"""Device-mesh parallelism utilities."""
from pointcloud_segmentation_attention_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_jit,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from pointcloud_segmentation_attention_tpu.parallel.dist import initialize_distributed

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "data_parallel_jit",
    "initialize_distributed",
]
