"""Device-mesh parallelism utilities."""
from pointcloud_segmentation_attention_tpu.parallel.mesh import (
    batch_sharding,
    data_parallel_jit,
    make_mesh,
    replicated_sharding,
    shard_batch,
)
from pointcloud_segmentation_attention_tpu.parallel.tp import (
    make_mesh_2d,
    model_parallel_jit,
    shard_state,
    state_sharding,
)
from pointcloud_segmentation_attention_tpu.parallel.dist import (
    host_shard,
    initialize_distributed,
)
from pointcloud_segmentation_attention_tpu.parallel.act_sharding import (
    activation_sharding,
    constrain_channels,
)
from pointcloud_segmentation_attention_tpu.parallel.hlo_analysis import (
    collective_stats,
    full_kernel_allgathers,
)

__all__ = [
    "make_mesh",
    "make_mesh_2d",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "shard_state",
    "state_sharding",
    "data_parallel_jit",
    "model_parallel_jit",
    "initialize_distributed",
    "host_shard",
    "activation_sharding",
    "constrain_channels",
    "collective_stats",
    "full_kernel_allgathers",
]
