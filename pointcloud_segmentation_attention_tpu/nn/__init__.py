"""NN building blocks: layers, SA/FP modules, attention pooling."""
from pointcloud_segmentation_attention_tpu.nn.layers import (
    Dense,
    Dropout,
    PointConv,
    ScheduledBatchNorm,
    SharedMLP,
    dropout,
)
from pointcloud_segmentation_attention_tpu.nn.attention import (
    AttentionPool,
    FeedForward,
    InnerAttention,
    InnerAttentionBlock,
)
from pointcloud_segmentation_attention_tpu.nn.modules import (
    FeaturePropagation,
    SetAbstraction,
    SetAbstractionMSG,
    sample_and_group,
    sample_and_group_all,
)

__all__ = [
    "Dense", "Dropout", "PointConv", "ScheduledBatchNorm", "SharedMLP", "dropout",
    "AttentionPool", "FeedForward", "InnerAttention", "InnerAttentionBlock",
    "FeaturePropagation", "SetAbstraction", "SetAbstractionMSG",
    "sample_and_group", "sample_and_group_all",
]
