"""Utilities: config, logging, profiling."""
from pointcloud_segmentation_attention_tpu.utils.config import TrainConfig
from pointcloud_segmentation_attention_tpu.utils.logging import MetricLogger, read_metrics
from pointcloud_segmentation_attention_tpu.utils.profiler import StepTimer, trace

__all__ = ["TrainConfig", "MetricLogger", "read_metrics", "StepTimer", "trace"]
