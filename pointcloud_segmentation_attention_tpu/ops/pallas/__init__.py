"""Pallas TPU kernels for the hot geometry ops.

Tested for exact parity against the pure-XLA implementations in
``ops.geometry`` (which are themselves golden-tested against numpy oracles of
the reference CUDA kernels).
"""
from pointcloud_segmentation_attention_tpu.ops.pallas.fps_kernel import (
    farthest_point_sample_pallas,
)
from pointcloud_segmentation_attention_tpu.ops.pallas.ball_query_kernel import (
    ball_query_pallas,
)
from pointcloud_segmentation_attention_tpu.ops.pallas.three_nn_kernel import (
    three_nn_pallas,
)

__all__ = ["farthest_point_sample_pallas", "ball_query_pallas", "three_nn_pallas"]
