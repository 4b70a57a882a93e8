"""Geometry ops: pure-XLA reference implementations + Pallas TPU kernels.

The public API dispatches to Pallas kernels on TPU backends (when available)
and to the pure-XLA implementations elsewhere; both share identical semantics
(see tests/test_ops_*.py parity suites).
"""
from pointcloud_segmentation_attention_tpu.ops.geometry import (
    ball_query,
    farthest_point_sample,
    gather_point,
    group_point,
    interpolation_weights,
    knn_point,
    prob_sample,
    three_interpolate,
    three_nn,
)

__all__ = [
    "ball_query",
    "farthest_point_sample",
    "gather_point",
    "group_point",
    "interpolation_weights",
    "knn_point",
    "prob_sample",
    "three_interpolate",
    "three_nn",
]
