"""Geometry ops: pure-XLA reference implementations + Pallas TPU kernels.

The index-producing hot ops (farthest_point_sample, ball_query, three_nn)
dispatch to Pallas kernels on TPU backends and to the pure-XLA
implementations elsewhere; semantics are identical (see tests/test_ops_*.py
and tests/test_pallas_kernels.py parity suites).  Gather-style ops are plain
XLA everywhere — their autodiff transpose is already an efficient
deterministic scatter-add.
"""
from pointcloud_segmentation_attention_tpu.ops.geometry import (
    gather_point,
    group_point,
    interpolation_weights,
    knn_point,
    prob_sample,
)
from pointcloud_segmentation_attention_tpu.ops.dispatch import (
    ball_query,
    farthest_point_sample,
    get_backend,
    group_point_with_counts,
    set_backend,
    three_interpolate,
    three_nn,
)

__all__ = [
    "ball_query",
    "farthest_point_sample",
    "gather_point",
    "get_backend",
    "group_point",
    "group_point_with_counts",
    "interpolation_weights",
    "knn_point",
    "prob_sample",
    "set_backend",
    "three_interpolate",
    "three_nn",
]
