"""Backend dispatch: Pallas TPU kernels on TPU, pure-XLA elsewhere.

The public ``ops`` API routes the hot index-producing ops to their Pallas
implementations when the default backend is a TPU (and shapes qualify); the
pure-XLA versions remain the semantic reference and the fallback.  Dispatch
can be pinned for testing with ``set_backend('xla' | 'pallas' | 'auto')``.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pointcloud_segmentation_attention_tpu.ops import geometry

_MODE = "auto"  # 'auto' | 'xla' | 'pallas'


def set_backend(mode: str) -> None:
    global _MODE
    if mode not in ("auto", "xla", "pallas"):
        raise ValueError(mode)
    _MODE = mode


def get_backend() -> str:
    return _MODE


def _use_pallas() -> bool:
    if _MODE == "pallas":
        return True
    if _MODE == "xla":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    if _use_pallas():
        from pointcloud_segmentation_attention_tpu.ops.pallas import (
            farthest_point_sample_pallas,
        )

        return farthest_point_sample_pallas(xyz, npoint)
    return geometry.farthest_point_sample(xyz, npoint)


def ball_query(
    xyz: jnp.ndarray, new_xyz: jnp.ndarray, radius: float, nsample: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    if _use_pallas():
        from pointcloud_segmentation_attention_tpu.ops.pallas import (
            ball_query_pallas,
        )

        return ball_query_pallas(xyz, new_xyz, radius, nsample)
    return geometry.ball_query(xyz, new_xyz, radius, nsample)


def three_interpolate(
    points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    if _use_pallas():
        from pointcloud_segmentation_attention_tpu.ops.pallas.interpolate_kernel import (
            pallas_interpolate_supported,
            three_interpolate_pallas,
        )

        if pallas_interpolate_supported(points, idx):
            return three_interpolate_pallas(points, idx, weight)
    return geometry.three_interpolate(points, idx, weight)


def group_point_with_counts(
    points: jnp.ndarray, idx: jnp.ndarray, cnt=None
) -> jnp.ndarray:
    """``group_point`` that can exploit ball-query hit counts.

    With ``cnt`` (from ``ball_query``) on TPU, the Pallas count-aware gather
    copies only the DISTINCT rows per group and broadcast-fills the repeated
    padding slots (measured 4.4 -> 2.2 ms at the L1 training shapes,
    docs/performance.md).  Without counts (kNN groups, non-TPU) it is the
    plain XLA gather.  Semantics are identical GIVEN ball-query output
    (slots >= cnt repeat slot 0).
    """
    if cnt is not None and _use_pallas():
        from pointcloud_segmentation_attention_tpu.ops.pallas.group_gather_kernel import (
            group_gather,
        )

        return group_gather(points, idx, cnt)
    return geometry.group_point(points, idx)


def three_nn(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    # Pallas path needs >= 3 known points (no padding branch in-kernel).
    if _use_pallas() and xyz2.shape[1] >= 3:
        from pointcloud_segmentation_attention_tpu.ops.pallas import (
            three_nn_pallas,
        )

        return three_nn_pallas(xyz1, xyz2)
    return geometry.three_nn(xyz1, xyz2)
