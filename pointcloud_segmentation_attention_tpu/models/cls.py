"""Classification models (ModelNet40).

- ``ClsSSG`` — single-scale grouping, ref
  ``pointnet2_tensorflow/models/pointnet2_cls_ssg.py:20-54``.
- ``ClsMSG`` — multi-scale grouping, ref
  ``pointnet2_tensorflow/models/pointnet2_cls_msg.py:17-49``.

Both accept optional per-point features (normals) as l0_points; the reference
MSG trainer feeds xyz+normals from ``modelnet_dataset.py``.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from pointcloud_segmentation_attention_tpu.nn import (
    Dropout,
    PointConv,
    SetAbstraction,
    SetAbstractionMSG,
)


class _ClsHead(nn.Module):
    """FC 512 -> dropout -> FC 256 -> dropout -> FC num_classes
    (ref pointnet2_cls_ssg.py:37-44 / cls_msg.py:33-39)."""

    num_classes: int
    dropout_rate: float
    compute_dtype: jnp.dtype

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum):
        dd = self.compute_dtype
        x = PointConv(512, bn=True, compute_dtype=dd, name="fc1")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = Dropout(self.dropout_rate, name="dp1")(x, deterministic=not train)
        x = PointConv(256, bn=True, compute_dtype=dd, name="fc2")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = Dropout(self.dropout_rate, name="dp2")(x, deterministic=not train)
        return PointConv(
            self.num_classes, bn=False, activation=None, compute_dtype=dd, name="fc3"
        )(x, train=train)


class ClsSSG(nn.Module):
    num_classes: int = 40
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        bn_momentum=0.9,
    ) -> jnp.ndarray:
        dd = self.compute_dtype
        l1_xyz, l1_points, _ = SetAbstraction(
            npoint=512, radius=0.2, nsample=32, mlp=(64, 64, 128),
            compute_dtype=dd, name="sa1",
        )(xyz, features, train=train, bn_momentum=bn_momentum)
        l2_xyz, l2_points, _ = SetAbstraction(
            npoint=128, radius=0.4, nsample=64, mlp=(128, 128, 256),
            compute_dtype=dd, name="sa2",
        )(l1_xyz, l1_points, train=train, bn_momentum=bn_momentum)
        _, l3_points, _ = SetAbstraction(
            npoint=None, radius=None, nsample=None, mlp=(256, 512, 1024),
            group_all=True, compute_dtype=dd, name="sa3",
        )(l2_xyz, l2_points, train=train, bn_momentum=bn_momentum)
        net = l3_points.reshape(l3_points.shape[0], -1)
        return _ClsHead(self.num_classes, 0.5, dd, name="head")(
            net, train=train, bn_momentum=bn_momentum
        )


class ClsMSG(nn.Module):
    num_classes: int = 40
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        features: Optional[jnp.ndarray] = None,
        *,
        train: bool = True,
        bn_momentum=0.9,
    ) -> jnp.ndarray:
        dd = self.compute_dtype
        l1_xyz, l1_points = SetAbstractionMSG(
            npoint=512, radius_list=(0.1, 0.2, 0.4), nsample_list=(16, 32, 128),
            mlp_list=((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            compute_dtype=dd, name="sa1",
        )(xyz, features, train=train, bn_momentum=bn_momentum)
        l2_xyz, l2_points = SetAbstractionMSG(
            npoint=128, radius_list=(0.2, 0.4, 0.8), nsample_list=(32, 64, 128),
            mlp_list=((64, 64, 128), (128, 128, 256), (128, 128, 256)),
            compute_dtype=dd, name="sa2",
        )(l1_xyz, l1_points, train=train, bn_momentum=bn_momentum)
        _, l3_points, _ = SetAbstraction(
            npoint=None, radius=None, nsample=None, mlp=(256, 512, 1024),
            group_all=True, compute_dtype=dd, name="sa3",
        )(l2_xyz, l2_points, train=train, bn_momentum=bn_momentum)
        net = l3_points.reshape(l3_points.shape[0], -1)
        return _ClsHead(self.num_classes, 0.4, dd, name="head")(
            net, train=train, bn_momentum=bn_momentum
        )
