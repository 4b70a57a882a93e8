"""ShapeNet part-segmentation models (50 part classes).

- ``PartSegSSG`` — ref ``pointnet2_tensorflow/models/pointnet2_part_seg.py:17-51``
  (input BxNx6 = xyz + normal; l0_xyz re-concatenated into the last FP skip).
- ``PartSegMSGOneHot`` — ref
  ``pointnet2_tensorflow/models/pointnet2_part_seg_msg_one_hot.py:19-57``
  (object-class one-hot(16) tiled per point into the last FP skip).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloud_segmentation_attention_tpu.nn import (
    Dropout,
    FeaturePropagation,
    PointConv,
    SetAbstraction,
    SetAbstractionMSG,
)

NUM_PART_CLASSES = 50
NUM_CATEGORIES = 16


class _SegHead(nn.Module):
    compute_dtype: jnp.dtype
    num_classes: int = NUM_PART_CLASSES

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum):
        x = PointConv(128, bn=True, compute_dtype=self.compute_dtype, name="fc1")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = Dropout(0.5, name="dp1")(x, deterministic=not train)
        return PointConv(
            self.num_classes, bn=False, activation=None,
            compute_dtype=self.compute_dtype, name="fc2",
        )(x, train=train)


class PartSegSSG(nn.Module):
    num_classes: int = NUM_PART_CLASSES
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, point_cloud: jnp.ndarray, *, train: bool = True, bn_momentum=0.9
    ) -> jnp.ndarray:
        dd = self.compute_dtype
        l0_xyz = point_cloud[..., :3]
        l0_points = point_cloud[..., 3:6]
        l1_xyz, l1_points, _ = SetAbstraction(
            npoint=512, radius=0.2, nsample=64, mlp=(64, 64, 128),
            compute_dtype=dd, name="sa1",
        )(l0_xyz, l0_points, train=train, bn_momentum=bn_momentum)
        l2_xyz, l2_points, _ = SetAbstraction(
            npoint=128, radius=0.4, nsample=64, mlp=(128, 128, 256),
            compute_dtype=dd, name="sa2",
        )(l1_xyz, l1_points, train=train, bn_momentum=bn_momentum)
        l3_xyz, l3_points, _ = SetAbstraction(
            npoint=None, radius=None, nsample=None, mlp=(256, 512, 1024),
            group_all=True, compute_dtype=dd, name="sa3",
        )(l2_xyz, l2_points, train=train, bn_momentum=bn_momentum)

        l2_points = FeaturePropagation((256, 256), compute_dtype=dd, name="fp1")(
            l2_xyz, l3_xyz, l2_points, l3_points, train=train, bn_momentum=bn_momentum
        )
        l1_points = FeaturePropagation((256, 128), compute_dtype=dd, name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train=train, bn_momentum=bn_momentum
        )
        l0_skip = jnp.concatenate([l0_xyz, l0_points], axis=-1)
        l0_points = FeaturePropagation((128, 128, 128), compute_dtype=dd, name="fp3")(
            l0_xyz, l1_xyz, l0_skip, l1_points, train=train, bn_momentum=bn_momentum
        )
        return _SegHead(dd, self.num_classes, name="head")(
            l0_points, train=train, bn_momentum=bn_momentum
        )


class PartSegMSGOneHot(nn.Module):
    num_classes: int = NUM_PART_CLASSES
    num_categories: int = NUM_CATEGORIES
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        point_cloud: jnp.ndarray,
        cls_label: jnp.ndarray,  # (B,) int object category
        *,
        train: bool = True,
        bn_momentum=0.9,
    ) -> jnp.ndarray:
        dd = self.compute_dtype
        b, n, _ = point_cloud.shape
        l0_xyz = point_cloud[..., :3]
        l0_points = point_cloud[..., 3:6]
        l1_xyz, l1_points = SetAbstractionMSG(
            npoint=512, radius_list=(0.1, 0.2, 0.4), nsample_list=(32, 64, 128),
            mlp_list=((32, 32, 64), (64, 64, 128), (64, 96, 128)),
            compute_dtype=dd, name="sa1",
        )(l0_xyz, l0_points, train=train, bn_momentum=bn_momentum)
        l2_xyz, l2_points = SetAbstractionMSG(
            npoint=128, radius_list=(0.4, 0.8), nsample_list=(64, 128),
            mlp_list=((128, 128, 256), (128, 196, 256)),
            compute_dtype=dd, name="sa2",
        )(l1_xyz, l1_points, train=train, bn_momentum=bn_momentum)
        l3_xyz, l3_points, _ = SetAbstraction(
            npoint=None, radius=None, nsample=None, mlp=(256, 512, 1024),
            group_all=True, compute_dtype=dd, name="sa3",
        )(l2_xyz, l2_points, train=train, bn_momentum=bn_momentum)

        l2_points = FeaturePropagation((256, 256), compute_dtype=dd, name="fp1")(
            l2_xyz, l3_xyz, l2_points, l3_points, train=train, bn_momentum=bn_momentum
        )
        l1_points = FeaturePropagation((256, 128), compute_dtype=dd, name="fp2")(
            l1_xyz, l2_xyz, l1_points, l2_points, train=train, bn_momentum=bn_momentum
        )
        one_hot = jax.nn.one_hot(cls_label, self.num_categories, dtype=point_cloud.dtype)
        one_hot = jnp.broadcast_to(one_hot[:, None, :], (b, n, self.num_categories))
        l0_skip = jnp.concatenate([one_hot, l0_xyz, l0_points], axis=-1)
        l0_points = FeaturePropagation((128, 128), compute_dtype=dd, name="fp3")(
            l0_xyz, l1_xyz, l0_skip, l1_points, train=train, bn_momentum=bn_momentum
        )
        return _SegHead(dd, self.num_classes, name="head")(
            l0_points, train=train, bn_momentum=bn_momentum
        )
