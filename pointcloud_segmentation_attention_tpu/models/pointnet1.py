"""PointNet v1 model family.

TPU-native equivalents of the reference's vendored PointNet v1 subtree
(``pointnet2_tensorflow/pointnet1/models/`` and
``pointnet2_tensorflow/models/pointnet_cls_basic.py``):

- ``PointNetClsBasic``  — per-point MLP (64,64,64,128,1024) + global max pool +
  FC 512/256/40 head (ref ``models/pointnet_cls_basic.py:21-67``).
- ``PointNetCls``       — adds the input (3x3) and feature (64x64) T-Nets
  (ref ``pointnet1/models/pointnet_cls.py:18-73`` +
  ``transform_nets.py:10-60``).  ``orthogonality_loss`` regularizes the
  feature transform.
- ``PointNetSeg``       — per-point + tiled-global concat seg head, 50 classes
  (ref ``pointnet1/models/pointnet_seg.py:20-91``).
- ``PointNetSemSeg``    — S3DIS semantic seg, 9-dim input, 13 classes
  (ref ``pointnet1/sem_seg/model.py:19-65``).

The reference's ``conv2d ... [1,3]`` over a BxNx3x1 "image" is just a dense
projection of the 3 input channels — here every per-point op is a channel
einsum (MXU-friendly), and the T-Net matmuls are batched on the MXU.
"""
from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from pointcloud_segmentation_attention_tpu.nn import Dropout, PointConv


class TransformNet(nn.Module):
    """T-Net: per-point MLP (64,128,1024) -> max pool -> FC (512,256) -> KxK
    matrix initialized to identity (zero weights + identity bias)."""

    k: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum):
        dd = self.compute_dtype
        b = x.shape[0]
        for i, f in enumerate((64, 128, 1024)):
            x = PointConv(f, bn=True, compute_dtype=dd, name=f"tconv{i + 1}")(
                x, train=train, bn_momentum=bn_momentum
            )
        x = jnp.max(x, axis=1)  # (B, 1024)
        x = PointConv(512, bn=True, compute_dtype=dd, name="tfc1")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = PointConv(256, bn=True, compute_dtype=dd, name="tfc2")(
            x, train=train, bn_momentum=bn_momentum
        )
        w = self.param("transform_w", nn.initializers.zeros, (256, self.k * self.k), jnp.float32)
        bias = self.param("transform_b", nn.initializers.zeros, (self.k * self.k,), jnp.float32)
        eye = jnp.eye(self.k, dtype=jnp.float32).reshape(-1)
        t = x.astype(jnp.float32) @ w + bias + eye
        return t.reshape(b, self.k, self.k)


def orthogonality_loss(transform: jnp.ndarray) -> jnp.ndarray:
    """0.5 * ||T T^t - I||_F^2 summed (tf.nn.l2_loss semantics), mean over batch
    is NOT taken — matches ``pointnet_cls.get_loss`` (ref :77-92)."""
    k = transform.shape[-1]
    tt = jnp.einsum("bij,bkj->bik", transform, transform)
    diff = tt - jnp.eye(k, dtype=transform.dtype)
    return 0.5 * jnp.sum(diff * diff)


class PointNetClsBasic(nn.Module):
    num_classes: int = 40
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, *, train: bool = True, bn_momentum=0.9):
        dd = self.compute_dtype
        x = xyz
        for i, f in enumerate((64, 64, 64, 128, 1024)):
            x = PointConv(f, bn=True, compute_dtype=dd, name=f"conv{i + 1}")(
                x, train=train, bn_momentum=bn_momentum
            )
        x = jnp.max(x, axis=1)
        x = PointConv(512, bn=True, compute_dtype=dd, name="fc1")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = PointConv(256, bn=True, compute_dtype=dd, name="fc2")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = Dropout(0.3, name="dp1")(x, deterministic=not train)
        return PointConv(self.num_classes, bn=False, activation=None,
                         compute_dtype=dd, name="fc3")(x, train=train)


class PointNetCls(nn.Module):
    """PointNet v1 with input + feature T-Nets.  Returns (logits, end_points)
    where end_points['transform'] feeds orthogonality_loss."""

    num_classes: int = 40
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, *, train: bool = True, bn_momentum=0.9):
        dd = self.compute_dtype
        t_in = TransformNet(3, compute_dtype=dd, name="transform_net1")(
            xyz, train=train, bn_momentum=bn_momentum
        )
        x = jnp.einsum("bni,bij->bnj", xyz, t_in)
        x = PointConv(64, bn=True, compute_dtype=dd, name="conv1")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = PointConv(64, bn=True, compute_dtype=dd, name="conv2")(
            x, train=train, bn_momentum=bn_momentum
        )
        t_feat = TransformNet(64, compute_dtype=dd, name="transform_net2")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = jnp.einsum("bni,bij->bnj", x, t_feat)
        for i, f in enumerate((64, 128, 1024)):
            x = PointConv(f, bn=True, compute_dtype=dd, name=f"conv{i + 3}")(
                x, train=train, bn_momentum=bn_momentum
            )
        x = jnp.max(x, axis=1)
        x = PointConv(512, bn=True, compute_dtype=dd, name="fc1")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = Dropout(0.3, name="dp1")(x, deterministic=not train)
        x = PointConv(256, bn=True, compute_dtype=dd, name="fc2")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = Dropout(0.3, name="dp2")(x, deterministic=not train)
        logits = PointConv(self.num_classes, bn=False, activation=None,
                           compute_dtype=dd, name="fc3")(x, train=train)
        return logits, {"transform": t_feat}


class PointNetSeg(nn.Module):
    """PointNet v1 part segmentation: T-Nets + per-point feat + tiled global
    feat concat + conv head (ref pointnet_seg.py:20-91)."""

    num_classes: int = 50
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, *, train: bool = True, bn_momentum=0.9):
        dd = self.compute_dtype
        n = xyz.shape[1]
        t_in = TransformNet(3, compute_dtype=dd, name="transform_net1")(
            xyz, train=train, bn_momentum=bn_momentum
        )
        x = jnp.einsum("bni,bij->bnj", xyz, t_in)
        x = PointConv(64, bn=True, compute_dtype=dd, name="conv1")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = PointConv(64, bn=True, compute_dtype=dd, name="conv2")(
            x, train=train, bn_momentum=bn_momentum
        )
        t_feat = TransformNet(64, compute_dtype=dd, name="transform_net2")(
            x, train=train, bn_momentum=bn_momentum
        )
        point_feat = jnp.einsum("bni,bij->bnj", x, t_feat)
        x = point_feat
        for i, f in enumerate((64, 128, 1024)):
            x = PointConv(f, bn=True, compute_dtype=dd, name=f"conv{i + 3}")(
                x, train=train, bn_momentum=bn_momentum
            )
        global_feat = jnp.max(x, axis=1, keepdims=True)  # (B, 1, 1024)
        concat = jnp.concatenate(
            [point_feat, jnp.broadcast_to(global_feat, (x.shape[0], n, 1024))], axis=-1
        )
        x = concat
        for i, f in enumerate((512, 256, 128, 128)):
            x = PointConv(f, bn=True, compute_dtype=dd, name=f"conv{i + 6}")(
                x, train=train, bn_momentum=bn_momentum
            )
        logits = PointConv(self.num_classes, bn=False, activation=None,
                           compute_dtype=dd, name="conv10")(x, train=train)
        return logits, {"transform": t_feat}


class PointNetSemSeg(nn.Module):
    """S3DIS semantic segmentation baseline: 9-dim input, 13 classes."""

    num_classes: int = 13
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, points, *, train: bool = True, bn_momentum=0.9):
        dd = self.compute_dtype
        b, n, _ = points.shape
        x = points
        for i, f in enumerate((64, 64, 64, 128, 1024)):
            x = PointConv(f, bn=True, compute_dtype=dd, name=f"conv{i + 1}")(
                x, train=train, bn_momentum=bn_momentum
            )
        points_feat = x  # (B, N, 1024)
        g = jnp.max(x, axis=1)
        g = PointConv(256, bn=True, compute_dtype=dd, name="fc1")(
            g, train=train, bn_momentum=bn_momentum
        )
        g = PointConv(128, bn=True, compute_dtype=dd, name="fc2")(
            g, train=train, bn_momentum=bn_momentum
        )
        concat = jnp.concatenate(
            [points_feat, jnp.broadcast_to(g[:, None, :], (b, n, 128))], axis=-1
        )
        x = PointConv(512, bn=True, compute_dtype=dd, name="conv6")(
            concat, train=train, bn_momentum=bn_momentum
        )
        x = PointConv(256, bn=True, compute_dtype=dd, name="conv7")(
            x, train=train, bn_momentum=bn_momentum
        )
        x = Dropout(0.3, name="dp1")(x, deterministic=not train)
        return PointConv(self.num_classes, bn=False, activation=None,
                         compute_dtype=dd, name="conv8")(x, train=train)
