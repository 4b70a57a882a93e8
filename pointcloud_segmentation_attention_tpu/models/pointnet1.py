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
    """T-Net: per-point MLP -> max pool -> FC stack -> KxK matrix initialized
    to identity (zero weights + identity bias).  Default widths match the
    cls/seg T-Nets (ref ``pointnet1/models/transform_nets.py:10-60``); the
    joint part-seg model uses narrower stacks
    (ref ``pointnet1/part_seg/pointnet_part_seg.py:12-76``)."""

    k: int
    mlp: tuple = (64, 128, 1024)
    fc: tuple = (512, 256)
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, bn_momentum):
        dd = self.compute_dtype
        b = x.shape[0]
        for i, f in enumerate(self.mlp):
            x = PointConv(f, bn=True, compute_dtype=dd, name=f"tconv{i + 1}")(
                x, train=train, bn_momentum=bn_momentum
            )
        x = jnp.max(x, axis=1)  # (B, mlp[-1])
        for i, f in enumerate(self.fc):
            x = PointConv(f, bn=True, compute_dtype=dd, name=f"tfc{i + 1}")(
                x, train=train, bn_momentum=bn_momentum
            )
        w = self.param("transform_w", nn.initializers.zeros, (self.fc[-1], self.k * self.k), jnp.float32)
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


class PointNetPartSegJoint(nn.Module):
    """Joint classification + part-segmentation PointNet v1.

    Equivalent of the reference's part-seg subtree model
    (``pointnet1/part_seg/pointnet_part_seg.py:79-136`` ``get_model``):
    input T-Net (3x3, narrow FC 128/128), three per-point convs whose
    activations are all kept for the seg head, a 128x128 feature T-Net
    (conv 256/1024, FC 512/256), conv 512/2048 + global max pool; a
    classification head (FC 256/256, dropout keep 0.7, ``cat_num``) and a
    segmentation head that concatenates the tiled [global feat ++ one-hot
    object class] with every intermediate activation (out1..out5), then
    conv 256 / drop / 256 / drop / 128 / ``part_num`` (dropout keep 0.8).

    Returns ``(cls_logits, seg_logits, end_points)`` with
    ``end_points['transform']`` = the 128x128 feature transform for the
    orthogonality regularizer (``get_loss`` ref :138-158).
    """

    cat_num: int = 16
    part_num: int = 50
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, cls_onehot, *, train: bool = True, bn_momentum=0.9):
        dd = self.compute_dtype
        b, n, _ = xyz.shape
        t_in = TransformNet(3, mlp=(64, 128, 1024), fc=(128, 128),
                            compute_dtype=dd, name="transform_net1")(
            xyz, train=train, bn_momentum=bn_momentum
        )
        x = jnp.einsum("bni,bij->bnj", xyz, t_in)
        out1 = PointConv(64, bn=True, compute_dtype=dd, name="conv1")(
            x, train=train, bn_momentum=bn_momentum
        )
        out2 = PointConv(128, bn=True, compute_dtype=dd, name="conv2")(
            out1, train=train, bn_momentum=bn_momentum
        )
        out3 = PointConv(128, bn=True, compute_dtype=dd, name="conv3")(
            out2, train=train, bn_momentum=bn_momentum
        )
        t_feat = TransformNet(128, mlp=(256, 1024), fc=(512, 256),
                              compute_dtype=dd, name="transform_net2")(
            out3, train=train, bn_momentum=bn_momentum
        )
        net_transformed = jnp.einsum("bni,bij->bnj", out3, t_feat)
        out4 = PointConv(512, bn=True, compute_dtype=dd, name="conv4")(
            net_transformed, train=train, bn_momentum=bn_momentum
        )
        out5 = PointConv(2048, bn=True, compute_dtype=dd, name="conv5")(
            out4, train=train, bn_momentum=bn_momentum
        )
        out_max = jnp.max(out5, axis=1)  # (B, 2048)

        # classification head (ref :115-121)
        c = PointConv(256, bn=True, compute_dtype=dd, name="cla_fc1")(
            out_max, train=train, bn_momentum=bn_momentum
        )
        c = PointConv(256, bn=True, compute_dtype=dd, name="cla_fc2")(
            c, train=train, bn_momentum=bn_momentum
        )
        c = Dropout(0.3, name="cla_dp1")(c, deterministic=not train)
        cls_logits = PointConv(self.cat_num, bn=False, activation=None,
                               compute_dtype=dd, name="cla_fc3")(c, train=train)

        # segmentation head: tiled [global ++ one-hot] ++ out1..out5 (ref :123-133)
        g = jnp.concatenate([out_max, cls_onehot.astype(out_max.dtype)], axis=-1)
        expand = jnp.broadcast_to(g[:, None, :], (b, n, g.shape[-1]))
        s = jnp.concatenate([expand, out1, out2, out3, out4, out5], axis=-1)
        s = PointConv(256, bn=True, compute_dtype=dd, name="seg_conv1")(
            s, train=train, bn_momentum=bn_momentum
        )
        s = Dropout(0.2, name="seg_dp1")(s, deterministic=not train)
        s = PointConv(256, bn=True, compute_dtype=dd, name="seg_conv2")(
            s, train=train, bn_momentum=bn_momentum
        )
        s = Dropout(0.2, name="seg_dp2")(s, deterministic=not train)
        s = PointConv(128, bn=True, compute_dtype=dd, name="seg_conv3")(
            s, train=train, bn_momentum=bn_momentum
        )
        seg_logits = PointConv(self.part_num, bn=False, activation=None,
                               compute_dtype=dd, name="seg_conv4")(s, train=train)
        return cls_logits, seg_logits, {"transform": t_feat}
