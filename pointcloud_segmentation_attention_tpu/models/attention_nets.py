"""Full "AttentionNet" Keras-style models from the reference.

Ref ``attention_points/attention_scannet/attention_models.py`` and
``pooling_attention_model.py``: four attention SA levels (npoint 1024/256/64/16,
radius fixed 0.1, nsample 32) followed by the standard FP pyramid and seg head.

- ``AttentionNetModel``     — inner *attention* blocks then AttentionPool
  (query = group's first element), out_dims 8/16/32/64, 16 heads, so level
  outputs are 16*out_dim channels (ref ``AttentionNetLayer:128-168``).
- ``AttentionNetMLPModel``  — inner FeedForward blocks instead of inner
  attention (ref ``AttentionNetMLPLayer:171-210``).
- ``PoolingAttentionNetModel`` — standard conv-MLP SA ([32,32,64]...[256,256,512])
  pooled by AttentionPool queried with the group centroid coordinates
  (ref ``pooling_attention_layer.py:6-46``).  (The reference's trailing
  ``tf.squeeze(axis=2)`` on an already-rank-3 tensor is a latent bug and is
  omitted here.)

``AttentionNetFeatureModel`` == AttentionNetModel with features passed to
__call__ (ref ``attention_models.py:96-172``, identical wiring).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from pointcloud_segmentation_attention_tpu.nn import (
    AttentionPool,
    Dropout,
    FeaturePropagation,
    FeedForward,
    InnerAttentionBlock,
    PointConv,
    SharedMLP,
)
from pointcloud_segmentation_attention_tpu.nn.modules import sample_and_group

FP_MLPS = ((256, 256), (256, 256), (256, 128), (128, 128, 128))


class AttentionNetLayer(nn.Module):
    """sample_and_group -> inner blocks -> AttentionPool(first element query).

    ``inner_kind`` in {'attention', 'mlp'} selects InnerAttentionBlock vs
    FeedForward inner processing.
    """

    npoint: int
    out_dim: int
    inner_dimensions: Sequence[int]
    radius: float = 0.1
    nsample: int = 32
    inner_kind: str = "attention"
    num_heads: int = 16
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, points, *, train: bool = True):
        new_xyz, new_points, idx, _ = sample_and_group(
            self.npoint, self.radius, self.nsample, xyz, points, False, True
        )
        dd = self.compute_dtype
        if self.inner_kind == "attention":
            for i, dim in enumerate(self.inner_dimensions):
                new_points = InnerAttentionBlock(
                    out_dim=dim, key_dim=self.out_dim, compute_dtype=dd,
                    name=f"inner{i}",
                )(new_points, deterministic=not train)
        else:
            # MLP variant: ReLU between blocks, none after the last (ref :199-202)
            for i, dim in enumerate(self.inner_dimensions[:-1]):
                new_points = nn.relu(
                    FeedForward(dim, dim, compute_dtype=dd, name=f"inner{i}")(
                        new_points, deterministic=not train
                    )
                )
            new_points = FeedForward(
                self.inner_dimensions[-1], self.inner_dimensions[-1],
                compute_dtype=dd, name=f"inner{len(self.inner_dimensions) - 1}",
            )(new_points, deterministic=not train)
        query = new_points[:, :, :1, :]
        pooled = AttentionPool(
            output_dim=self.out_dim, key_dim=self.out_dim, num_heads=self.num_heads,
            compute_dtype=dd, name="attention_pool",
        )(new_points, query)
        return new_xyz, pooled, idx


class PoolingAttentionNetLayer(nn.Module):
    """Conv-MLP SA pooled by centroid-queried attention (ref
    pooling_attention_layer.py:26-46)."""

    npoint: int
    out_dim: int
    mlp: Sequence[int]
    radius: float = 0.1
    nsample: int = 32
    num_heads: int = 16
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, xyz, points, *, train: bool = True, bn_momentum=0.9):
        new_xyz, new_points, idx, _ = sample_and_group(
            self.npoint, self.radius, self.nsample, xyz, points, False, True
        )
        dd = self.compute_dtype
        new_points = SharedMLP(self.mlp, compute_dtype=dd, name="mlp")(
            new_points, train=train, bn_momentum=bn_momentum
        )
        pooled = AttentionPool(
            output_dim=self.out_dim, key_dim=self.out_dim, num_heads=self.num_heads,
            compute_dtype=dd, name="attention_pool",
        )(new_points, new_xyz[:, :, None, :])
        return new_xyz, pooled, idx


class _FPHead(nn.Module):
    """Shared FP pyramid + seg head used by all AttentionNet models
    (ref attention_models.py:43-88)."""

    num_classes: int
    compute_dtype: jnp.dtype

    @nn.compact
    def __call__(self, xyzs, feats, *, train: bool, bn_momentum):
        dd = self.compute_dtype
        up = feats[4]
        for i in range(4):
            lvl = 3 - i
            up = FeaturePropagation(FP_MLPS[i], compute_dtype=dd, name=f"fp{i + 1}")(
                xyzs[lvl], xyzs[lvl + 1], feats[lvl], up,
                train=train, bn_momentum=bn_momentum,
            )
        net = PointConv(128, bn=True, compute_dtype=dd, name="fc1")(
            up, train=train, bn_momentum=bn_momentum
        )
        net = Dropout(0.5, name="dp1")(net, deterministic=not train)
        return PointConv(
            self.num_classes, bn=False, activation=None, compute_dtype=dd, name="fc2"
        )(net, train=train)


class AttentionNetModel(nn.Module):
    """4 AttentionNetLayers (out_dim 8/16/32/64) + FP pyramid + head.

    ``inner_kind='mlp'`` gives the AttentionNetMLPModel variant; passing
    ``features`` gives the AttentionNetFeatureModel variant.
    """

    num_classes: int = 21
    inner_kind: str = "attention"
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
        out_dims = (8, 16, 32, 64)
        npoints = (1024, 256, 64, 16)
        xyzs, feats = [xyz], [features]
        for i in range(4):
            new_xyz, pooled, _ = AttentionNetLayer(
                npoint=npoints[i], out_dim=out_dims[i],
                inner_dimensions=[out_dims[i]], inner_kind=self.inner_kind,
                compute_dtype=dd, name=f"l{i + 1}",
            )(xyzs[-1], feats[-1], train=train)
            xyzs.append(new_xyz)
            feats.append(pooled)
        return _FPHead(self.num_classes, dd, name="head")(
            xyzs, feats, train=train, bn_momentum=bn_momentum
        )


class PoolingAttentionNetModel(nn.Module):
    """4 PoolingAttentionNetLayers (mlp [32,32,64]...[256,256,512]) + FP head
    (ref pooling_attention_model.py:17-93)."""

    num_classes: int = 21
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: jnp.ndarray, features: Optional[jnp.ndarray] = None,
        *, train: bool = True, bn_momentum=0.9,
    ) -> jnp.ndarray:
        dd = self.compute_dtype
        mlps = ((32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 256, 512))
        out_dims = (64, 128, 256, 512)
        npoints = (1024, 256, 64, 16)
        xyzs, feats = [xyz], [features]
        for i in range(4):
            new_xyz, pooled, _ = PoolingAttentionNetLayer(
                npoint=npoints[i], out_dim=out_dims[i], mlp=mlps[i],
                compute_dtype=dd, name=f"l{i + 1}",
            )(xyzs[-1], feats[-1], train=train, bn_momentum=bn_momentum)
            xyzs.append(new_xyz)
            feats.append(pooled)
        return _FPHead(self.num_classes, dd, name="head")(
            xyzs, feats, train=train, bn_momentum=bn_momentum
        )
