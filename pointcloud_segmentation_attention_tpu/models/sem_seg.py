"""Semantic-segmentation model family (ScanNet, 21 classes).

One configurable skeleton covers the reference's five ``get_model`` variants:

- baseline             — ``pointnet2_tensorflow/models/pointnet2_sem_seg.py:19-69``
- features             — ``attention_points/models/pointnet2_sem_seg_features.py:11-59``
                         (color/normal features enter as l0_points)
- attention (all SA)   — ``attention_points/models/pointnet2_sem_seg_attention.py:11-62``
- attention single     — ``.../pointnet2_sem_seg_attention_single_layer.py:13-76``
- attention + pooling  — ``.../pointnet2_sem_seg_attention_and_pooling.py:12-71``

Shared hierarchy (all variants): SA npoint 1024/256/64/16, radius .1/.2/.4/.8,
nsample 32, mlps [32,32,64]/[64,64,128]/[128,128,256]/[256,256,512]; FP
[256,256]/[256,256]/[256,128]/[128,128,128]; head conv1d(128) -> dropout(0.5)
-> conv1d(num_classes).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pointcloud_segmentation_attention_tpu.nn import (
    Dropout,
    FeaturePropagation,
    PointConv,
    SetAbstraction,
)

SA_NPOINTS = (1024, 256, 64, 16)
SA_RADII = (0.1, 0.2, 0.4, 0.8)
SA_NSAMPLE = 32
SA_MLPS = ((32, 32, 64), (64, 64, 128), (128, 128, 256), (256, 256, 512))
FP_MLPS = ((256, 256), (256, 256), (256, 128), (128, 128, 128))


class SemSegNet(nn.Module):
    """PointNet++ semantic segmentation with per-level pooling selection.

    ``sa_pooling`` holds one pooling mode per SA level ('max', 'attention',
    'attention_and_pool', ...), so the baseline, all-attention,
    single-attention-layer and attention+pool variants are configs of one
    module (mirroring the reference's ``pointnet_sa_wrapper`` dispatch,
    ``pointnet2_sem_seg_attention_single_layer.py:13-26``).
    """

    num_classes: int = 21
    sa_pooling: Tuple[str, str, str, str] = ("max", "max", "max", "max")
    dropout_rate: float = 0.5
    compute_dtype: jnp.dtype = jnp.float32
    # Hierarchy knobs (defaults = the reference's ScanNet architecture).
    sa_npoints: Tuple[int, ...] = SA_NPOINTS
    sa_radii: Tuple[float, ...] = SA_RADII
    sa_nsample: int = SA_NSAMPLE
    sa_mlps: Tuple[Tuple[int, ...], ...] = SA_MLPS
    fp_mlps: Tuple[Tuple[int, ...], ...] = FP_MLPS

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
        xyzs = [xyz]
        feats = [features]
        for i in range(4):
            new_xyz, new_points, _ = SetAbstraction(
                npoint=self.sa_npoints[i],
                radius=self.sa_radii[i],
                nsample=self.sa_nsample,
                mlp=self.sa_mlps[i],
                pooling=self.sa_pooling[i],
                compute_dtype=dd,
                name=f"sa{i + 1}",
            )(xyzs[-1], feats[-1], train=train, bn_momentum=bn_momentum)
            xyzs.append(new_xyz)
            feats.append(new_points)

        # FP pyramid: level 3 <- 4, 2 <- 3, 1 <- 2, 0 <- 1.
        up = feats[4]
        for i in range(4):
            lvl = 3 - i  # target level
            up = FeaturePropagation(
                self.fp_mlps[i], compute_dtype=dd, name=f"fp{i + 1}"
            )(xyzs[lvl], xyzs[lvl + 1], feats[lvl], up, train=train, bn_momentum=bn_momentum)

        net = PointConv(128, bn=True, compute_dtype=dd, name="fc1")(
            up, train=train, bn_momentum=bn_momentum
        )
        net = Dropout(self.dropout_rate, name="dp1")(net, deterministic=not train)
        logits = PointConv(
            self.num_classes, bn=False, activation=None, compute_dtype=dd, name="fc2"
        )(net, train=train)
        return logits


def baseline(num_classes: int = 21, **kw) -> SemSegNet:
    return SemSegNet(num_classes=num_classes, **kw)


def with_features(num_classes: int = 21, **kw) -> SemSegNet:
    """Same skeleton; pass color/normal features to __call__ (ref
    pointnet2_sem_seg_features.py:25 — features enter as l0_points)."""
    return SemSegNet(num_classes=num_classes, **kw)


def attention_all(num_classes: int = 21, **kw) -> SemSegNet:
    return SemSegNet(
        num_classes=num_classes, sa_pooling=("attention",) * 4, **kw
    )


def attention_single_layer(layer_idx: int, num_classes: int = 21, **kw) -> SemSegNet:
    assert 0 <= layer_idx < 4
    pooling = tuple(
        "attention" if i == layer_idx else "max" for i in range(4)
    )
    return SemSegNet(num_classes=num_classes, sa_pooling=pooling, **kw)


def attention_and_pooling(num_classes: int = 21, **kw) -> SemSegNet:
    return SemSegNet(
        num_classes=num_classes, sa_pooling=("attention_and_pool",) * 4, **kw
    )
