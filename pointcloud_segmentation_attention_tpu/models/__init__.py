"""Model zoo.

Registry mirrors the reference's model-selection logic
(``attention_points/train.py:323-330`` + the upstream ``importlib`` dynamic
model import, ``pointnet2_tensorflow/train.py:53``).
"""
from __future__ import annotations

from typing import Any, Callable, Dict

from pointcloud_segmentation_attention_tpu.models.sem_seg import (
    SemSegNet,
    attention_all,
    attention_and_pooling,
    attention_single_layer,
    baseline,
    with_features,
)
from pointcloud_segmentation_attention_tpu.models.cls import ClsMSG, ClsSSG
from pointcloud_segmentation_attention_tpu.models.part_seg import (
    PartSegMSGOneHot,
    PartSegSSG,
)
from pointcloud_segmentation_attention_tpu.models.attention_nets import (
    AttentionNetModel,
    PoolingAttentionNetModel,
)
from pointcloud_segmentation_attention_tpu.models import pointnet1

_REGISTRY: Dict[str, Callable[..., Any]] = {
    # ScanNet semantic segmentation family
    "sem_seg": baseline,
    "sem_seg_features": with_features,
    "sem_seg_attention": attention_all,
    "sem_seg_attention_single_layer": attention_single_layer,
    "sem_seg_attention_and_pooling": attention_and_pooling,
    # classification
    "cls_ssg": ClsSSG,
    "cls_msg": ClsMSG,
    # part segmentation
    "part_seg": PartSegSSG,
    "part_seg_msg_one_hot": PartSegMSGOneHot,
    # full attention nets
    "attention_net": AttentionNetModel,
    "attention_net_mlp": lambda **kw: AttentionNetModel(inner_kind="mlp", **kw),
    "pooling_attention_net": PoolingAttentionNetModel,
    # PointNet v1 family
    "pointnet1_cls_basic": pointnet1.PointNetClsBasic,
    "pointnet1_cls": pointnet1.PointNetCls,
    "pointnet1_seg": pointnet1.PointNetSeg,
    "pointnet1_part_seg": pointnet1.PointNetPartSegJoint,
    "pointnet1_sem_seg": pointnet1.PointNetSemSeg,
}


def get_model(name: str, **kwargs):
    """Instantiate a model by registry name."""
    if name not in _REGISTRY:
        raise KeyError(f"unknown model '{name}'; available: {sorted(_REGISTRY)}")
    return _REGISTRY[name](**kwargs)


def available_models():
    return sorted(_REGISTRY)


__all__ = [
    "SemSegNet", "baseline", "with_features", "attention_all",
    "attention_single_layer", "attention_and_pooling",
    "ClsSSG", "ClsMSG", "PartSegSSG", "PartSegMSGOneHot",
    "AttentionNetModel", "PoolingAttentionNetModel",
    "get_model", "available_models", "pointnet1",
]
