"""Training: states, steps, losses, metrics, schedules."""
from pointcloud_segmentation_attention_tpu.train import losses, metrics, schedules
from pointcloud_segmentation_attention_tpu.train.train_state import TrainState, create_state
from pointcloud_segmentation_attention_tpu.train.steps import (
    SCANNET_CLASS_WEIGHTS,
    make_sample_weights,
    seg_eval_step,
    seg_predict_step,
    seg_predict_step_packed,
    seg_train_step,
)
from pointcloud_segmentation_attention_tpu.train.cls_steps import (
    cls_eval_step,
    cls_train_step,
    partseg_eval_step,
    partseg_train_step,
)
from pointcloud_segmentation_attention_tpu.train.v1_partseg_trainer import (
    joint_eval_step,
    joint_train_step,
    train_v1_part_segmentation,
)

__all__ = [
    "losses", "metrics", "schedules",
    "TrainState", "create_state",
    "SCANNET_CLASS_WEIGHTS", "make_sample_weights",
    "seg_train_step", "seg_eval_step", "seg_predict_step",
    "seg_predict_step_packed",
    "cls_train_step", "cls_eval_step", "partseg_train_step", "partseg_eval_step",
    "joint_train_step", "joint_eval_step", "train_v1_part_segmentation",
]
