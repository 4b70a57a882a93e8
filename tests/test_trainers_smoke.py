"""End-to-end smoke tests of the three trainer loops on synthetic data."""
import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.data import modelnet, shapenet_part


def test_cls_trainer_smoke(tmp_path):
    root = str(tmp_path / "modelnet")
    modelnet.write_synthetic_modelnet(root, num_classes=3, shapes_per_class=3,
                                      n_points=64)
    from pointcloud_segmentation_attention_tpu.train.cls_trainer import (
        train_classification,
    )
    summary = train_classification(
        root, model_name="cls_ssg", num_classes=3, npoints=64, batch_size=2,
        epochs=1, log_dir=str(tmp_path / "logs"), num_votes=2, n_devices=2,
        max_steps=3,
    )
    assert summary["steps"] >= 1
    assert 0.0 <= summary["best_accuracy"] <= 1.0


def test_partseg_trainer_smoke(tmp_path):
    root = str(tmp_path / "shapenet")
    shapenet_part.write_synthetic_shapenet_part(root, n_shapes_per_cat=4,
                                                n_points=64)
    from pointcloud_segmentation_attention_tpu.train.partseg_trainer import (
        train_part_segmentation,
    )
    summary = train_part_segmentation(
        root, model_name="part_seg", npoints=64, batch_size=2, epochs=1,
        log_dir=str(tmp_path / "logs"), n_devices=2, max_steps=2,
    )
    assert summary["steps"] >= 1
    assert 0.0 <= summary["best_class_avg_iou"] <= 1.0


def test_pointnet1_cls_trainer_ortho_reg(tmp_path):
    """pointnet1_cls trains with the T-Net ortho regularizer active and
    demonstrably non-zero after a few steps (ref pointnet_cls.py:77-92,
    reg_weight=0.001 always applied)."""
    root = str(tmp_path / "modelnet")
    modelnet.write_synthetic_modelnet(root, num_classes=2, shapes_per_class=4,
                                      n_points=48)
    from pointcloud_segmentation_attention_tpu.train.cls_trainer import (
        train_classification,
    )
    summary = train_classification(
        root, model_name="pointnet1_cls", num_classes=2, npoints=48,
        batch_size=2, epochs=2, log_dir=str(tmp_path / "logs"), n_devices=2,
        max_steps=6,
    )
    assert summary["steps"] >= 4
    # T-Nets start at exact identity (ortho = 0); after a few gradient steps
    # the transform moves and the regularizer must be non-zero.
    assert summary["last_ortho_loss"] > 0.0


def test_pointnet1_seg_partseg_trainer(tmp_path):
    """pointnet1_seg trains through the part-seg trainer: tuple-returning
    model, xyz-only input slice, ortho reg non-zero."""
    root = str(tmp_path / "shapenet")
    shapenet_part.write_synthetic_shapenet_part(root, n_shapes_per_cat=4,
                                                n_points=48)
    from pointcloud_segmentation_attention_tpu.train.partseg_trainer import (
        train_part_segmentation,
    )
    summary = train_part_segmentation(
        root, model_name="pointnet1_seg", npoints=48, batch_size=2, epochs=2,
        log_dir=str(tmp_path / "logs"), n_devices=2, max_steps=5,
    )
    assert summary["steps"] >= 4
    assert summary["last_ortho_loss"] > 0.0


def test_v1_joint_partseg_trainer(tmp_path):
    """The v1 joint cls+seg trainer (ref pointnet1/part_seg/train.py) runs on
    the synthetic h5 flow with the combined loss."""
    from pointcloud_segmentation_attention_tpu.data.shapenet_part import (
        write_synthetic_shapenet_part_h5,
    )
    from pointcloud_segmentation_attention_tpu.train.v1_partseg_trainer import (
        train_v1_part_segmentation,
    )
    train_list, val_list = write_synthetic_shapenet_part_h5(
        str(tmp_path / "h5"), n_shards=1, shapes_per_shard=4, n_points=48,
        cat_num=4)
    summary = train_v1_part_segmentation(
        train_list, val_list, cat_num=4, part_num=8, npoints=48, batch_size=2,
        epochs=3, log_dir=str(tmp_path / "logs"), n_devices=2, max_steps=6,
    )
    assert summary["steps"] >= 4
    assert summary["last_ortho_loss"] > 0.0
    assert 0.0 <= summary["best_seg_accuracy"] <= 1.0
