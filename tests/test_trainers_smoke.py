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
