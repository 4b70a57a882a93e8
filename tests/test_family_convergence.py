"""Convergence evidence for the non-flagship model families: each family's
REAL driver + evaluator demonstrably learns on synthetic data (the flagship
sem-seg recipe has its own test in test_convergence_recipe.py).

Scaled down for suite time; the full-scale run is
``recipes/family_convergence.py`` (committed results at repo root when run
on hardware).
"""
import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.recipes import (
    run_cls_convergence,
    run_partseg_convergence,
    run_s3dis_convergence,
)


@pytest.mark.slow
def test_cls_family_converges(tmp_path):
    """PointNet++ SSG classification: synthetic ModelNet (8 classes, chance
    12.5%) through train_classification + voting eval reaches high accuracy."""
    summary = run_cls_convergence(
        str(tmp_path), "cls_ssg", num_classes=8, shapes_per_class=6,
        n_points=256, batch_size=8, epochs=12, num_votes=3, n_devices=4,
    )
    assert summary["best_accuracy"] >= 0.5, summary  # 4x chance


@pytest.mark.slow
def test_pointnet1_cls_family_converges(tmp_path):
    """PointNet v1 with T-Nets: converges AND the orthogonality regularizer
    is live (ref pointnet1/models/pointnet_cls.py:77-92, reg_weight=0.001)."""
    summary = run_cls_convergence(
        str(tmp_path), "pointnet1_cls", num_classes=8, shapes_per_class=6,
        n_points=256, batch_size=8, epochs=12, num_votes=1, n_devices=4,
    )
    assert summary["best_accuracy"] >= 0.5, summary
    assert summary["last_ortho_loss"] > 0.0, summary


@pytest.mark.slow
def test_partseg_family_converges(tmp_path):
    """PointNet++ part-seg: synthetic ShapeNet z-slice parts through
    train_part_segmentation + per-category part-IoU."""
    summary = run_partseg_convergence(
        str(tmp_path), "part_seg", n_shapes_per_cat=8, n_points=256,
        batch_size=4, epochs=12, n_devices=4,
    )
    # Parts are z-slices (4 per category): chance class-avg IoU ~0.15.
    assert summary["best_class_avg_iou"] >= 0.4, summary


@pytest.mark.slow
def test_s3dis_family_converges(tmp_path):
    """PointNet v1 S3DIS sem-seg: synthetic rooms through train_s3dis +
    whole-room stitched eval.  Geometry predicts floor/ceiling/wall only,
    so the bar is mIoU well above the ~0.05 chance level (measured 0.24 at
    120 steps)."""
    summary = run_s3dis_convergence(str(tmp_path), epochs=12, n_devices=4)
    assert summary["best_miou"] >= 0.15, summary
