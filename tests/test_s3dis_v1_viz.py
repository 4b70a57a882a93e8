"""Tests: S3DIS pipeline + trainer, ScanNet v1 trainer, animations."""
import os

import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.data import s3dis
from pointcloud_segmentation_attention_tpu.data import scannet as sc


def test_room_to_blocks_normalized():
    room = s3dis.make_synthetic_room(n_points=8000, seed=1)
    data, labels = s3dis.room_to_blocks_normalized(room, num_point=256)
    assert data.shape[1:] == (256, 9)
    assert labels.shape == data.shape[:2]
    assert labels.max() < 13
    # rgb scaled to [0,1]; normalized coords in [0,1]
    assert data[:, :, 3:6].max() <= 1.0 + 1e-6
    assert data[:, :, 6:9].min() >= -1e-6 and data[:, :, 6:9].max() <= 1.0 + 1e-6
    # block-centered xy within +-(block/2 + eps)
    assert np.abs(data[:, :, 0:2]).max() <= 0.5 + 1e-5


def test_collect_room(tmp_path):
    d = str(tmp_path / "Annotations")
    os.makedirs(d)
    rng = np.random.RandomState(0)
    np.savetxt(os.path.join(d, "chair_1.txt"),
               np.concatenate([rng.rand(50, 3) + 1, rng.randint(0, 255, (50, 3))], 1))
    np.savetxt(os.path.join(d, "stairs_1.txt"),  # unknown class -> clutter
               np.concatenate([rng.rand(20, 3) + 1, rng.randint(0, 255, (20, 3))], 1))
    data_label = s3dis.collect_room(d)
    assert data_label.shape == (70, 7)
    assert (data_label.min(0)[:3] == 0).all()  # shifted to origin
    assert set(np.unique(data_label[:, 6])) == {
        float(s3dis.CLASS2LABEL["chair"]), float(s3dis.CLASS2LABEL["clutter"])
    }


def test_s3dis_trainer_smoke(tmp_path):
    from pointcloud_segmentation_attention_tpu.train.s3dis_trainer import train_s3dis

    rooms = [s3dis.make_synthetic_room(4000, seed=i) for i in range(2)]
    summary = train_s3dis(
        rooms[:1], rooms[1:], num_point=128, batch_size=4, epochs=1,
        log_dir=str(tmp_path / "logs"), n_devices=2, max_steps=2,
    )
    assert summary["steps"] >= 1
    assert 0.0 <= summary["best_miou"] <= 1.0


def test_scannet_v1_trainer_smoke(tmp_path):
    from pointcloud_segmentation_attention_tpu.train.v1_scannet_trainer import (
        train_scannet_v1,
    )

    root = str(tmp_path / "scannet")
    splits = sc.write_synthetic_dataset(root, n_train=2, n_val=1, n_test=0,
                                        n_points=5000)
    summary = train_scannet_v1(
        root, splits["train"], splits["val"], npoints=256, batch_size=2,
        epochs=1, log_dir=str(tmp_path / "logs"), n_devices=2, max_steps=1,
    )
    assert summary["steps"] == 1
    assert "eval_calibrated_vox_accuracy" in summary
    assert 0.0 <= summary["eval_accuracy"] <= 1.0


def test_rotation_animation(tmp_path):
    from pointcloud_segmentation_attention_tpu.viz.animations import (
        rotation_animation, training_label_replay, write_png,
    )

    rng = np.random.RandomState(0)
    pts = rng.rand(500, 3).astype(np.float32)
    labels = rng.randint(0, 21, 500)
    frames = rotation_animation(pts, labels, str(tmp_path / "anim"), n_frames=3,
                                size=64)
    assert len(frames) == 3
    for f in frames:
        assert os.path.getsize(f) > 100
        with open(f, "rb") as fh:
            assert fh.read(4) == b"\x89PNG"
    # label replay
    paths = training_label_replay(
        pts, [labels, (labels + 1) % 21], str(tmp_path / "replay"), size=64
    )
    assert len(paths) == 2
