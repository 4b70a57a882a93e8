"""Tests: raw ScanNet scan collection, part-seg voting eval, palette wrap."""
import json
import os

import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.data.scannet import (
    preprocessing as prep,
    scenes as scenes_lib,
)
from pointcloud_segmentation_attention_tpu.eval.voting import (
    evaluate_part_segmentation,
    vote_predict_partseg,
)


def _write_raw_scan(scan_dir, scene, points, seg_indices, groups):
    os.makedirs(scan_dir, exist_ok=True)
    props = ["property float x", "property float y", "property float z"]
    with open(os.path.join(scan_dir, f"{scene}_vh_clean_2.ply"), "w") as f:
        f.write("\n".join(["ply", "format ascii 1.0",
                           f"element vertex {len(points)}"] + props
                          + ["end_header"]) + "\n")
        for row in points:
            f.write(" ".join(str(v) for v in row) + "\n")
    json.dump({"segIndices": seg_indices},
              open(os.path.join(scan_dir,
                                f"{scene}_vh_clean_2.0.010000.segs.json"), "w"))
    json.dump({"segGroups": groups},
              open(os.path.join(scan_dir, f"{scene}.aggregation.json"), "w"))


def test_collect_scannet_scene(tmp_path):
    scan_dir = str(tmp_path / "scene0001_00")
    pts = np.arange(18, dtype=np.float32).reshape(6, 3)
    _write_raw_scan(scan_dir, "scene0001_00", pts,
                    seg_indices=[0, 0, 1, 2, 2, 3],
                    groups=[{"label": "chair", "segments": [0, 1]},
                            {"label": "floor", "segments": [2]},
                            {"label": "unknown thing", "segments": [3]}])
    data_root = str(tmp_path / "npy")
    labels = prep.collect_scannet_scene(
        scan_dir, "scene0001_00", data_root,
        raw_to_nyu40={"chair": 5, "floor": 2},
    )
    np.testing.assert_array_equal(labels, [5, 5, 5, 2, 2, 0])
    scene = scenes_lib.load_scene(data_root, "scene0001_00")
    np.testing.assert_allclose(scene["points"], pts)
    assert scene["normals"].shape == (6, 3)


def test_collect_scene_requires_mapping(tmp_path):
    with pytest.raises(ValueError):
        prep.collect_scannet_scene(str(tmp_path), "x", str(tmp_path))


def test_vote_predict_partseg_permutation_invariant():
    # A per-point deterministic predictor: voting over shuffles must return
    # exactly num_votes * single-pass logits (un-permutation is exact).
    def predict_fn(points):
        return np.stack([points[..., 0], -points[..., 0]], axis=-1)

    rng = np.random.RandomState(0)
    pts = rng.randn(2, 32, 3).astype(np.float32)
    votes = vote_predict_partseg(predict_fn, pts, num_votes=5)
    np.testing.assert_allclose(votes, 5 * predict_fn(pts), rtol=1e-5)


def test_evaluate_part_segmentation_with_ply_dump(tmp_path):
    from pointcloud_segmentation_attention_tpu.data import shapenet_part

    root = str(tmp_path / "shapenet")
    shapenet_part.write_synthetic_shapenet_part(root, n_shapes_per_cat=3,
                                                n_points=32)
    ds = shapenet_part.PartNormalDataset(root, npoints=32, split="test")

    def predict_fn(points):  # constant logits -> picks first part per category
        return np.ones((points.shape[0], points.shape[1], 50), np.float32)

    ply_dir = str(tmp_path / "plys")
    res = evaluate_part_segmentation(predict_fn, ds, batch_size=2,
                                     num_votes=2, ply_dir=ply_dir)
    assert 0.0 <= res["instance_avg_iou"] <= 1.0
    assert len(os.listdir(ply_dir)) == len(ds)


def test_colorize_labels_wraps_part_ids():
    from pointcloud_segmentation_attention_tpu.viz import colorize_labels

    colors = colorize_labels(np.arange(50))
    assert colors.shape == (50, 3)
    # wrapped part ids never collapse to the black unannotated color
    assert (colors[21:].sum(axis=1) > 0).all()
