"""Tests for PLY preprocessing: mesh reading, normals, scene conversion."""
import os

import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.data.scannet import preprocessing as prep
from pointcloud_segmentation_attention_tpu.data.scannet import scenes as scenes_lib


def _write_ascii_ply(path, points, colors=None, labels=None, faces=None):
    props = ["property float x", "property float y", "property float z"]
    cols = [points]
    if colors is not None:
        props += ["property uchar red", "property uchar green", "property uchar blue"]
        cols.append(colors)
    if labels is not None:
        props += ["property ushort label"]
        cols.append(labels[:, None])
    header = ["ply", "format ascii 1.0", f"element vertex {len(points)}"] + props
    if faces is not None:
        header += [f"element face {len(faces)}",
                   "property list uchar int vertex_indices"]
    header += ["end_header"]
    with open(path, "w") as f:
        f.write("\n".join(header) + "\n")
        data = np.concatenate([np.asarray(c, np.float64) for c in cols], axis=1)
        for row in data:
            f.write(" ".join(str(v) for v in row) + "\n")
        if faces is not None:
            for face in faces:
                f.write("3 " + " ".join(str(int(v)) for v in face) + "\n")


def test_read_ascii_ply_with_faces(tmp_path):
    pts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    colors = np.array([[255, 0, 0]] * 4)
    faces = np.array([[0, 1, 2], [0, 1, 3]])
    path = str(tmp_path / "mesh.ply")
    _write_ascii_ply(path, pts, colors=colors, faces=faces)
    mesh = prep.read_ply_mesh(path)
    np.testing.assert_allclose(mesh["points"], pts)
    np.testing.assert_array_equal(mesh["colors"][0], [255, 0, 0])
    assert mesh["faces"].shape == (2, 3)


def test_vertex_normals_flat_plane():
    # A flat z=0 quad: all vertex normals must be +-z.
    pts = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]])
    normals = prep.compute_vertex_normals(pts, faces)
    np.testing.assert_allclose(np.abs(normals[:, 2]), 1.0, atol=1e-6)
    np.testing.assert_allclose(normals[:, :2], 0.0, atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(normals, axis=1), 1.0, rtol=1e-6)


def test_ply_scene_to_npy_roundtrip(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.rand(50, 3).astype(np.float32)
    colors = rng.randint(0, 255, (50, 3))
    labels = rng.randint(0, 40, 50)
    faces = np.stack([np.arange(48), np.arange(1, 49), np.arange(2, 50)], 1)
    mesh_path = str(tmp_path / "scene0000_00_vh_clean_2.ply")
    labels_path = str(tmp_path / "scene0000_00_vh_clean_2.labels.ply")
    _write_ascii_ply(mesh_path, pts, colors=colors, faces=faces)
    _write_ascii_ply(labels_path, pts, labels=labels)
    data_root = str(tmp_path / "npy")
    prep.ply_scene_to_npy(mesh_path, data_root, "scene0000_00", labels_path)
    scene = scenes_lib.load_scene(data_root, "scene0000_00")
    np.testing.assert_allclose(scene["points"], pts, rtol=1e-5)
    np.testing.assert_array_equal(scene["labels"], labels)
    assert np.abs(np.linalg.norm(scene["normals"], axis=1) - 1).max() < 1e-4


def test_download_stub_raises():
    with pytest.raises(RuntimeError):
        prep.download_scannet()
