"""Tests for pc_util (voxelization, renders, voxel metrics, virtual scan) and
the ScanNet v1-compat dataset classes."""
import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.utils import pc_util
from pointcloud_segmentation_attention_tpu.data import scannet as sc
from pointcloud_segmentation_attention_tpu.data.scannet import v1_compat


@pytest.fixture(scope="module")
def scene_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("scannet_v1"))
    sc.write_synthetic_dataset(root, n_train=2, n_val=1, n_test=0, n_points=6000)
    return root


def test_point_cloud_to_volume_roundtrip():
    pts = np.array([[0.0, 0.0, 0.0], [0.5, 0.5, 0.5], [-0.5, -0.5, -0.5]])
    vol = pc_util.point_cloud_to_volume(pts, vsize=8, radius=1.0)
    assert vol.shape == (8, 8, 8)
    assert vol.sum() == 3
    back = pc_util.volume_to_point_cloud(vol)
    assert len(back) == 3


def test_point_cloud_to_volume_batch():
    rng = np.random.RandomState(0)
    pcs = rng.uniform(-1, 1, (4, 50, 3))
    flat = pc_util.point_cloud_to_volume_batch(pcs, vsize=6)
    assert flat.shape == (4, 216)


def test_three_views_render():
    rng = np.random.RandomState(0)
    pts = rng.randn(200, 3).astype(np.float32)
    img = pc_util.point_cloud_three_views(pts)
    assert img.shape == (500, 1500)
    assert img.max() <= 1.0 and img.max() > 0


def test_surface_voxel_label():
    # ceil-based voxelization: 0.05 and 0.051 land in voxel 1, 1.0 in voxel 10.
    pts = np.array([[0.05, 0, 0], [0.051, 0, 0], [1, 1, 1]], np.float32)
    pts = np.vstack([pts, [[0, 0, 0]]])  # coordmin anchor at origin
    labels = np.array([3, 4, 5, 3])
    uvlabel, uvidx = pc_util.point_cloud_label_to_surface_voxel_label_fast(
        pts, labels, res=0.1
    )
    # Three occupied voxels (origin, the shared 0.05-voxel, and 1,1,1); the
    # shared voxel keeps the FIRST point's label (3), dropping 4.
    assert len(uvlabel) == 3
    assert 4 not in uvlabel
    assert (uvlabel == [3, 3, 5]).all()


def test_calibrated_voxel_accuracy():
    correct = np.ones(20) * 50
    seen = np.ones(20) * 100
    acc = pc_util.calibrated_voxel_accuracy(correct, seen)
    assert acc == pytest.approx(0.5)


def test_virtual_scan_subsamples():
    rng = np.random.RandomState(0)
    pts = rng.uniform(0, 4, (5000, 3)).astype(np.float32)
    visible = pc_util.virtual_scan(pts, mode=0, rng=rng)
    assert 0 < len(visible) < 5000
    assert len(np.unique(visible)) == len(visible)
    # Different camera modes see different subsets.
    v2 = pc_util.virtual_scan(pts, mode=4, rng=rng)
    assert set(visible.tolist()) != set(v2.tolist())


def test_v1_random_chunk_dataset(scene_root):
    names = sc.read_split(f"{scene_root}/splits", "train")
    ds = v1_compat.ScannetDataset(scene_root, names, npoints=512)
    assert len(ds) == 2
    pts, lab, w = ds[0]
    assert pts.shape == (512, 3) and lab.shape == (512,) and w.shape == (512,)
    assert np.isfinite(w).all()


def test_v1_whole_scene_dataset(scene_root):
    names = sc.read_split(f"{scene_root}/splits", "val")
    ds = v1_compat.ScannetDatasetWholeScene(scene_root, names, npoints=512)
    pts, lab, w = ds[0]
    assert pts.ndim == 3 and pts.shape[1] == 512
    assert lab.shape == pts.shape[:2]


def test_v1_virtual_scan_dataset(scene_root):
    names = sc.read_split(f"{scene_root}/splits", "train")
    ds = v1_compat.ScannetDatasetVirtualScan(scene_root, names, npoints=256)
    pts, lab, w = ds[0]
    assert pts.shape[0] >= 1 and pts.shape[1:] == (256, 3)
    assert w.shape == lab.shape


def test_majority_vote_surface_voxel_label():
    """Majority-vote variant (ref scannet/pc_util.py:24-40) vs a naive
    per-voxel bincount oracle, 1-D and 2-D label forms."""
    rng = np.random.RandomState(3)
    pts = rng.uniform(0, 0.4, (400, 3)).astype(np.float32)  # few big voxels
    lab = rng.randint(0, 5, 400)

    uvlabel, uvidx = pc_util.point_cloud_label_to_surface_voxel_label(pts, lab, res=0.1)
    # naive oracle
    coordmin = pts.min(0)
    nvox = np.ceil((pts.max(0) - coordmin) / 0.1)
    vidx = np.ceil((pts - coordmin) / 0.1)
    vidx = vidx[:, 0] + vidx[:, 1] * nvox[0] + vidx[:, 2] * nvox[0] * nvox[1]
    want_idx = np.unique(vidx)
    want = np.array([np.argmax(np.bincount(lab[vidx == uv])) for uv in want_idx])
    np.testing.assert_array_equal(uvidx, want_idx)
    np.testing.assert_array_equal(uvlabel, want)

    # 2-D labels (gt, pred) like the calibrated-accuracy path
    lab2 = np.stack([lab, (lab + 1) % 5], 1)
    uvlabel2, _ = pc_util.point_cloud_label_to_surface_voxel_label(pts, lab2, res=0.1)
    np.testing.assert_array_equal(uvlabel2[:, 0], want)


def test_v1_trainer_virtual_scan(scene_root, tmp_path):
    """train_scannet_v1 trains on the virtual-scan dataset (VERDICT #8)."""
    from pointcloud_segmentation_attention_tpu.train.v1_scannet_trainer import (
        train_scannet_v1,
    )
    names = sc.read_split(f"{scene_root}/splits", "train")
    val = sc.read_split(f"{scene_root}/splits", "val")
    summary = train_scannet_v1(
        scene_root, names, val, npoints=256, batch_size=2, epochs=1,
        log_dir=str(tmp_path / "logs"), n_devices=2, max_steps=2,
        dataset_kind="virtual",
    )
    assert summary["steps"] >= 1
    assert np.isfinite(summary["train_loss"])


def test_point_cloud_to_image():
    """Per-pixel point sets (ref utils/pc_util.py:126-171): shape, centering,
    replication padding and empty-pixel zeros."""
    pts = np.array([[-0.9, -0.9, 0.3], [0.9, 0.9, -0.2], [0.88, 0.88, 0.1]],
                   np.float32)
    img = pc_util.point_cloud_to_image(pts, imgsize=4, radius=1.0, num_sample=4,
                                       rng=np.random.RandomState(0))
    assert img.shape == (4, 4, 4, 3)
    assert np.all(img[1, 2] == 0)  # empty pixel
    assert np.any(img[0, 0] != 0) and np.any(img[3, 3] != 0)
    # xy are pixel-relative in [-0.5, 0.5]; z passes through.
    assert np.all(np.abs(img[..., :2]) <= 0.5 + 1e-6)
    batch = pc_util.point_cloud_to_image_batch(pts[None], 4, 1.0, 4,
                                               rng=np.random.RandomState(0))
    assert batch.shape == (1, 4, 4, 4, 3)
