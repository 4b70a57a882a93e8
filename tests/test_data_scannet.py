"""Tests for the ScanNet data pipeline: label map, chunkers, precompute, batching."""
import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu.data import augment, pipeline
from pointcloud_segmentation_attention_tpu.data import scannet as sc


def test_label_map_roundtrip():
    nyu = np.array([0, 1, 2, 12, 14, 16, 24, 28, 33, 34, 36, 39, 40, 13, 15])
    mapped = sc.map_labels(nyu)
    assert mapped.max() <= 20 and mapped.min() >= 0
    # Unmapped ids -> 0
    assert mapped[12] == 0 and mapped[13] == 0 and mapped[14] == 0
    # Valid ids round-trip through the inverse map.
    valid = np.array(sc.VALID_CLASS_IDS_NYU40)
    assert (sc.map_to_nyu40(sc.map_labels(valid)) == valid).all()
    # Ids > 40 clamp to 40 -> 0
    assert sc.map_labels(np.array([99]))[0] == 0


def test_class_weights_match_reference():
    w = sc.compute_class_weights(sc.REFERENCE_LABEL_COUNTS)
    assert w[0] == 0.0
    assert w[1] == pytest.approx(2.743064592944318)
    assert w[20] == pytest.approx(4.870172044153657)


def test_synthetic_scene_format():
    scene = sc.make_synthetic_scene(n_points=5000, seed=1)
    assert scene["points"].shape == (5000, 3)
    assert scene["labels"].shape == (5000,)
    assert scene["labels"].max() <= 20
    assert scene["colors"].dtype == np.int32


def test_sample_random_chunk_shapes_and_weights():
    scene = sc.make_synthetic_scene(n_points=30000, seed=2)
    rng = np.random.RandomState(0)
    pts, lab, col, nrm, w = sc.sample_random_chunk(
        scene["points"], scene["labels"], scene["colors"], scene["normals"],
        npoints=1024, rng=rng,
    )
    assert pts.shape == (1024, 3) and lab.shape == (1024,)
    assert w.shape == (1024,)
    # weight 0 exactly for unannotated or masked points
    assert (w[lab == 0] == 0).all()
    nonzero = w[(lab > 0) & (w > 0)]
    np.testing.assert_allclose(
        nonzero, sc.TRAIN_LABEL_WEIGHTS[lab[(lab > 0) & (w > 0)]], rtol=1e-6
    )
    # chunk is spatially bounded: xy extent <= 1.5 + 2*0.2 + eps
    assert pts[:, 0].max() - pts[:, 0].min() <= 1.9 + 1e-5
    assert pts[:, 1].max() - pts[:, 1].min() <= 1.9 + 1e-5


def test_full_scene_chunks_cover_every_point():
    scene = sc.make_synthetic_scene(n_points=12000, seed=3)
    chunks = sc.full_scene_chunks(
        scene["points"], [scene["labels"], scene["colors"], scene["normals"]],
        get_sample_weights=True, npoints=512, rng=np.random.RandomState(0),
    )
    n = len(scene["points"])
    covered = np.zeros(n, bool)
    flat_idx = chunks.orig_idx.reshape(-1)
    flat_mask = chunks.masks.reshape(-1)
    covered[flat_idx[flat_mask]] = True
    assert covered.all(), f"{(~covered).sum()} points not covered"
    # masks exclude fill points; labels feature aligned with points
    assert chunks.points.shape[1:] == (512, 3)
    assert chunks.features[0].shape == chunks.masks.shape


def test_map_back_inverse_shuffle():
    scene = sc.make_synthetic_scene(n_points=8000, seed=4)
    chunks = sc.full_scene_chunks(
        scene["points"], [scene["labels"]], get_sample_weights=True,
        npoints=512, rng=np.random.RandomState(1),
    )
    # Scatter the chunked *labels* back: must reproduce original labels.
    restored = sc.map_back(
        chunks.features[0], chunks.orig_idx, chunks.masks, 8000, fill_value=-1
    )
    assert (restored == scene["labels"]).all()


def test_grid_chunks_for_eval():
    scene = sc.make_synthetic_scene(n_points=15000, seed=5)
    labels = scene["labels"]
    out = sc.grid_chunks_for_eval(
        scene["points"], labels, scene["colors"], scene["normals"], npoints=512
    )
    x = len(out["labels"])
    assert x >= 1
    assert out["points"].shape == (x, 512, 3)
    assert out["weights"].shape == (x, 512)
    # class-0 points always weight 0
    assert (out["weights"][out["labels"] == 0] == 0).all()


def test_precompute_and_replay(tmp_path):
    data_root = str(tmp_path / "scannet")
    splits = sc.write_synthetic_dataset(data_root, n_train=2, n_val=1, n_test=0,
                                        n_points=6000)
    out_dir = str(tmp_path / "chunks")
    n = sc.precompute.precompute_train_chunks(
        data_root, splits["train"], out_dir, epochs=2, npoints=256
    )
    assert n == 4
    # Refuses to clobber
    with pytest.raises(FileExistsError):
        sc.precompute.precompute_train_chunks(
            data_root, splits["train"], out_dir, epochs=1, npoints=256
        )
    # Resume with start_epoch works
    n2 = sc.precompute.precompute_train_chunks(
        data_root, splits["train"], out_dir, epochs=1, start_epoch=2, npoints=256
    )
    assert n2 == 2
    it = sc.precompute.replay_train_chunks(out_dir, 3, splits["train"])
    seen = [next(it) for _ in range(7)]
    assert seen[0]["points"].shape == (256, 3)

    total_val = sc.precompute.precompute_val_chunks(
        data_root, splits["val"], out_dir, npoints=256
    )
    val_chunks = list(sc.precompute.replay_val_chunks(out_dir, splits["val"]))
    assert len(val_chunks) == total_val


def test_eval_scene_stream_and_stitch(tmp_path):
    data_root = str(tmp_path / "scannet")
    splits = sc.write_synthetic_dataset(data_root, n_train=1, n_val=1, n_test=0,
                                        n_points=6000)
    stream = sc.precompute.eval_scene_stream(data_root, splits["val"], npoints=256)
    scene = next(stream)
    assert scene["points"].ndim == 3
    restored = sc.map_back(
        scene["labels"], scene["orig_idx"], scene["masks"], scene["num_vertices"],
        fill_value=-1,
    )
    assert (restored == scene["vertex_labels"]).all()


def test_make_batch_feature_assembly():
    chunk = {
        "points": np.zeros((64, 3), np.float32),
        "labels": np.ones((64,), np.int32),
        "colors": np.full((64, 3), 255, np.int32),
        "normals": np.ones((64, 3), np.float32) * 0.5,
        "weights": np.ones((64,), np.float32),
    }
    batch = pipeline.make_batch([chunk, chunk], use_colors=True, use_normals=True)
    assert batch["features"].shape == (2, 64, 6)
    np.testing.assert_allclose(batch["features"][..., :3], 1.0)
    np.testing.assert_allclose(batch["features"][..., 3:], 0.5)
    # class-1 weight applied
    np.testing.assert_allclose(batch["weights"], sc.TRAIN_LABEL_WEIGHTS[1], rtol=1e-6)
    none_batch = pipeline.make_batch([chunk], use_colors=False, use_normals=False)
    assert "features" not in none_batch


def test_batched_and_prefetch():
    chunks = [
        {
            "points": np.zeros((8, 3), np.float32),
            "labels": np.zeros((8,), np.int32),
            "colors": np.zeros((8, 3), np.int32),
            "normals": np.zeros((8, 3), np.float32),
            "weights": np.zeros((8,), np.float32),
        }
        for _ in range(7)
    ]
    batches = list(pipeline.prefetch(pipeline.batched(iter(chunks), 2, False, False)))
    assert len(batches) == 3  # drop remainder
    assert batches[0]["points"].shape == (2, 8, 3)


def test_prefetcher_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    it = pipeline.prefetch(bad_gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        next(it)
        next(it)


def test_augmentations_preserve_shape_and_norms():
    rng = np.random.RandomState(0)
    batch = rng.randn(2, 64, 3).astype(np.float32)
    for fn in (augment.rotate_point_cloud, augment.rotate_point_cloud_z,
               augment.jitter_point_cloud, augment.shift_point_cloud,
               augment.random_scale_point_cloud, augment.random_point_dropout):
        out = fn(batch, rng=np.random.RandomState(1))
        assert out.shape == batch.shape
    # Rotations preserve distances to origin.
    rot = augment.rotate_point_cloud_z(batch, rng=np.random.RandomState(2))
    np.testing.assert_allclose(
        np.linalg.norm(rot, axis=-1), np.linalg.norm(batch, axis=-1), rtol=1e-4
    )
    # With-normal rotation keeps normals unit-length.
    bn = np.concatenate([batch, batch / np.linalg.norm(batch, axis=-1, keepdims=True)], -1)
    out = augment.rotate_point_cloud_with_normal(bn, rng=np.random.RandomState(3))
    np.testing.assert_allclose(np.linalg.norm(out[..., 3:], axis=-1), 1.0, rtol=1e-4)


def test_random_z_rotation_rotates_normals_consistently():
    rng = np.random.RandomState(0)
    pts = rng.randn(100, 3).astype(np.float32)
    nrm = rng.randn(100, 3).astype(np.float32)
    r_pts, r_nrm = sc.random_z_rotation(pts, nrm, np.random.RandomState(5))
    # Dot products between point vectors and normals are rotation-invariant.
    np.testing.assert_allclose(
        np.sum(r_pts * r_nrm, -1), np.sum(pts * nrm, -1), atol=1e-3
    )


def test_official_splits_vendored():
    """The official ScanNet v2 split lists load with no arguments
    (1201/312/100 scenes, ref attention_points/scannet_dataset/splits/)."""
    from pointcloud_segmentation_attention_tpu.data import scannet as sc

    train = sc.read_split()
    val = sc.read_split(None, "val")
    test = sc.read_split(None, "test")
    assert len(train) == 1201 and len(val) == 312 and len(test) == 100
    assert all(n.startswith("scene") for n in train[:5] + val[:5] + test[:5])
    assert not (set(train) & set(val))
