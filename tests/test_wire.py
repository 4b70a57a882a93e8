"""Packed single-buffer wire format: round-trip + step equivalence."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_segmentation_attention_tpu.data import pipeline
from pointcloud_segmentation_attention_tpu.data.wire import (
    WireSpec, pack_chunks, unpack_batch,
)

_TINY_HIERARCHY = {"sa_npoints": [16, 8, 4, 2], "sa_radii": [0.2, 0.4, 0.8, 1.2],
                         "sa_nsample": 4, "sa_mlps": [[8, 8], [8, 8], [8, 8], [8, 8]],
                         "fp_mlps": [[8], [8], [8], [8, 8]]}


def _chunks(b=3, n=64, seed=0):
    rng = np.random.RandomState(seed)
    extent = np.array([1.9, 1.9, 2.6], np.float32)
    return [
        {
            "points": (rng.rand(n, 3) * extent).astype(np.float32),
            "labels": rng.randint(0, 21, n).astype(np.int32),
            "colors": rng.randint(0, 256, (n, 3)).astype(np.int32),
            "normals": (rng.rand(n, 3) * 2 - 1).astype(np.float32),
            "weights": (rng.rand(n) > 0.3).astype(np.float32),
        }
        for _ in range(b)
    ]


def _unpack(packed, spec):
    return jax.jit(lambda p: unpack_batch(p, spec))(jnp.asarray(packed))


def test_f32_layout_roundtrip_exact():
    chunks = _chunks()
    spec = WireSpec(n=64, layout="f32", use_colors=True, use_normals=True)
    packed = pack_chunks(chunks, spec)
    assert packed.shape == (3, spec.row_nbytes)
    assert spec.row_nbytes == 64 * 23

    got = _unpack(packed, spec)
    ref = pipeline.make_batch(chunks, use_colors=True, use_normals=True)
    np.testing.assert_array_equal(np.asarray(got["points"]), ref["points"])
    np.testing.assert_array_equal(np.asarray(got["labels"]), ref["labels"])
    np.testing.assert_allclose(np.asarray(got["weights"]), ref["weights"],
                               rtol=1e-6)
    # colors exact; normals go through f16 (same as the 'compact' wire)
    np.testing.assert_allclose(
        np.asarray(got["features"][..., :3]), ref["features"][..., :3],
        atol=1e-7)
    np.testing.assert_allclose(
        np.asarray(got["features"][..., 3:]), ref["features"][..., 3:],
        atol=1e-3)


def test_q16_layout_quantization_bounds():
    chunks = _chunks(seed=1)
    spec = WireSpec(n=64, layout="q16", use_colors=True, use_normals=True)
    packed = pack_chunks(chunks, spec)
    assert spec.row_nbytes == 32 + 64 * 14

    got = _unpack(packed, spec)
    ref = pipeline.make_batch(chunks, use_colors=True, use_normals=True)
    # Points: within per-sample extent / 65535 (plus fp round-off).
    extent = ref["points"].max(1) - ref["points"].min(1)  # (B, 3)
    tol = extent[:, None, :] / 65535.0 * 0.51 + 1e-6
    assert (np.abs(np.asarray(got["points"]) - ref["points"]) <= tol).all()
    # Labels/weights/colors exact.
    np.testing.assert_array_equal(np.asarray(got["labels"]), ref["labels"])
    np.testing.assert_allclose(np.asarray(got["weights"]), ref["weights"],
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got["features"][..., :3]), ref["features"][..., :3],
        atol=1e-7)
    # Normals: i8 grid, error <= 1/254 + rounding.
    np.testing.assert_allclose(
        np.asarray(got["features"][..., 3:]), ref["features"][..., 3:],
        atol=1.0 / 127.0)


def test_degenerate_flat_chunk_q16():
    # A chunk with zero extent on one axis must not divide by zero.
    chunks = _chunks(b=1, seed=2)
    chunks[0]["points"][:, 2] = 1.25
    spec = WireSpec(n=64, layout="q16", use_colors=True, use_normals=True)
    got = _unpack(pack_chunks(chunks, spec), spec)
    np.testing.assert_allclose(np.asarray(got["points"][..., 2]), 1.25,
                               atol=1e-6)


def test_feature_flags_shrink_rows():
    spec_nc = WireSpec(n=64, layout="f32", use_colors=False, use_normals=True)
    spec_nn = WireSpec(n=64, layout="f32", use_colors=True, use_normals=False)
    spec_none = WireSpec(n=64, layout="f32", use_colors=False,
                         use_normals=False)
    assert spec_nc.row_nbytes == 64 * 20
    assert spec_nn.row_nbytes == 64 * 17
    assert spec_none.row_nbytes == 64 * 14
    chunks = _chunks(seed=3)
    got = _unpack(pack_chunks(chunks, spec_nn), spec_nn)
    assert got["features"].shape == (3, 64, 3)
    got = _unpack(pack_chunks(chunks, spec_none), spec_none)
    assert "features" not in got


def test_pipeline_batched_packed_and_step():
    """pipeline.batched(wire='packed') feeds seg_train_step with identical
    numerics to the f32 dict path."""
    import optax

    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.data.wire import WireSpec
    from pointcloud_segmentation_attention_tpu.train import (
        create_state, seg_train_step,
    )

    chunks = _chunks(b=4, n=128, seed=4)
    for c in chunks:
        c["normals"] = np.asarray(
            c["normals"], np.float16).astype(np.float32)  # make f16 lossless
    spec = WireSpec(n=128, layout="f32", use_colors=True, use_normals=True)
    (packed_batch,) = list(pipeline.batched(
        iter(chunks), 4, use_colors=True, use_normals=True, wire="packed"))
    (ref_batch,) = list(pipeline.batched(
        iter(chunks), 4, use_colors=True, use_normals=True, wire="f32"))

    model = models.get_model(
        "sem_seg_features", num_classes=21,
        sa_npoints=(32, 16, 8, 4), sa_radii=(0.2, 0.4, 0.8, 1.2))
    state = create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.asarray(ref_batch["points"][:1]),
        jnp.asarray(ref_batch["features"][:1]), train=False)

    key = jax.random.PRNGKey(1)
    step_packed = jax.jit(
        lambda s, b, r: seg_train_step(s, b, r, wire_spec=spec))
    step_plain = jax.jit(seg_train_step)
    _, m_packed = step_packed(
        state, {"packed": jnp.asarray(packed_batch["packed"])}, key)
    _, m_plain = step_plain(
        state, jax.tree_util.tree_map(jnp.asarray, ref_batch), key)
    np.testing.assert_allclose(
        float(m_packed["loss"]), float(m_plain["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(m_packed["confusion"]), np.asarray(m_plain["confusion"]))


def test_trainer_packed_wire_end_to_end(tmp_path):
    """wire_format='packed_q16' drives the full trainer: pack store built
    from the npz chunks, memmap replay, on-device decode, val pass."""
    import os

    from pointcloud_segmentation_attention_tpu.data import scannet as sc
    from pointcloud_segmentation_attention_tpu.train import trainer
    from pointcloud_segmentation_attention_tpu.utils.config import TrainConfig

    data_root = str(tmp_path / "scannet")
    splits = sc.write_synthetic_dataset(data_root, n_train=2, n_val=1,
                                        n_test=0, n_points=4000)
    pre = str(tmp_path / "chunks")
    sc.precompute.precompute_train_chunks(data_root, splits["train"], pre,
                                          epochs=1, npoints=128)
    sc.precompute.precompute_val_chunks(data_root, splits["val"], pre,
                                        npoints=128)
    cfg = TrainConfig(
        data_root=data_root, model="sem_seg_features", use_colors=True,
        use_normals=True, precompute_dir=pre, wire_format="packed_q16",
        log_dir=str(tmp_path / "logs"), batch_size=2, n_points=128,
        epochs=1, n_epochs_to_val=1, n_devices=2,
        model_overrides=_TINY_HIERARCHY,
    )
    s = trainer.train(cfg, max_steps=2)
    assert s["final_step"] == 2
    # The pack store was materialized next to the npz chunks.
    pack_dir = os.path.join(pre, "pack_q16_c1n1_p128")
    assert os.path.exists(os.path.join(pack_dir, "meta.json"))
    assert os.path.exists(os.path.join(pack_dir, "epoch-0000.pack"))


def test_device_replay_matches_packed_step():
    """Resident-corpus step == packed-wire step on the same rows."""
    import optax

    from pointcloud_segmentation_attention_tpu import models, parallel
    from pointcloud_segmentation_attention_tpu.data.wire import pack_chunks
    from pointcloud_segmentation_attention_tpu.train import (
        create_state, seg_train_step,
    )
    from pointcloud_segmentation_attention_tpu.train.device_replay import (
        DeviceReplay, make_resident_train_step,
    )

    chunks = _chunks(b=8, n=128, seed=7)
    spec = WireSpec(n=128, layout="q16", use_colors=True, use_normals=True)
    corpus = pack_chunks(chunks, spec)

    model = models.get_model(
        "sem_seg_features", num_classes=21,
        sa_npoints=(32, 16, 8, 4), sa_radii=(0.2, 0.4, 0.8, 1.2))
    state = create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.zeros((1, 128, 3)), jnp.zeros((1, 128, 6)), train=False)

    mesh = parallel.make_mesh(2)
    replay = DeviceReplay(corpus, spec, mesh=mesh)
    step = make_resident_train_step(spec, mesh=mesh)
    it = replay.index_stream(batch_size=4, seed=3)
    idx = next(it)
    key = jax.random.PRNGKey(1)

    packed_step = jax.jit(
        lambda s, b, r: seg_train_step(s, b, r, wire_spec=spec))
    _, m_packed = packed_step(
        state, {"packed": jnp.asarray(corpus[idx])}, key)
    # (resident step last: it donates the state)
    _, m_res = step(state, replay.device_corpus,
                    parallel.shard_batch(idx, mesh), key)
    np.testing.assert_allclose(float(m_res["loss"]), float(m_packed["loss"]),
                               rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(m_res["confusion"]),
                                  np.asarray(m_packed["confusion"]))


def test_device_replay_index_stream_covers_epochs():
    import pytest

    from pointcloud_segmentation_attention_tpu.train.device_replay import (
        DeviceReplay,
    )

    corpus = np.zeros((10, WireSpec(n=4, use_colors=False,
                                    use_normals=False).row_nbytes), np.uint8)
    spec = WireSpec(n=4, use_colors=False, use_normals=False)
    replay = DeviceReplay(corpus, spec, epoch_len=5)
    it = replay.index_stream(batch_size=3, seed=0)
    seen = np.concatenate([next(it) for _ in range(6)])  # 18 of 20 rows
    # First epoch (rows 0-4) appears before the second pass begins; all
    # indices are in range and each epoch's rows appear at most twice.
    assert seen.min() >= 0 and seen.max() < 10
    counts = np.bincount(seen, minlength=10)
    assert counts.max() <= 2

    # Non-divisible epoch_len: trailing rows form a shorter final epoch —
    # every row is covered within one pass (review finding r3).
    replay7 = DeviceReplay(corpus, spec, epoch_len=7)
    it7 = replay7.index_stream(batch_size=2, seed=1)
    seen7 = np.concatenate([next(it7) for _ in range(5)])  # one full pass
    assert sorted(seen7) == list(range(10))
    # Out-of-range epoch_len is rejected (the gather would silently clamp).
    with pytest.raises(ValueError, match="epoch_len"):
        DeviceReplay(corpus, spec, epoch_len=16)


def test_trainer_device_replay_end_to_end(tmp_path):
    """device_replay=True: corpus resident, per-step H2D = index array."""
    from pointcloud_segmentation_attention_tpu.data import scannet as sc
    from pointcloud_segmentation_attention_tpu.train import trainer
    from pointcloud_segmentation_attention_tpu.utils.config import TrainConfig

    data_root = str(tmp_path / "scannet")
    splits = sc.write_synthetic_dataset(data_root, n_train=2, n_val=1,
                                        n_test=0, n_points=4000)
    pre = str(tmp_path / "chunks")
    sc.precompute.precompute_train_chunks(data_root, splits["train"], pre,
                                          epochs=2, npoints=128)
    sc.precompute.precompute_val_chunks(data_root, splits["val"], pre,
                                        npoints=128)
    cfg = TrainConfig(
        data_root=data_root, model="sem_seg_features", use_colors=True,
        use_normals=True, precompute_dir=pre, wire_format="packed_q16",
        device_replay=True, log_dir=str(tmp_path / "logs"), batch_size=2,
        n_points=128, epochs=1, n_epochs_to_val=1, n_devices=2,
        model_overrides=_TINY_HIERARCHY,
    )
    s = trainer.train(cfg, max_steps=3)
    assert s["final_step"] == 3


def test_split_wire_roundtrip():
    """'packed_q16x4' splits into 4 byte-column slices; the step re-concats
    and matches the unsplit packed batch numerically."""
    chunks = _chunks(b=3, n=64, seed=9)
    spec = WireSpec(n=64, layout="q16", use_colors=True, use_normals=True)
    (whole,) = list(pipeline.batched(
        iter(chunks), 3, use_colors=True, use_normals=True, wire="packed_q16"))
    (split,) = list(pipeline.batched(
        iter(chunks), 3, use_colors=True, use_normals=True,
        wire="packed_q16x4"))
    assert sorted(split) == ["packed0", "packed1", "packed2", "packed3"]
    re_joined = np.concatenate([split[f"packed{i}"] for i in range(4)], axis=1)
    np.testing.assert_array_equal(re_joined, whole["packed"])

    from pointcloud_segmentation_attention_tpu.train.steps import (
        expand_wire_batch,
    )

    a = jax.jit(lambda b: expand_wire_batch(b, spec))(
        {k: jnp.asarray(v) for k, v in whole.items()})
    b = jax.jit(lambda b: expand_wire_batch(b, spec))(
        {k: jnp.asarray(v) for k, v in split.items()})
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


def test_packed_predict_matches_plain():
    """The packed-wire serving path (seg_predict_step_packed +
    predict_scene_chunks(wire_spec=...)) agrees with the f32 path."""
    import optax

    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.eval import full_scene
    from pointcloud_segmentation_attention_tpu.train import create_state

    rng = np.random.RandomState(11)
    n_chunks, n = 5, 128
    scene = {
        "points": (rng.rand(n_chunks, n, 3) * 2).astype(np.float32),
        "colors": rng.randint(0, 256, (n_chunks, n, 3)).astype(np.int32),
        "normals": (rng.rand(n_chunks, n, 3) * 2 - 1).astype(np.float32),
        "masks": np.ones((n_chunks, n), bool),
        "orig_idx": np.arange(n_chunks * n).reshape(n_chunks, n),
        "num_vertices": n_chunks * n,
    }
    model = models.get_model(
        "sem_seg_features", num_classes=21,
        sa_npoints=(32, 16, 8, 4), sa_radii=(0.3, 0.6, 1.0, 1.5))
    state = create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.zeros((1, n, 3)), jnp.zeros((1, n, 6)), train=False)

    plain_fn, _ = full_scene.make_sharded_predict_fn(state, n_devices=1)
    plain = full_scene.predict_scene_chunks(
        plain_fn, scene, True, True, batch_size=2)

    spec = WireSpec(n=n, layout="q16", use_colors=True, use_normals=True)
    packed_fn, _ = full_scene.make_sharded_predict_fn(
        state, n_devices=1, wire_spec=spec)
    packed = full_scene.predict_scene_chunks(
        packed_fn, scene, True, True, batch_size=2, wire_spec=spec)
    # q16 quantizes points to 0.05 mm and normals to i8 — argmax labels can
    # flip only at near-ties; demand >= 99 % agreement.
    agree = (plain == packed).mean()
    assert agree >= 0.99, agree


def test_device_argmax_labels_match_logits_path():
    import optax

    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.eval import full_scene
    from pointcloud_segmentation_attention_tpu.train import create_state

    rng = np.random.RandomState(12)
    n_chunks, n = 3, 128
    scene = {
        "points": (rng.rand(n_chunks, n, 3) * 2).astype(np.float32),
        "colors": rng.randint(0, 256, (n_chunks, n, 3)).astype(np.int32),
        "normals": (rng.rand(n_chunks, n, 3) * 2 - 1).astype(np.float32),
        "masks": np.ones((n_chunks, n), bool),
        "orig_idx": np.arange(n_chunks * n).reshape(n_chunks, n),
        "num_vertices": n_chunks * n,
    }
    model = models.get_model(
        "sem_seg_features", num_classes=21,
        sa_npoints=(32, 16, 8, 4), sa_radii=(0.3, 0.6, 1.0, 1.5))
    state = create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.zeros((1, n, 3)), jnp.zeros((1, n, 6)), train=False)

    logits_fn, _ = full_scene.make_sharded_predict_fn(state, n_devices=1)
    labels_fn, _ = full_scene.make_sharded_predict_fn(
        state, n_devices=1, return_labels=True)
    a = full_scene.predict_scene_chunks(logits_fn, scene, True, True, 2)
    b = full_scene.predict_scene_chunks(labels_fn, scene, True, True, 2)
    np.testing.assert_array_equal(a, b)


def test_packstore_rejects_mismatched_meta(tmp_path):
    """A pack store written for different scenes/spec must raise, not be
    silently reused (review finding r3)."""
    import pytest

    from pointcloud_segmentation_attention_tpu.data import scannet as sc
    from pointcloud_segmentation_attention_tpu.data.scannet import packstore

    data_root = str(tmp_path / "scannet")
    splits = sc.write_synthetic_dataset(data_root, n_train=3, n_val=0,
                                        n_test=0, n_points=2000)
    pre = str(tmp_path / "chunks")
    sc.precompute.precompute_train_chunks(data_root, splits["train"], pre,
                                          epochs=1, npoints=64)
    spec = WireSpec(n=64, layout="q16", use_colors=True, use_normals=True)
    pack_dir = str(tmp_path / "pack")
    packstore.write_pack_from_npz(pre, pack_dir, 1, splits["train"], spec)
    # Same call again: idempotent.
    assert packstore.write_pack_from_npz(
        pre, pack_dir, 1, splits["train"], spec) == 0
    # Different scene list -> refuse.
    with pytest.raises(ValueError, match="different"):
        packstore.write_pack_from_npz(
            pre, pack_dir, 1, splits["train"][:2], spec)
    # Different layout -> refuse.
    spec_f32 = WireSpec(n=64, layout="f32", use_colors=True,
                        use_normals=True)
    with pytest.raises(ValueError, match="different"):
        packstore.write_pack_from_npz(
            pre, pack_dir, 1, splits["train"], spec_f32)


def test_rotate_batch_z_matches_host_rotation():
    """On-device per-sample z-rotation == the host chunk rotation for the
    same angle (points and the normals feature columns; colors untouched)."""
    from pointcloud_segmentation_attention_tpu.train.device_replay import (
        rotate_batch_z,
    )

    rng = np.random.RandomState(5)
    b, n = 3, 64
    spec = WireSpec(n=n, layout="q16", use_colors=True, use_normals=True)
    batch = {
        "points": jnp.asarray(rng.randn(b, n, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 21, (b, n)).astype(np.int32)),
        "weights": jnp.asarray(rng.rand(b, n).astype(np.float32)),
        "features": jnp.asarray(rng.rand(b, n, 6).astype(np.float32)),
    }
    key = jax.random.PRNGKey(9)
    out = jax.jit(lambda bt: rotate_batch_z(bt, spec, key))(batch)

    # Recover the angles the jax rng produced and apply the HOST rotation.
    angles = np.asarray(jax.random.uniform(key, (b,), jnp.float32,
                                           0.0, 2.0 * np.pi))
    for bi in range(b):
        c, s = np.cos(angles[bi]), np.sin(angles[bi])
        rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
        np.testing.assert_allclose(
            np.asarray(out["points"][bi]),
            np.asarray(batch["points"][bi]) @ rot, rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(out["features"][bi, :, 3:]),
            np.asarray(batch["features"][bi, :, 3:]) @ rot,
            rtol=1e-5, atol=1e-5)
    # Colors, labels, weights pass through untouched.
    np.testing.assert_array_equal(np.asarray(out["features"][..., :3]),
                                  np.asarray(batch["features"][..., :3]))
    np.testing.assert_array_equal(np.asarray(out["labels"]),
                                  np.asarray(batch["labels"]))


def test_trainer_resident_augment_end_to_end(tmp_path):
    from pointcloud_segmentation_attention_tpu.data import scannet as sc
    from pointcloud_segmentation_attention_tpu.train import trainer
    from pointcloud_segmentation_attention_tpu.utils.config import TrainConfig

    data_root = str(tmp_path / "scannet")
    splits = sc.write_synthetic_dataset(data_root, n_train=2, n_val=1,
                                        n_test=0, n_points=4000)
    pre = str(tmp_path / "chunks")
    sc.precompute.precompute_train_chunks(data_root, splits["train"], pre,
                                          epochs=1, npoints=128)
    sc.precompute.precompute_val_chunks(data_root, splits["val"], pre,
                                        npoints=128)
    cfg = TrainConfig(
        data_root=data_root, model="sem_seg_features", use_colors=True,
        use_normals=True, precompute_dir=pre, wire_format="packed_q16",
        device_replay=True, resident_augment=True,
        log_dir=str(tmp_path / "logs"), batch_size=2, n_points=128,
        epochs=1, n_epochs_to_val=1, n_devices=2,
        model_overrides=_TINY_HIERARCHY,
    )
    s = trainer.train(cfg, max_steps=2)
    assert s["final_step"] == 2
