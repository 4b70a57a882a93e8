"""On-device chunk sampler: structural parity with the host sampler's
contract (box geometry, validity, weights rule, fallback) + train-step
integration."""
import jax
import jax.numpy as jnp
import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet.chunks import (
    CHUNK_SIZE, CONTEXT_MARGIN, TRAIN_LABEL_WEIGHTS,
)
from pointcloud_segmentation_attention_tpu.train.device_sampler import (
    ResidentScenes, make_sampling_train_step, sample_chunk_batch,
)


def _make_scene(n, rng, extent=(6.0, 5.0, 2.5), labeled=True):
    pts = (rng.rand(n, 3) * extent).astype(np.float32)
    labels = rng.randint(1, 21, n).astype(np.int32) if labeled \
        else np.zeros(n, np.int32)
    return {
        "points": pts, "labels": labels,
        "colors": rng.randint(0, 256, (n, 3)).astype(np.uint8),
        "normals": rng.rand(n, 3).astype(np.float32),
    }


def test_sampled_chunks_respect_box_and_weights():
    rng = np.random.RandomState(0)
    # Dense enough to clear the 2 % voxel-occupancy validity bar (~1200
    # occupied voxels of 31x31x62 per chunk).
    scenes = ResidentScenes([_make_scene(40000, rng),
                             _make_scene(30000, rng)])
    ids = jnp.asarray(np.array([0, 1, 0, 1], np.int32))
    batch = sample_chunk_batch(scenes, ids, jax.random.PRNGKey(2),
                               npoints=256, with_box=True)
    pts = np.asarray(batch["points"])
    labels = np.asarray(batch["labels"])
    weights = np.asarray(batch["weights"])
    lo = np.asarray(batch["chunk_lo"])
    hi = np.asarray(batch["chunk_hi"])
    ok = np.asarray(batch["chunk_ok"])
    assert pts.shape == (4, 256, 3)
    assert ok.all()  # dense labeled scenes: a valid box exists
    for b in range(4):
        # Inner box is exactly CHUNK_SIZE wide; all sampled points lie in
        # the context-margin box.
        np.testing.assert_allclose(hi[b] - lo[b], CHUNK_SIZE, rtol=1e-5)
        assert (pts[b, :, :2] >= lo[b] - CONTEXT_MARGIN - 1e-5).all()
        assert (pts[b, :, :2] <= hi[b] + CONTEXT_MARGIN + 1e-5).all()
        # weights = class_weight[label] * inner(point): recompute.
        inner = ((pts[b, :, :2] >= lo[b]) & (pts[b, :, :2] <= hi[b])).all(1)
        want = TRAIN_LABEL_WEIGHTS[labels[b]] * inner
        np.testing.assert_allclose(weights[b], want, rtol=1e-5, atol=1e-6)
    # Features: colors scaled to [0,1] + raw normals.
    feats = np.asarray(batch["features"])
    assert feats.shape == (4, 256, 6)
    assert feats[..., :3].max() <= 1.0 and feats[..., :3].min() >= 0.0


def test_unlabeled_scene_keeps_last_tried_box():
    """Retry exhaustion keeps the LAST tried candidate-bearing box, like the
    host sampler / ref data_transformation.py:141-145 ('if fails, get the
    last') — NOT the whole scene (advisor r3)."""
    rng = np.random.RandomState(1)
    scenes = ResidentScenes([_make_scene(2000, rng, labeled=False)])
    batch = sample_chunk_batch(
        scenes, jnp.asarray(np.zeros(2, np.int32)), jax.random.PRNGKey(3),
        npoints=128, with_box=True)
    assert not np.asarray(batch["chunk_ok"]).any()  # no valid box exists
    # All label-0: weights are zero either way.
    assert np.asarray(batch["weights"]).max() == 0.0
    pts = np.asarray(batch["points"])
    lo = np.asarray(batch["chunk_lo"])
    hi = np.asarray(batch["chunk_hi"])
    for b in range(2):
        # The kept box is a real 1.5 m box and every sampled point respects
        # its context margin — chunk-sized, not scene-sized.
        np.testing.assert_allclose(hi[b] - lo[b], CHUNK_SIZE, rtol=1e-5)
        assert (pts[b, :, :2] >= lo[b] - CONTEXT_MARGIN - 1e-5).all()
        assert (pts[b, :, :2] <= hi[b] + CONTEXT_MARGIN + 1e-5).all()


def test_windows_never_bleed_across_scenes():
    """Scene windows stay aligned even for the last scene, whose
    offset + max_len overruns the concatenated buffer: without tail padding
    lax.dynamic_slice would clamp the start and pull the previous scene's
    points into the sample (regression test for the r4 fix)."""
    rng = np.random.RandomState(7)
    big = _make_scene(20000, rng)                    # xy in [0, 6] x [0, 5]
    small = _make_scene(3000, rng, extent=(4.0, 4.0, 2.5))
    small["points"][:, :2] += 100.0                  # disjoint xy range
    scenes = ResidentScenes([big, small])
    batch = sample_chunk_batch(
        scenes, jnp.asarray(np.array([1, 1, 1, 1], np.int32)),
        jax.random.PRNGKey(11), npoints=256)
    pts = np.asarray(batch["points"])
    # Every sampled point of every scene-1 chunk lives in scene 1's range.
    assert (pts[..., :2] >= 99.0).all(), pts[..., :2].min()


def test_fast_occupancy_agrees_with_exact():
    """The sort-free scene-anchored occupancy check accepts/rejects (almost
    always) like the bbox-fit exact one; both paths produce contract-valid
    chunks."""
    rng = np.random.RandomState(12)
    # Mix of dense scenes (clear accepts) and near-empty ones (clear
    # rejects on the occupancy axis after label-validity passes).
    scenes = ResidentScenes([_make_scene(40000, rng),
                             _make_scene(40000, rng)])
    ids = jnp.asarray(np.arange(8, dtype=np.int32) % 2)
    key = jax.random.PRNGKey(13)
    fast = sample_chunk_batch(scenes, ids, key, npoints=128,
                              occupancy="fast", with_box=True)
    exact = sample_chunk_batch(scenes, ids, key, npoints=128,
                               occupancy="exact", with_box=True)
    # Same rng stream: on dense scenes both accept (try counts agree), so
    # the chosen boxes are identical.
    assert np.asarray(fast["chunk_ok"]).all()
    assert np.asarray(exact["chunk_ok"]).all()
    np.testing.assert_allclose(np.asarray(fast["chunk_lo"]),
                               np.asarray(exact["chunk_lo"]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fast["points"]),
                               np.asarray(exact["points"]), atol=1e-6)


def test_fast_occupancy_value_tracks_exact_value():
    """Numeric agreement of the two occupancy estimates over random boxes:
    scene-anchored fixed cells vs bbox-fit cells differ only by grid phase /
    candidate-extent fit, a small relative band at realistic density."""
    from pointcloud_segmentation_attention_tpu.train.device_sampler import (
        _occupancy_fraction_exact, _occupancy_fraction_fast, scene_voxel_sort,
    )

    rng = np.random.RandomState(3)
    pts = (rng.rand(30000, 3) * [6.0, 5.0, 2.5]).astype(np.float32)
    order, run_start, _vx = scene_voxel_sort(pts)
    pts_sorted = pts[order]
    diffs = []
    for i in range(6):
        center = pts[rng.randint(len(pts)), :2]
        lo, hi = center - 0.75, center + 0.75
        cand = ((pts_sorted[:, :2] >= lo - 0.2)
                & (pts_sorted[:, :2] <= hi + 0.2)).all(axis=1)
        f = float(_occupancy_fraction_fast(
            jnp.asarray(run_start), jnp.asarray(cand), len(pts)))
        e = float(_occupancy_fraction_exact(
            jnp.asarray(pts_sorted), jnp.asarray(cand)))
        diffs.append(abs(f - e) / max(e, 1e-9))
    # Same order of magnitude, never the ~2x that would flip clear calls.
    assert np.median(diffs) < 0.5, diffs


def test_sampler_statistics_match_host_sampler():
    """Mean labeled fraction + mean inner fraction of device-sampled chunks
    are in the same range as the host sampler's on the same scene."""
    from pointcloud_segmentation_attention_tpu.data.scannet.chunks import (
        sample_random_chunk,
    )

    rng = np.random.RandomState(4)
    scene = _make_scene(30000, rng)
    # Host draws.
    host_inner = []
    for i in range(8):
        _, lab, _, _, w = sample_random_chunk(
            scene["points"], scene["labels"], scene["colors"],
            scene["normals"], 256, np.random.RandomState(i))
        host_inner.append((w > 0).mean())
    scenes = ResidentScenes([scene])
    batch = sample_chunk_batch(
        scenes, jnp.asarray(np.zeros(8, np.int32)), jax.random.PRNGKey(5),
        npoints=256)
    dev_inner = (np.asarray(batch["weights"]) > 0).mean(axis=1)
    assert abs(np.mean(dev_inner) - np.mean(host_inner)) < 0.15, (
        np.mean(dev_inner), np.mean(host_inner))


def test_sampling_train_step_on_mesh():
    import optax

    from pointcloud_segmentation_attention_tpu import models, parallel
    from pointcloud_segmentation_attention_tpu.train import create_state

    rng = np.random.RandomState(6)
    mesh = parallel.make_mesh(2)
    scenes = ResidentScenes([_make_scene(4000, rng) for _ in range(3)],
                            mesh=mesh)
    model = models.get_model(
        "sem_seg_features", num_classes=21,
        sa_npoints=(16, 8, 4, 2), sa_radii=(0.2, 0.4, 0.8, 1.2),
        sa_nsample=4, sa_mlps=((8, 8),) * 4,
        fp_mlps=((8,), (8,), (8,), (8, 8)))
    npoints = 128
    state = create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.zeros((1, npoints, 3)), jnp.zeros((1, npoints, 6)), train=False)
    step = make_sampling_train_step(scenes, npoints, mesh=mesh)
    ids = parallel.shard_batch(
        jnp.asarray(np.array([0, 1], np.int32)), mesh)
    state, m = step(state, ids, jax.random.PRNGKey(1))
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 1
    # A second step with the same ids sees DIFFERENT chunks (fresh rng per
    # optimizer step) — the diversity the precomputed corpus lacks.
    state2, m2 = step(state, ids, jax.random.PRNGKey(1))
    assert np.isfinite(float(m2["loss"]))
    assert float(m2["loss"]) != float(m["loss"])


def test_sampling_step_augment_rotates():
    """augment=True trains on z-rotated fresh chunks (the on-device twin of
    the precompute pass's baked rotation) — runs and differs from the
    unaugmented step."""
    import optax

    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.train import create_state

    rng = np.random.RandomState(9)
    scenes = ResidentScenes([_make_scene(4000, rng)])
    model = models.get_model(
        "sem_seg_features", num_classes=21,
        sa_npoints=(16, 8, 4, 2), sa_radii=(0.2, 0.4, 0.8, 1.2),
        sa_nsample=4, sa_mlps=((8, 8),) * 4,
        fp_mlps=((8,), (8,), (8,), (8, 8)))
    npoints = 128
    state = create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.zeros((1, npoints, 3)), jnp.zeros((1, npoints, 6)), train=False)
    ids = jnp.zeros((2,), jnp.int32)
    key = jax.random.PRNGKey(1)
    plain = make_sampling_train_step(scenes, npoints, donate=False)
    aug = make_sampling_train_step(scenes, npoints, donate=False,
                                   augment=True)
    _, m0 = plain(state, ids, key)
    _, m1 = aug(state, ids, key)
    assert np.isfinite(float(m1["loss"]))
    # Same rng stream, same chunks — only the rotation differs.
    assert float(m0["loss"]) != float(m1["loss"])


def test_zero_precompute_recipe_smoke(tmp_path):
    """The zero-precompute recipe runs end to end (tiny): scenes resident,
    sampling steps, stitched eval — and never creates a precompute dir."""
    import os

    from pointcloud_segmentation_attention_tpu.recipes.zero_precompute import (
        run_zero_precompute,
    )

    out = run_zero_precompute(
        str(tmp_path), n_train_scenes=2, n_val_scenes=1, scene_points=4000,
        n_points=128, batch_size=2, epochs=2, n_devices=2)
    assert np.isfinite(out["final_loss"])
    assert np.isfinite(out["offline_mean_iou"])
    assert not os.path.exists(
        str(tmp_path / "scannet_synth" / "precomputed"))


def test_resident_scenes_budget_estimate_matches_actual():
    """estimate_bytes (the fail-fast budget check's basis) equals the real
    resident buffer bytes, and an under-budget corpus raises before build."""
    import pytest

    rng = np.random.RandomState(3)
    raw = [_make_scene(5000, rng), _make_scene(4000, rng)]
    est = ResidentScenes.estimate_bytes([5000, 4000])
    with pytest.raises(ValueError, match="budget"):
        ResidentScenes(raw, budget_mb=est / 2**20 * 0.5)
    rs = ResidentScenes(raw, budget_mb=est / 2**20 + 1)
    actual = sum(np.asarray(b).nbytes for b in (
        rs.points, rs.labels, rs.colors, rs.normals, rs.run_start, rs.vx))
    assert actual == est


def test_sampler_geometry_knob():
    """chunk_size/margin are per-ResidentScenes knobs: with margin 0 every
    sampled point lies INSIDE the (smaller) inner box."""
    rng = np.random.RandomState(4)
    scenes = ResidentScenes([_make_scene(40000, rng)],
                            chunk_size=1.0, margin=0.0)
    ids = jnp.asarray(np.array([0, 0], np.int32))
    batch = sample_chunk_batch(scenes, ids, jax.random.PRNGKey(5),
                               npoints=256, with_box=True)
    pts = np.asarray(batch["points"])
    lo = np.asarray(batch["chunk_lo"])
    hi = np.asarray(batch["chunk_hi"])
    assert np.asarray(batch["chunk_ok"]).all()
    for b in range(2):
        np.testing.assert_allclose(hi[b] - lo[b], 1.0, rtol=1e-5)
        assert (pts[b, :, :2] >= lo[b] - 1e-5).all()
        assert (pts[b, :, :2] <= hi[b] + 1e-5).all()


def test_resident_scenes_empty_list_fails_fast():
    """An empty per-host scene shard (more processes than train scenes)
    raises a causal error instead of a zero-size numpy reduction."""
    import pytest

    from pointcloud_segmentation_attention_tpu.train.device_sampler import (
        ResidentScenes,
    )

    with pytest.raises(ValueError, match="empty scene list"):
        ResidentScenes([])
