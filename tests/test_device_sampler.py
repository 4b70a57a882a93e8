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


def test_unlabeled_scene_falls_back_to_whole_scene():
    rng = np.random.RandomState(1)
    scenes = ResidentScenes([_make_scene(2000, rng, labeled=False)])
    batch = sample_chunk_batch(
        scenes, jnp.asarray(np.zeros(2, np.int32)), jax.random.PRNGKey(3),
        npoints=128, with_box=True)
    assert not np.asarray(batch["chunk_ok"]).any()  # no valid box exists
    # Fallback samples the whole scene; label-0 weights are zero anyway.
    assert np.asarray(batch["weights"]).max() == 0.0
    spread = np.asarray(batch["points"]).reshape(-1, 3).max(0)
    assert spread[0] > CHUNK_SIZE + 2 * CONTEXT_MARGIN  # wider than any box


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
