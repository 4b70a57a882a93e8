"""BN folding for serving: folded eval state is numerically equivalent."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloud_segmentation_attention_tpu import models
from pointcloud_segmentation_attention_tpu.train import create_state
from pointcloud_segmentation_attention_tpu.train.bn_fold import (
    fold_batchnorm_for_inference,
)
from pointcloud_segmentation_attention_tpu.train.steps import (
    seg_predict_step, seg_train_step,
)

TINY = dict(sa_npoints=(16, 8, 4, 2), sa_radii=(0.2, 0.4, 0.8, 1.2),
            sa_nsample=4, sa_mlps=((8, 8),) * 4,
            fp_mlps=((8,), (8,), (8,), (8, 8)))


def _trained_state(npoints=128, features=True, model_name="sem_seg_features"):
    rng = np.random.RandomState(0)
    model = models.get_model(model_name, num_classes=21, **TINY)
    pts = jnp.asarray(rng.rand(2, npoints, 3).astype(np.float32) * 2)
    feats = (jnp.asarray(rng.rand(2, npoints, 6).astype(np.float32))
             if features else None)
    state = create_state(model, optax.adam(1e-3), jax.random.PRNGKey(0),
                         pts[:1], feats[:1] if features else None,
                         train=False)
    batch = {
        "points": pts,
        "labels": jnp.asarray(rng.randint(0, 21, (2, npoints))),
        "weights": jnp.ones((2, npoints), jnp.float32),
    }
    if features:
        batch["features"] = feats
    # A couple of real train steps so the BN running stats are non-trivial
    # (folding identity stats would prove nothing).
    step = jax.jit(seg_train_step)
    for _ in range(3):
        state, _ = step(state, batch, jax.random.PRNGKey(1))
    return state, pts, feats


def test_folded_state_matches_eval_logits():
    state, pts, feats = _trained_state()
    folded, n = fold_batchnorm_for_inference(state)
    assert n >= 10  # every SharedMLP conv in the hierarchy folded
    want = np.asarray(seg_predict_step(state, pts, feats))
    got = np.asarray(seg_predict_step(folded, pts, feats))
    np.testing.assert_allclose(got, want, atol=5e-4, rtol=1e-3)
    # The decision surface is unchanged on effectively every point.
    agree = (want.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.999, agree


def test_folded_state_serves_through_resident_path():
    from pointcloud_segmentation_attention_tpu.eval.resident_serving import (
        ResidentSceneServer,
    )

    state, _, _ = _trained_state()
    folded, _ = fold_batchnorm_for_inference(state)
    rng = np.random.RandomState(3)
    scene = {
        "points": (rng.rand(2000, 3) * [5.0, 4.0, 2.5]).astype(np.float32),
        "colors": rng.randint(0, 256, (2000, 3)).astype(np.uint8),
        "normals": rng.rand(2000, 3).astype(np.float32),
    }
    base = ResidentSceneServer(state, 128, batch_size=4, layout="f32",
                               pad_multiple=2048).predict_scene(scene)
    fold = ResidentSceneServer(folded, 128, batch_size=4, layout="f32",
                               pad_multiple=2048).predict_scene(scene)
    assert (base == fold).mean() > 0.999


def test_fold_requires_bn_pairs():
    import pytest

    state, _, _ = _trained_state()
    folded, _ = fold_batchnorm_for_inference(state)
    # Folding twice still finds the (now-identity) bn nodes — it must not
    # change anything further.
    folded2, _ = fold_batchnorm_for_inference(folded)
    a = jax.tree_util.tree_leaves(folded.params)
    b = jax.tree_util.tree_leaves(folded2.params)
    for x, y in zip(a, b):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
