"""Tests for schedules, losses, metrics, and a full data-parallel train step."""
import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pointcloud_segmentation_attention_tpu import models, parallel
from pointcloud_segmentation_attention_tpu.train import (
    SCANNET_CLASS_WEIGHTS,
    create_state,
    losses,
    make_sample_weights,
    metrics,
    schedules,
    seg_eval_step,
    seg_train_step,
)

TINY = dict(
    sa_npoints=(16, 8, 4, 2),
    sa_radii=(0.1, 0.2, 0.4, 0.8),
    sa_nsample=4,
    sa_mlps=((4, 8), (8, 8), (8, 8), (8, 8)),
    fp_mlps=((8,), (8,), (8,), (8, 8)),
)


def test_scannet_lr_schedule_staircase():
    # Before the first decay boundary: base LR.
    assert float(schedules.scannet_learning_rate(0)) == pytest.approx(1e-3)
    # step*16 == 1201*80 => first decay
    boundary = 1201 * 80 // 16
    assert float(schedules.scannet_learning_rate(boundary - 1)) == pytest.approx(1e-3)
    assert float(schedules.scannet_learning_rate(boundary)) == pytest.approx(0.7e-3)
    # Floor at 1e-5.
    assert float(schedules.scannet_learning_rate(10 ** 9)) == pytest.approx(1e-5)


def test_scannet_bn_momentum():
    assert float(schedules.scannet_bn_momentum(0)) == pytest.approx(0.5)
    boundary = 1201 * 80 // 16
    assert float(schedules.scannet_bn_momentum(boundary)) == pytest.approx(0.75)
    assert float(schedules.scannet_bn_momentum(10 ** 9)) == pytest.approx(0.99)


def test_weighted_ce_matches_tf_semantics():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 5, 4).astype(np.float32))
    labels = jnp.asarray(rng.randint(0, 4, size=(2, 5)))
    weights = jnp.asarray(
        np.array([[1, 0, 2, 0, 1], [0, 0, 3, 1, 0]], np.float32)
    )
    got = float(losses.weighted_softmax_cross_entropy(logits, labels, weights))
    # torch/numpy oracle: sum(w*ce)/count(w != 0)
    import torch
    ce = torch.nn.functional.cross_entropy(
        torch.tensor(np.asarray(logits)).reshape(-1, 4),
        torch.tensor(np.asarray(labels)).reshape(-1).long(),
        reduction="none",
    ).numpy()
    want = (ce * np.asarray(weights).reshape(-1)).sum() / (np.asarray(weights) != 0).sum()
    assert got == pytest.approx(want, rel=1e-5)


def test_confusion_and_miou():
    m = metrics.StreamingMeanIoU(3)
    labels = np.array([1, 1, 2, 2, 0])
    preds = np.array([1, 2, 2, 2, 0])
    m.update(labels, preds, valid_mask=labels > 0)
    miou, per_class = m.result()
    # class1: tp=1 fp=0 fn=1 -> 0.5; class2: tp=2 fp=1 fn=0 -> 2/3; class0 excluded
    assert per_class[1] == pytest.approx(0.5)
    assert per_class[2] == pytest.approx(2 / 3)
    assert miou == pytest.approx((0.5 + 2 / 3) / 2)
    m.reset()
    assert m.confusion.sum() == 0


def test_device_confusion_matches_streaming():
    rng = np.random.RandomState(1)
    labels = rng.randint(0, 21, size=(4, 32))
    preds = rng.randint(0, 21, size=(4, 32))
    valid = labels > 0
    dev = metrics.update_confusion(
        jnp.zeros((21, 21), jnp.float32), jnp.asarray(labels), jnp.asarray(preds),
        jnp.asarray(valid),
    )
    m = metrics.StreamingMeanIoU(21)
    m.update(labels, preds, valid)
    np.testing.assert_allclose(np.asarray(dev), m.confusion)


def test_make_sample_weights():
    labels = jnp.asarray([[0, 1, 5]])
    mask = jnp.asarray([[1.0, 0.0, 1.0]])
    w = np.asarray(make_sample_weights(labels, mask))
    assert w[0, 0] == 0.0  # class 0 weight is 0
    assert w[0, 1] == 0.0  # masked out
    assert w[0, 2] == pytest.approx(SCANNET_CLASS_WEIGHTS[5])


def _tiny_batch(b=4, n=32, with_features=False, seed=0):
    rng = np.random.RandomState(seed)
    batch = {
        "points": jnp.asarray(rng.rand(b, n, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 21, size=(b, n)).astype(np.int32)),
    }
    mask = jnp.asarray((rng.rand(b, n) > 0.2).astype(np.float32))
    batch["weights"] = make_sample_weights(batch["labels"], mask)
    if with_features:
        batch["features"] = jnp.asarray(rng.rand(b, n, 6).astype(np.float32))
    return batch


def test_train_step_updates_and_decreases_loss():
    model = models.get_model("sem_seg", num_classes=21, **TINY)
    batch = _tiny_batch()
    tx = optax.adam(schedules.scannet_learning_rate)
    state = create_state(
        model, tx, jax.random.PRNGKey(0), batch["points"], None, train=False
    )
    rng = jax.random.PRNGKey(42)
    step = jax.jit(seg_train_step)
    losses_seen = []
    for _ in range(5):
        state, m = step(state, batch, rng)
        losses_seen.append(float(m["loss"]))
    assert state.step == 5
    assert losses_seen[-1] < losses_seen[0]
    assert np.isfinite(losses_seen).all()
    assert m["confusion"].shape == (21, 21)


def test_remat_train_step_matches_plain():
    """remat='dots'/'full' (jax.checkpoint) re-executes the same ops in the
    backward pass — params after one step must match the plain step."""
    from functools import partial

    model = models.get_model("sem_seg", num_classes=21, **TINY)
    batch = _tiny_batch()
    rng = jax.random.PRNGKey(42)

    def one_step(remat):
        tx = optax.adam(schedules.scannet_learning_rate)
        state = create_state(
            model, tx, jax.random.PRNGKey(0), batch["points"], None, train=False
        )
        state, m = jax.jit(partial(seg_train_step, remat=remat))(
            state, batch, rng
        )
        return state, float(m["loss"])

    state0, loss0 = one_step("none")
    for mode in ("dots", "full"):
        state1, loss1 = one_step(mode)
        assert loss1 == pytest.approx(loss0, rel=1e-6)
        ref = jax.tree_util.tree_leaves(state0.params)
        got = jax.tree_util.tree_leaves(state1.params)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-6, atol=2e-7)
    with pytest.raises(ValueError):
        seg_train_step(state0, batch, rng, remat="bogus")


def test_eval_step_runs():
    model = models.get_model("sem_seg", num_classes=21, **TINY)
    batch = _tiny_batch()
    tx = optax.adam(1e-3)
    state = create_state(
        model, tx, jax.random.PRNGKey(0), batch["points"], None, train=False
    )
    m = jax.jit(seg_eval_step)(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert m["predictions"].shape == batch["labels"].shape


def test_data_parallel_train_step_on_mesh():
    """Full DP train step on the 8-device virtual CPU mesh: batch sharded,
    state replicated, results identical to single-device execution."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multiple devices")
    model = models.get_model("sem_seg", num_classes=21, **TINY)
    batch = _tiny_batch(b=8)
    tx = optax.adam(1e-3)
    state = create_state(
        model, tx, jax.random.PRNGKey(0), batch["points"][:1], None, train=False
    )
    rng = jax.random.PRNGKey(7)

    # Single-device reference result.
    ref_state, ref_m = jax.jit(seg_train_step)(state, batch, rng)

    mesh = parallel.make_mesh(8)
    dp_step = parallel.data_parallel_jit(
        seg_train_step, mesh, batch_argnums=(1,), donate_argnums=()
    )
    sharded = parallel.shard_batch(batch, mesh)
    dp_state, dp_m = dp_step(state, sharded, rng)

    assert float(dp_m["loss"]) == pytest.approx(float(ref_m["loss"]), rel=1e-4)
    np.testing.assert_allclose(
        np.asarray(dp_m["confusion"]), np.asarray(ref_m["confusion"])
    )
    # Params agree to within the Adam step size: at step 1 Adam's update is
    # ~lr * sign(grad), so low-order-bit reduction-order differences between
    # the sharded psum and the single-device reduction can flip near-zero
    # grads' signs — bound the divergence by ~2*lr instead of exact equality.
    lr = 1e-3
    ref_leaves = jax.tree_util.tree_leaves(ref_state.params)
    dp_leaves = jax.tree_util.tree_leaves(dp_state.params)
    for a, b in zip(ref_leaves, dp_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5 * lr)


def test_compact_wire_format_matches_f32():
    """The compact H2D wire format (labels/mask uint8, colors uint8, normals
    f16, expanded on device by expand_wire_batch) trains identically to the
    f32 batches up to f16 normal rounding."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from pointcloud_segmentation_attention_tpu import models
    from pointcloud_segmentation_attention_tpu.data import pipeline
    from pointcloud_segmentation_attention_tpu.train import (
        create_state,
        seg_train_step,
    )

    rng = np.random.RandomState(0)
    n = 128
    chunks = [{
        "points": rng.rand(n, 3).astype(np.float32),
        "labels": rng.randint(0, 21, n).astype(np.int32),
        "colors": rng.randint(0, 256, (n, 3)).astype(np.int32),
        "normals": rng.rand(n, 3).astype(np.float32),
        "weights": (rng.rand(n) > 0.3).astype(np.float32),
    } for _ in range(2)]

    bf = pipeline.make_batch(chunks, True, True, wire="f32")
    bc = pipeline.make_batch(chunks, True, True, wire="compact")
    # wire sizes: compact must be less than half the f32 bytes
    nbytes = lambda b: sum(v.nbytes for v in b.values())
    assert nbytes(bc) < 0.55 * nbytes(bf), (nbytes(bc), nbytes(bf))

    model = models.get_model("sem_seg_features", num_classes=21)
    state = create_state(
        model, optax.adam(1e-3), jax.random.PRNGKey(0),
        jnp.asarray(bf["points"][:1]), jnp.asarray(bf["features"][:1]),
        train=False,
    )
    key = jax.random.PRNGKey(1)
    sf, mf = jax.jit(seg_train_step)(state, jax.device_put(bf), key)
    sc, mc = jax.jit(seg_train_step)(state, jax.device_put(bc), key)
    assert np.allclose(float(mf["loss"]), float(mc["loss"]), rtol=1e-3)
    cf, cc = np.asarray(mf["confusion"]), np.asarray(mc["confusion"])
    # Labels/mask are bit-identical -> per-class row totals must match.
    # (Cell-level argmaxes are near-ties on random-init logits, so f16
    # normal rounding legitimately flips some — compare the training effect
    # via the updated params instead.)
    np.testing.assert_array_equal(cf.sum(1), cc.sum(1))
    # Adam's first step moves each param by up to ~lr regardless of gradient
    # magnitude, so an f16-rounded input can flip near-zero gradient signs
    # and shift a param by up to ~2*lr = 2e-3; systematic wire-format bugs
    # (wrong color scale, wrong mask) produce far larger drifts AND fail the
    # loss check above.
    for a, b in zip(jax.tree_util.tree_leaves(sf.params),
                    jax.tree_util.tree_leaves(sc.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2.5e-3)
