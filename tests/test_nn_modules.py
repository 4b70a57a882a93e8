"""Tests for NN layers and SA/FP modules on tiny shapes."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_attention_tpu import nn as pnn


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(42)


def test_scheduled_batchnorm_updates_stats(rng):
    x = jnp.asarray(rng.randn(4, 16, 8).astype(np.float32) * 2 + 3)
    bn = pnn.ScheduledBatchNorm()
    variables = bn.init(jax.random.PRNGKey(0), x, train=True)
    y, updates = bn.apply(
        variables, x, train=True, momentum=0.5, mutable=["batch_stats"]
    )
    y = np.asarray(y)
    # Output normalized over all but last axis.
    np.testing.assert_allclose(y.mean(axis=(0, 1)), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.std(axis=(0, 1)), 1.0, atol=1e-2)
    # EMA update: 0.5 * 0 + 0.5 * batch_mean
    batch_mean = np.asarray(x).mean(axis=(0, 1))
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["mean"]), 0.5 * batch_mean, rtol=1e-5
    )
    # Eval mode uses running stats (different result from train mode).
    merged = {"params": variables["params"], "batch_stats": updates["batch_stats"]}
    y_eval = bn.apply(merged, x, train=False)
    assert not np.allclose(np.asarray(y_eval), y)


def test_pointconv_shapes_and_bn(rng):
    x = jnp.asarray(rng.randn(2, 10, 4, 6).astype(np.float32))
    conv = pnn.PointConv(16)
    variables = conv.init(jax.random.PRNGKey(0), x, train=False)
    y = conv.apply(variables, x, train=False)
    assert y.shape == (2, 10, 4, 16)
    assert (np.asarray(y) >= 0).all()  # relu


def test_attention_pool_shapes_and_softmax(rng):
    x = jnp.asarray(rng.randn(2, 6, 8, 32).astype(np.float32))
    query = x[:, :, :1, :]
    pool = pnn.AttentionPool(output_dim=4, key_dim=4, num_heads=8)
    variables = pool.init(jax.random.PRNGKey(0), x, query)
    y = pool.apply(variables, x, query)
    assert y.shape == (2, 6, 8 * 4)


def test_attention_pool_matches_reference_math(rng):
    """Numpy oracle of the reference AttentionLayer (attention_layer.py:29-45)
    including its raw row-major head-split reshape."""
    b, npoint, s, c = 1, 3, 5, 16
    h, kd = 4, 4
    x = rng.randn(b, npoint, s, c).astype(np.float32)
    query = x[:, :, :1, :]
    pool = pnn.AttentionPool(output_dim=kd, key_dim=kd, num_heads=h)
    variables = pool.init(jax.random.PRNGKey(1), jnp.asarray(x), jnp.asarray(query))
    y = np.asarray(pool.apply(variables, jnp.asarray(x), jnp.asarray(query)))

    p = jax.tree_util.tree_map(np.asarray, variables["params"])
    q = query @ p["query_net"]["kernel"] + p["query_net"]["bias"]
    k = x @ p["key_net"]["kernel"] + p["key_net"]["bias"]
    v = x @ p["value_net"]["kernel"] + p["value_net"]["bias"]
    q = q.reshape(b, npoint, h, 1, kd)
    k = k.reshape(b, npoint, h, s, kd)
    v = v.reshape(b, npoint, h, s, kd)
    logits = (q @ np.swapaxes(k, -1, -2)) / np.sqrt(kd)
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    want = (w @ v).reshape(b, npoint, h * kd)
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)
    # Softmax weights are a convex combination: output bounded by V extremes.
    assert np.isfinite(y).all()


def test_inner_attention_block_residual_shape(rng):
    x = jnp.asarray(rng.randn(1, 4, 8, 16).astype(np.float32))
    block = pnn.InnerAttentionBlock(out_dim=16, key_dim=16)
    variables = block.init(jax.random.PRNGKey(0), x)
    y = block.apply(variables, x)
    assert y.shape == x.shape


def test_sample_and_group_centering(rng):
    xyz = jnp.asarray(rng.rand(2, 64, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 64, 5).astype(np.float32))
    new_xyz, new_points, idx, grouped_xyz = pnn.sample_and_group(
        16, 0.3, 8, xyz, feats
    )
    assert new_xyz.shape == (2, 16, 3)
    assert new_points.shape == (2, 16, 8, 8)  # 3 centered xyz + 5 feats
    assert idx.shape == (2, 16, 8)
    # First group element of ball query is within radius of the center, and the
    # first grouped (centered) xyz is near zero for the self-hit.
    assert np.all(np.linalg.norm(np.asarray(grouped_xyz)[..., 0, :], axis=-1) < 0.3)


def test_sample_and_group_all(rng):
    xyz = jnp.asarray(rng.rand(2, 16, 3).astype(np.float32))
    new_xyz, new_points, idx, grouped = pnn.sample_and_group_all(xyz, None)
    assert new_xyz.shape == (2, 1, 3)
    assert np.asarray(new_xyz).sum() == 0
    assert new_points.shape == (2, 1, 16, 3)


@pytest.mark.parametrize("pooling", ["max", "avg", "weighted_avg", "max_and_avg",
                                     "attention", "attention_and_pool",
                                     "attention_centroid"])
def test_set_abstraction_poolings(rng, pooling):
    xyz = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    sa = pnn.SetAbstraction(
        npoint=8, radius=0.5, nsample=4, mlp=(8, 16), pooling=pooling
    )
    variables = sa.init(jax.random.PRNGKey(0), xyz, None, train=False)
    new_xyz, new_points, idx = sa.apply(variables, xyz, None, train=False)
    out_c = 32 if pooling == "max_and_avg" else 16
    assert new_xyz.shape == (1, 8, 3)
    assert new_points.shape == (1, 8, out_c)


def test_set_abstraction_group_all(rng):
    xyz = jnp.asarray(rng.rand(2, 16, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(2, 16, 4).astype(np.float32))
    sa = pnn.SetAbstraction(
        npoint=None, radius=None, nsample=None, mlp=(8, 8), group_all=True
    )
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    new_xyz, new_points, idx = sa.apply(variables, xyz, feats, train=False)
    assert new_points.shape == (2, 1, 8)


def test_msg_concat_channels(rng):
    xyz = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    msg = pnn.SetAbstractionMSG(
        npoint=8, radius_list=(0.2, 0.4), nsample_list=(4, 8),
        mlp_list=((8, 8), (8, 16)),
    )
    variables = msg.init(jax.random.PRNGKey(0), xyz, None, train=False)
    new_xyz, new_points = msg.apply(variables, xyz, None, train=False)
    assert new_points.shape == (1, 8, 8 + 16)


def test_feature_propagation_interpolates(rng):
    xyz1 = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    xyz2 = jnp.asarray(rng.rand(1, 8, 3).astype(np.float32))
    p2 = jnp.asarray(rng.randn(1, 8, 6).astype(np.float32))
    fp = pnn.FeaturePropagation(mlp=(8,))
    variables = fp.init(jax.random.PRNGKey(0), xyz1, xyz2, None, p2, train=False)
    out = fp.apply(variables, xyz1, xyz2, None, p2, train=False)
    assert out.shape == (1, 32, 8)


def test_set_abstraction_is_differentiable(rng):
    xyz = jnp.asarray(rng.rand(1, 32, 3).astype(np.float32))
    feats = jnp.asarray(rng.randn(1, 32, 4).astype(np.float32))
    sa = pnn.SetAbstraction(npoint=8, radius=0.5, nsample=4, mlp=(8,))
    variables = sa.init(jax.random.PRNGKey(0), xyz, feats, train=False)

    def loss(params, f):
        _, y, _ = sa.apply({"params": params, **{k: v for k, v in variables.items() if k != "params"}},
                           xyz, f, train=False)
        return jnp.sum(y ** 2)

    g_params, g_feats = jax.grad(loss, argnums=(0, 1))(variables["params"], feats)
    flat = jax.tree_util.tree_leaves(g_params)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert np.isfinite(np.asarray(g_feats)).all()
    assert np.abs(np.asarray(g_feats)).sum() > 0
