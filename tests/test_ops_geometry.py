"""Golden tests for the pure-XLA geometry ops against numpy oracles."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_attention_tpu import ops
from oracles import (
    ball_query_oracle,
    fps_oracle,
    three_interpolate_oracle,
    three_nn_oracle,
)


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(0)


def test_fps_matches_oracle(rng):
    xyz = rng.randn(3, 128, 3).astype(np.float32)
    got = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 32))
    want = fps_oracle(xyz, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_seeds_at_zero(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16))
    assert (idx[:, 0] == 0).all()
    # All picks distinct while npoint <= n
    for b in range(2):
        assert len(set(idx[b].tolist())) == 16


def test_fps_npoint_one(rng):
    xyz = rng.randn(2, 8, 3).astype(np.float32)
    idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 1))
    np.testing.assert_array_equal(idx, np.zeros((2, 1), np.int32))


def test_ball_query_matches_oracle(rng):
    xyz = rng.rand(2, 256, 3).astype(np.float32)
    centers_idx = fps_oracle(xyz, 32)
    new_xyz = np.take_along_axis(xyz, centers_idx[..., None], axis=1)
    got_idx, got_cnt = ops.ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.2, 16)
    want_idx, want_cnt = ball_query_oracle(xyz, new_xyz, 0.2, 16)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)


def test_ball_query_pads_with_first_hit(rng):
    # One far-away center with only itself in radius.
    xyz = np.zeros((1, 4, 3), np.float32)
    xyz[0, 2] = [5.0, 5.0, 5.0]
    centers = xyz[:, 2:3]
    idx, cnt = ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 3)
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [2, 2, 2])
    assert int(cnt[0, 0]) == 1


def test_ball_query_no_hits_gives_zero(rng):
    xyz = np.zeros((1, 4, 3), np.float32)
    centers = np.full((1, 1, 3), 100.0, np.float32)
    idx, cnt = ops.ball_query(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 3)
    assert int(cnt[0, 0]) == 0
    np.testing.assert_array_equal(np.asarray(idx)[0, 0], [0, 0, 0])


def test_ball_query_chunked_path(rng, monkeypatch):
    # Force the chunked path by shrinking the element budget.
    from pointcloud_segmentation_attention_tpu.ops import geometry

    xyz = rng.rand(2, 128, 3).astype(np.float32)
    new_xyz = xyz[:, :48]
    want_idx, want_cnt = np.asarray(
        ops.ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.3, 8)[0]
    ), np.asarray(ops.ball_query(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.3, 8)[1])
    monkeypatch.setattr(geometry, "_MAX_CHUNK_ELEMS", 2 * 128 * 7)

    def chunked(x, c, r, k):  # bypass jit cache of the public wrapper
        return geometry.ball_query.__wrapped__(x, c, r, k)

    got_idx, got_cnt = chunked(jnp.asarray(xyz), jnp.asarray(new_xyz), 0.3, 8)
    np.testing.assert_array_equal(np.asarray(got_idx), want_idx)
    np.testing.assert_array_equal(np.asarray(got_cnt), want_cnt)


def test_knn_point(rng):
    xyz = rng.randn(2, 64, 3).astype(np.float32)
    new_xyz = xyz[:, :10]
    dist, idx = ops.knn_point(4, jnp.asarray(xyz), jnp.asarray(new_xyz))
    d2 = np.sum((new_xyz[:, :, None] - xyz[:, None]) ** 2, axis=-1)
    want_idx = np.argsort(d2, axis=-1, kind="stable")[..., :4]
    np.testing.assert_array_equal(np.asarray(idx), want_idx)
    np.testing.assert_allclose(
        np.asarray(dist), np.take_along_axis(d2, want_idx, -1), rtol=1e-5, atol=1e-6
    )
    # Nearest neighbor of a point drawn from the set is itself.
    assert (np.asarray(idx)[:, :, 0] == np.arange(10)[None]).all()


def test_three_nn_matches_oracle(rng):
    xyz1 = rng.randn(2, 100, 3).astype(np.float32)
    xyz2 = rng.randn(2, 16, 3).astype(np.float32)
    got_d, got_i = ops.three_nn(jnp.asarray(xyz1), jnp.asarray(xyz2))
    want_d, want_i = three_nn_oracle(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(got_i), want_i)
    np.testing.assert_allclose(np.asarray(got_d), want_d, rtol=1e-4, atol=1e-5)


def test_three_interpolate_matches_oracle(rng):
    points = rng.randn(2, 16, 8).astype(np.float32)
    idx = rng.randint(0, 16, size=(2, 50, 3)).astype(np.int32)
    w = rng.rand(2, 50, 3).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    got = np.asarray(ops.three_interpolate(jnp.asarray(points), jnp.asarray(idx), jnp.asarray(w)))
    want = three_interpolate_oracle(points, idx, w)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_three_interpolate_gradient(rng):
    points = rng.randn(1, 8, 4).astype(np.float32)
    idx = rng.randint(0, 8, size=(1, 12, 3)).astype(np.int32)
    w = rng.rand(1, 12, 3).astype(np.float32)

    def f(p):
        return jnp.sum(ops.three_interpolate(p, jnp.asarray(idx), jnp.asarray(w)) ** 2)

    g = jax.grad(f)(jnp.asarray(points))
    # numeric check
    eps = 1e-3
    num = np.zeros_like(points)
    for i in np.ndindex(points.shape):
        p1, p2 = points.copy(), points.copy()
        p1[i] += eps
        p2[i] -= eps
        num[i] = (f(jnp.asarray(p1)) - f(jnp.asarray(p2))) / (2 * eps)
    np.testing.assert_allclose(np.asarray(g), num, rtol=1e-2, atol=1e-2)


def test_group_point_gradient_is_scatter_add(rng):
    points = rng.randn(1, 6, 2).astype(np.float32)
    idx = np.array([[[0, 0, 1], [5, 5, 5]]], np.int32)  # repeated indices

    def f(p):
        return jnp.sum(ops.group_point(p, jnp.asarray(idx)))

    g = np.asarray(jax.grad(f)(jnp.asarray(points)))
    want = np.zeros_like(points)
    for b, m, k in np.ndindex(idx.shape):
        want[b, idx[b, m, k]] += 1.0
    np.testing.assert_allclose(g, want)


def test_gather_point(rng):
    pts = rng.randn(2, 10, 3).astype(np.float32)
    idx = rng.randint(0, 10, size=(2, 4)).astype(np.int32)
    got = np.asarray(ops.gather_point(jnp.asarray(pts), jnp.asarray(idx)))
    want = np.stack([pts[b][idx[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_interpolation_weights_normalized(rng):
    d = rng.rand(2, 5, 3).astype(np.float32)
    w = np.asarray(ops.interpolation_weights(jnp.asarray(d)))
    np.testing.assert_allclose(w.sum(-1), 1.0, rtol=1e-5)
    # Closest neighbor gets the biggest weight.
    assert (np.argmax(w, -1) == np.argmin(d, -1)).all()


def test_prob_sample_distribution(rng):
    weights = np.array([[1.0, 0.0, 3.0, 0.0]], np.float32)
    u = rng.rand(1, 4000).astype(np.float32)
    idx = np.asarray(ops.prob_sample(jnp.asarray(weights), jnp.asarray(u)))
    counts = np.bincount(idx.ravel(), minlength=4)
    assert counts[1] == 0 and counts[3] == 0
    assert abs(counts[2] / counts.sum() - 0.75) < 0.05
