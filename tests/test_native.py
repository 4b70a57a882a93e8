"""Tests for the native C++ ops (ctypes) against numpy oracles."""
import numpy as np
import pytest

from pointcloud_segmentation_attention_tpu import native
from oracles import ball_query_oracle, three_nn_oracle


pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ compiler available"
)


def test_three_nn_native_matches_oracle():
    rng = np.random.RandomState(0)
    xyz1 = rng.randn(2, 100, 3).astype(np.float32)
    xyz2 = rng.randn(2, 16, 3).astype(np.float32)
    dist, idx = native.three_nn(xyz1, xyz2)
    want_d, want_i = three_nn_oracle(xyz1, xyz2)
    np.testing.assert_array_equal(idx, want_i)
    np.testing.assert_allclose(dist, want_d, rtol=1e-5, atol=1e-6)


def test_ball_query_native_matches_oracle():
    rng = np.random.RandomState(1)
    xyz = rng.rand(2, 128, 3).astype(np.float32)
    centers = xyz[:, :16]
    idx, cnt = native.ball_query(xyz, centers, 0.3, 8)
    want_idx, want_cnt = ball_query_oracle(xyz, centers, 0.3, 8)
    np.testing.assert_array_equal(idx, want_idx)
    np.testing.assert_array_equal(cnt, want_cnt)


def test_render_ball_draws_points():
    pts = np.array([[50, 50, 1.0], [10, 10, 2.0]], np.float32)
    colors = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
    img = native.render_ball(pts, colors, h=100, w=100, radius=3)
    assert img.shape == (100, 100, 3)
    assert (img[50, 50] == [255, 0, 0]).all()
    assert (img[10, 10] == [0, 255, 0]).all()
    assert (img[90, 90] == [255, 255, 255]).all()  # background


def test_render_ball_zbuffer_front_wins():
    # Two coincident points; the nearer (smaller z) must win.
    pts = np.array([[30, 30, 5.0], [30, 30, 1.0]], np.float32)
    colors = np.array([[255, 0, 0], [0, 0, 255]], np.uint8)
    img = native.render_ball(pts, colors, h=64, w=64, radius=2)
    assert (img[30, 30] == [0, 0, 255]).all()


def test_grid_chunk_assign_covers_all_points():
    rng = np.random.RandomState(2)
    pts = (rng.rand(5000, 3) * [4.5, 4.5, 2.5]).astype(np.float32)
    cells, pids, ncx, ncy = native.grid_chunk_assign(pts)
    assert ncx == 3 and ncy == 3
    # Every point assigned to at least one cell.
    assert len(np.unique(pids)) == 5000
    # Points well inside a cell appear exactly once; margin points 2-4 times.
    counts = np.bincount(pids, minlength=5000)
    assert counts.min() >= 1 and counts.max() <= 4
