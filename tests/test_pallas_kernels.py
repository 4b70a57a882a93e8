"""Parity tests for the Pallas TPU kernels (interpret mode on CPU).

On real TPU hardware (PSA_TEST_TPU=1) the same tests run compiled.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_attention_tpu import ops
from pointcloud_segmentation_attention_tpu.ops.pallas import (
    ball_query_pallas,
    farthest_point_sample_pallas,
    three_nn_pallas,
)
from oracles import ball_query_oracle, fps_oracle, three_nn_oracle

INTERPRET = jax.default_backend() != "tpu"


@pytest.fixture(scope="module")
def rng():
    return np.random.RandomState(7)


def test_fps_pallas_matches_oracle(rng):
    xyz = rng.rand(2, 300, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(jnp.asarray(xyz), 37, INTERPRET))
    np.testing.assert_array_equal(got, fps_oracle(xyz, 37))


def test_fps_pallas_matches_xla_lane_aligned(rng):
    # Exercise exact lane-multiple N and npoint.
    xyz = rng.rand(3, 256, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(jnp.asarray(xyz), 128, INTERPRET))
    want = np.asarray(ops.geometry.farthest_point_sample(jnp.asarray(xyz), 128))
    np.testing.assert_array_equal(got, want)


def test_ball_query_pallas_matches_oracle(rng):
    xyz = rng.rand(2, 300, 3).astype(np.float32)
    centers_idx = fps_oracle(xyz, 40)
    centers = np.take_along_axis(xyz, centers_idx[..., None].astype(np.int64), 1)
    gi, gc = ball_query_pallas(jnp.asarray(xyz), jnp.asarray(centers), 0.2, 16,
                               INTERPRET)
    wi, wc = ball_query_oracle(xyz, centers, 0.2, 16)
    np.testing.assert_array_equal(np.asarray(gi), wi)
    np.testing.assert_array_equal(np.asarray(gc), wc)


def test_ball_query_pallas_empty_and_full(rng):
    # Center far from everything -> cnt 0, idx 0; radius huge -> first 4 pts.
    xyz = np.zeros((1, 8, 3), np.float32)
    xyz[0, :, 0] = np.arange(8)
    centers = np.array([[[100.0, 0, 0], [0.0, 0, 0]]], np.float32)
    gi, gc = ball_query_pallas(jnp.asarray(xyz), jnp.asarray(centers), 2.5, 4,
                               INTERPRET)
    gi, gc = np.asarray(gi), np.asarray(gc)
    assert gc[0, 0] == 0 and (gi[0, 0] == 0).all()
    assert gc[0, 1] == 3  # points 0,1,2 within 2.5 of origin
    np.testing.assert_array_equal(gi[0, 1], [0, 1, 2, 0])


def test_three_nn_pallas_matches_oracle(rng):
    xyz1 = rng.randn(2, 100, 3).astype(np.float32)
    xyz2 = rng.randn(2, 16, 3).astype(np.float32)
    gd, gi = three_nn_pallas(jnp.asarray(xyz1), jnp.asarray(xyz2), INTERPRET)
    wd, wi = three_nn_oracle(xyz1, xyz2)
    np.testing.assert_array_equal(np.asarray(gi), wi)
    np.testing.assert_allclose(np.asarray(gd), wd, rtol=1e-4, atol=1e-5)


def test_dispatch_modes(rng):
    xyz = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
    ops.set_backend("xla")
    try:
        a = np.asarray(ops.farthest_point_sample(xyz, 8))
    finally:
        ops.set_backend("auto")
    b = np.asarray(ops.geometry.farthest_point_sample(xyz, 8))
    np.testing.assert_array_equal(a, b)
    assert ops.get_backend() == "auto"


def test_ball_query_pallas_large_n_unpacked(rng):
    """N >= 2^15 disables the 16-bit prefix packing (counts would overflow
    the field); the unpacked path must stay oracle-exact.  Regression for
    the silent-corruption regime flagged in round 1."""
    n = (1 << 15) + 256  # 33024 points
    xyz = rng.rand(1, n, 3).astype(np.float32) * 0.2  # dense: counts >> 2^15/2
    centers = xyz[:, :8, :].copy()
    gi, gc = ball_query_pallas(jnp.asarray(xyz), jnp.asarray(centers), 0.5, 8,
                               INTERPRET)
    wi, wc = ball_query_oracle(xyz, centers, 0.5, 8)
    np.testing.assert_array_equal(np.asarray(gi), wi)
    np.testing.assert_array_equal(np.asarray(gc), wc)


def test_group_gather_vjp_precision_flag():
    """The scatter-add VJP honors the module precision knob (advisor r3):
    under the HIGHEST flag the gradients still match the default path
    exactly in interpret mode (the knob only changes MXU ingest on real
    TPU, where the measured delta is 1.7e-3-relative — docs).

    Own RandomState (not the module fixture): consuming the shared stream
    here shifts every downstream test's draws."""
    import jax
    import jax.numpy as jnp

    from pointcloud_segmentation_attention_tpu.ops.pallas import (
        group_gather_kernel as ggk,
    )

    rng = np.random.RandomState(21)
    pts = jnp.asarray(rng.rand(2, 64, 8).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, (2, 16, 4)).astype(np.int32))
    cnt = jnp.asarray(rng.randint(1, 5, (2, 16)).astype(np.int32))

    def grad_with(prec):
        old = ggk.VJP_PRECISION
        try:
            ggk.VJP_PRECISION = prec
            return jax.grad(lambda p: jnp.sum(jnp.sin(
                ggk.group_gather(p, idx, cnt, True))))(pts)
        finally:
            ggk.VJP_PRECISION = old

    np.testing.assert_allclose(
        np.asarray(grad_with(None)),
        np.asarray(grad_with(jax.lax.Precision.HIGHEST)), atol=1e-6)


def test_group_gather_pallas_matches_group_point(rng):
    """Count-aware neighborhood gather == XLA group_point given ball-query
    output (incl. empty balls and saturated balls), and its scatter-add VJP
    matches (ref capability tf_grouping_g.cu:40-78)."""
    from pointcloud_segmentation_attention_tpu.ops.pallas.group_gather_kernel import (
        group_gather,
    )

    xyz = rng.rand(2, 300, 3).astype(np.float32)
    pts = rng.rand(2, 300, 9).astype(np.float32)
    centers_idx = fps_oracle(xyz, 40)
    centers = np.take_along_axis(xyz, centers_idx[..., None].astype(np.int64), 1)
    # small radius -> some empty balls; large -> saturated balls
    for radius in (0.05, 0.9):
        idx, cnt = ball_query_oracle(xyz, centers, radius, 16)
        got = np.asarray(group_gather(
            jnp.asarray(pts), jnp.asarray(idx), jnp.asarray(cnt), INTERPRET))
        want = np.asarray(ops.group_point(jnp.asarray(pts), jnp.asarray(idx)))
        np.testing.assert_array_equal(got, want)

    idx, cnt = ball_query_oracle(xyz, centers, 0.2, 16)
    g1 = jax.grad(lambda p: jnp.sum(group_gather(
        p, jnp.asarray(idx), jnp.asarray(cnt), INTERPRET) ** 2))(jnp.asarray(pts))
    g2 = jax.grad(lambda p: jnp.sum(
        ops.group_point(p, jnp.asarray(idx)) ** 2))(jnp.asarray(pts))
    # rtol covers accumulation-order noise on O(10) gradient sums (a pure
    # atol was one ULP-reassociation from failing).
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-5,
                               rtol=1e-5)


def test_ball_query_pallas_realistic_n_mixed_density(rng):
    """Packed-roll path at a realistic N=2048 with mixed densities (empty,
    sparse, saturated balls) stays oracle-exact."""
    n = 2048
    xyz = (rng.rand(2, n, 3) * np.array([1.9, 1.9, 2.6])).astype(np.float32)
    centers = np.concatenate([
        xyz[:, :6, :], np.full((2, 2, 3), 50.0, np.float32)], axis=1)
    for radius, ns in ((0.1, 32), (0.5, 8), (3.0, 16)):
        gi, gc = ball_query_pallas(jnp.asarray(xyz), jnp.asarray(centers),
                                   radius, ns, INTERPRET)
        wi, wc = ball_query_oracle(xyz, centers, radius, ns)
        np.testing.assert_array_equal(np.asarray(gi), wi)
        np.testing.assert_array_equal(np.asarray(gc), wc)


def test_mxu_scatter_add_matches_xla(rng):
    """The MXU indicator-matmul scatter-add (group-gather VJP for small
    target sets) matches the XLA .at[].add() transpose."""
    from pointcloud_segmentation_attention_tpu.ops.pallas.group_gather_kernel import (
        _mxu_scatter_supported, _scatter_add_mxu,
    )

    b, r, n, c = 2, 700, 96, 67
    assert _mxu_scatter_supported(n, c)
    idx = jnp.asarray(rng.randint(0, n, (b, r)).astype(np.int32))
    g = jnp.asarray(rng.randn(b, r, c).astype(np.float32))
    got = np.asarray(_scatter_add_mxu(idx, g, n, c, interpret=True))
    want = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        np.add.at(want[bi], np.asarray(idx)[bi], np.asarray(g)[bi])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-4)
    # Huge target sets stay on the XLA scatter path.
    assert not _mxu_scatter_supported(8192, 512)


def test_group_gather_center_tile_bounds_vmem():
    """Large-nsample shapes (cls MSG: m=512, ns=128) must pick a center tile
    whose DOUBLE-BUFFERED out block fits the 16 MB scoped-vmem stack — the
    r5 TPU batch hit a compile-time vmem OOM at f32[8,65536,128] when the
    tile was bounded by count alone."""
    from pointcloud_segmentation_attention_tpu.ops.pallas.group_gather_kernel import (
        _pick_center_tile,
    )

    for m, ns, c_pad in [(512, 128, 128), (1024, 32, 128), (8192, 32, 128),
                         (512, 16, 128), (7, 128, 256), (256, 64, 384),
                         (128, 32, 384), (100, 32, 128), (12, 64, 128)]:
        mt = _pick_center_tile(m, ns, c_pad)
        # Mosaic block-shape rule: mt a multiple of 8, or the whole array.
        assert mt % 8 == 0 or mt == m, (m, ns, c_pad, mt)
        # Double-buffered out tile within the 16 MB scoped stack (the mt=8
        # floor can exceed the 4 MB half-target only for pathological
        # ns x c products; assert the hard limit).
        assert 2 * mt * ns * c_pad * 4 <= 16 << 20, (m, ns, c_pad, mt)
        # The bound actually binds: cls MSG's shape picks a reduced tile.
    assert _pick_center_tile(512, 128, 128) == 64
    assert _pick_center_tile(128, 32, 384) == 80
