"""Parity + gradient tests for the MXU three_interpolate kernel."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_segmentation_attention_tpu.ops import geometry
from pointcloud_segmentation_attention_tpu.ops.pallas.interpolate_kernel import (
    three_interpolate_pallas,
)
from oracles import three_interpolate_oracle

INTERPRET = jax.default_backend() != "tpu"
# Exact in interpret mode; MXU ingests bf16 on real TPU (see kernel docstring).
TOL = dict(rtol=1e-4, atol=1e-5) if INTERPRET else dict(rtol=2e-2, atol=2e-2)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(3)
    points = rng.randn(2, 20, 10).astype(np.float32)
    idx = rng.randint(0, 20, (2, 33, 3)).astype(np.int32)
    w = rng.rand(2, 33, 3).astype(np.float32)
    return points, idx, w


def test_fwd_matches_oracle(data):
    points, idx, w = data
    got = np.asarray(three_interpolate_pallas(
        jnp.asarray(points), jnp.asarray(idx), jnp.asarray(w), INTERPRET
    ))
    want = three_interpolate_oracle(points, idx, w)
    np.testing.assert_allclose(got, want, **TOL)


def test_fwd_duplicate_indices(data):
    # All three neighbors identical: out = (w1+w2+w3) * P[j]
    points = np.arange(12, dtype=np.float32).reshape(1, 4, 3)
    idx = np.array([[[2, 2, 2]]], np.int32)
    w = np.array([[[0.2, 0.3, 0.5]]], np.float32)
    got = np.asarray(three_interpolate_pallas(
        jnp.asarray(points), jnp.asarray(idx), jnp.asarray(w), INTERPRET
    ))
    np.testing.assert_allclose(got[0, 0], points[0, 2], **TOL)


def test_vjp_matches_xla(data):
    points, idx, w = data
    pj, ij, wj = jnp.asarray(points), jnp.asarray(idx), jnp.asarray(w)

    def loss_pallas(p, wt):
        return jnp.sum(three_interpolate_pallas(p, ij, wt, INTERPRET) ** 2)

    def loss_xla(p, wt):
        return jnp.sum(geometry.three_interpolate(p, ij, wt) ** 2)

    gp, gw = jax.grad(loss_pallas, argnums=(0, 1))(pj, wj)
    xp, xw = jax.grad(loss_xla, argnums=(0, 1))(pj, wj)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(xp), **TOL)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(xw), **TOL)
