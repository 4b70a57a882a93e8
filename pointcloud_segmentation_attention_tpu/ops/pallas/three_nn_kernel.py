"""Pallas TPU kernel: 3 nearest neighbors.

Reference: ``tf_interpolate.cpp:60-103`` (CPU brute force insertion sort).
The pure-XLA version pays for a full ``top_k`` sort network over all M known
points per unknown point; here the top-3 is three min-reduction passes over
the (Nt, M) distance tile held in VMEM:

- grid = (B, N/Nt): unknown-point tiles; known points lane-resident (3, M).
- d2 tile computed once, then 3x {row-min, first-matching-lane, mask-out}.
- First-index tie-breaking via masked lane-min, matching the reference's
  strict-< insertion sort.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _three_nn_kernel(known_ref, unknown_ref, dist_ref, idx_ref, *, m: int):
    # known_ref: (3, Mp); unknown_ref: (Nt, 128) [xyz in first 3 lanes];
    # dist_ref/idx_ref: (Nt, 128) [3 results in first 3 lanes].
    nt = unknown_ref.shape[0]
    m_pad = known_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (nt, m_pad), 1)
    valid = lane < m

    ux = unknown_ref[:, 0:1]
    uy = unknown_ref[:, 1:2]
    uz = unknown_ref[:, 2:3]
    dx = ux - known_ref[0:1, :]
    dy = uy - known_ref[1:2, :]
    dz = uz - known_ref[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    d2 = jnp.where(valid, d2, jnp.inf)

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (nt, 128), 1)
    dists = jnp.zeros((nt, 128), jnp.float32)
    idxs = jnp.zeros((nt, 128), jnp.int32)
    for k in range(3):
        best = jnp.min(d2, axis=1, keepdims=True)                # (Nt, 1)
        best_lane = jnp.min(
            jnp.where(d2 == best, lane, m_pad), axis=1, keepdims=True
        )                                                         # (Nt, 1)
        dists = jnp.where(out_lane == k, best, dists)
        idxs = jnp.where(out_lane == k, best_lane, idxs)
        d2 = jnp.where(lane == best_lane, jnp.inf, d2)
    dist_ref[...] = dists
    idx_ref[...] = idxs


@partial(jax.jit, static_argnums=(2,))
def three_nn_pallas(xyz1: jnp.ndarray, xyz2: jnp.ndarray, interpret: bool = False):
    """(B,N,3) unknown, (B,M,3) known -> dist (B,N,3) sq f32, idx (B,N,3) i32."""
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    m_pad = _round_up(m, 128)
    # Unknown tile height bounded by VMEM (few (Nt, Mp) temporaries).
    budget_rows = (3 << 20) // (8 * m_pad)
    nt = 8
    while nt * 2 <= min(budget_rows, 512, max(n, 8)):
        nt *= 2
    n_pad = _round_up(n, nt)

    known = jnp.transpose(xyz2.astype(jnp.float32), (0, 2, 1))
    if m_pad != m:
        known = jnp.pad(known, ((0, 0), (0, 0), (0, m_pad - m)))
    unknown = xyz1.astype(jnp.float32)
    if n_pad != n:
        unknown = jnp.pad(unknown, ((0, 0), (0, n_pad - n), (0, 0)))
    unknown = jnp.pad(unknown, ((0, 0), (0, 0), (0, 128 - 3)))

    dist, idx = pl.pallas_call(
        partial(_three_nn_kernel, m=m),
        grid=(b, n_pad // nt),
        in_specs=[
            pl.BlockSpec((None, 3, m_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nt, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, nt, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, nt, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, n_pad, 128), jnp.int32),
        ),
        interpret=interpret,
    )(known, unknown)
    return dist[:, :n, :3], idx[:, :n, :3]
