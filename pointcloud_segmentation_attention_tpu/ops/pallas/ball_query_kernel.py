"""Pallas TPU kernel: ball query with first-nsample-in-order semantics.

Reference: ``tf_grouping_g.cu:3-36`` (one thread per center scanning all N
points in order).  TPU formulation:

- grid = (B, M/Mt): each program handles a (Mt, N) tile of the distance
  matrix, which is never materialized in HBM (the pure-XLA version streams
  (B, Mc, N) chunks through HBM + a top_k).
- In-radius mask -> in-order position via a log2(N) shift-add prefix sum
  along the lane axis.
- Slot extraction: for each output slot s, idx[:, s] = row-sum of
  lane_index * [mask & pos == s+1] — exactly one lane matches per row, so the
  sum is the index of the (s+1)-th in-radius point.  Padding slots (s >= cnt)
  are filled with the first hit, count clamped to nsample, empty -> 0.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _ball_query_kernel(
    xyz_ref, centers_ref, idx_ref, cnt_ref, *, n: int, nsample: int,
    nsample_pad: int, r2: float,
):
    # xyz_ref: (3, Np); centers_ref: (Mt, 3+pad); idx_ref: (Mt, nsample_pad);
    # cnt_ref: (Mt, 128).
    mt = centers_ref.shape[0]
    n_pad = xyz_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (mt, n_pad), 1)
    valid = lane < n

    cx = centers_ref[:, 0:1]
    cy = centers_ref[:, 1:2]
    cz = centers_ref[:, 2:3]
    dx = cx - xyz_ref[0:1, :]
    dy = cy - xyz_ref[1:2, :]
    dz = cz - xyz_ref[2:3, :]
    d2 = dx * dx + dy * dy + dz * dz
    mask = (d2 < r2) & valid

    # Prefix sum along lanes: pos[m, j] = # of in-radius points with index <= j.
    pos = mask.astype(jnp.int32)
    shift = 1
    while shift < n_pad:
        rolled = pltpu.roll(pos, shift, axis=1)
        pos = pos + jnp.where(lane >= shift, rolled, 0)
        shift *= 2

    total = jnp.max(jnp.where(mask, pos, 0), axis=1, keepdims=True)  # (Mt, 1)
    cnt = jnp.minimum(total, nsample)

    # Capped position: points beyond the first nsample are dropped.
    sel_pos = jnp.where(mask & (pos <= nsample), pos, 0)  # 1-based slot, 0=none
    lane_i32 = lane

    first_hit = jnp.sum(
        jnp.where(sel_pos == 1, lane_i32, 0), axis=1, keepdims=True
    )  # (Mt, 1); 0 when no hits

    # Slot extraction, bounded by the tile's max hit count: every slot s >=
    # cnt[m] is a repeat of the first hit (the CUDA padding rule), so only
    # slots < max(cnt) need a lane reduction at all.  With sparse balls (the
    # common case: ~4 hits among 8192 points at SA level 1 on real chunk
    # geometry) this turns 32 full-width reduction passes into ~4.
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (mt, nsample_pad), 1)
    init = jnp.where(out_lane < nsample,
                     jnp.broadcast_to(first_hit, (mt, nsample_pad)), 0)
    cnt_max = jnp.max(cnt)

    def slot_body(state):
        s, idxs = state
        idx_s = jnp.sum(jnp.where(sel_pos == s + 1, lane_i32, 0), axis=1,
                        keepdims=True)
        idxs = jnp.where((out_lane == s) & (cnt > s), idx_s, idxs)
        return s + 1, idxs

    _, idxs = jax.lax.while_loop(
        lambda state: state[0] < cnt_max, slot_body, (jnp.int32(1), init)
    )
    idx_ref[...] = idxs
    cnt_ref[...] = jnp.broadcast_to(cnt, cnt_ref.shape)


@partial(jax.jit, static_argnums=(2, 3, 4))
def ball_query_pallas(
    xyz: jnp.ndarray, new_xyz: jnp.ndarray, radius: float, nsample: int,
    interpret: bool = False,
):
    """(B,N,3), (B,M,3) -> idx (B,M,nsample) i32, cnt (B,M) i32."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    n_pad = _round_up(n, 128)
    nsample_pad = _round_up(nsample, 128)
    # Center-tile height: the kernel keeps ~8 (Mt, Np) f32/i32 temporaries
    # live (distances, mask, prefix sum, lane iota, ...); keep them within the
    # ~16 MB scoped-VMEM budget.
    budget_rows = (3 << 20) // (8 * n_pad)  # Mt * Np * 4B * 8 temps <= 12 MB
    mt = 8
    while mt * 2 <= min(budget_rows, 256, max(m, 8)):
        mt *= 2
    m_pad = _round_up(m, mt)

    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))
    if n_pad != n:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - n)))
    centers = new_xyz.astype(jnp.float32)
    if m_pad != m:
        centers = jnp.pad(centers, ((0, 0), (0, m_pad - m), (0, 0)))
    # Pad channel dim to lane width.
    centers = jnp.pad(centers, ((0, 0), (0, 0), (0, 128 - 3)))

    r_lo = max(radius, 1e-20)
    grid = (b, m_pad // mt)
    idx, cnt = pl.pallas_call(
        partial(_ball_query_kernel, n=n, nsample=nsample,
                nsample_pad=nsample_pad, r2=r_lo * r_lo),
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, 3, n_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, mt, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, mt, nsample_pad), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, mt, 128), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, m_pad, nsample_pad), jnp.int32),
            jax.ShapeDtypeStruct((b, m_pad, 128), jnp.int32),
        ),
        interpret=interpret,
    )(xyz_t, centers)
    return idx[:, :m, :nsample], cnt[:, :m, 0]
