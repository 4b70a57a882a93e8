"""Pallas TPU kernel: ball query with first-nsample-in-order semantics.

Reference: ``tf_grouping_g.cu:3-36`` (one thread per center scanning all N
points in order).  TPU formulation:

- grid = (B, M/Mt): each program handles a (Mt, N) tile of the distance
  matrix, which is never materialized in HBM (the pure-XLA version streams
  (B, Mc, N) chunks through HBM + a top_k).
- In-radius mask -> in-order position via a log2(N) shift-add prefix sum
  along the lane axis.  The prefix sum is the kernel's hot loop (13 full-width
  rolls at N=8192), so it runs PACKED: two center rows share one i32 vector
  as independent 16-bit fields (counts <= N < 2^15, so field adds never
  carry), halving the rolled data.  The total hit count falls out of the last
  prefix lane for free.
- Slot extraction: for each output slot s, idx[:, s] = row-sum of
  lane_index * [mask & pos == s+1] — exactly one lane matches per row, so the
  sum is the index of the (s+1)-th in-radius point.  Padding slots (s >= cnt)
  are filled with the first hit, count clamped to nsample, empty -> 0.

(Measured alternatives, kept out: an iterative min-extract/clear loop with no
prefix sum at all carries a (Mt, N) tensor through the while_loop, which
Mosaic spills every iteration — 13.5 ms dense vs 7.3 ms for this form.)
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
    #
    # The Mt center rows are processed as two independent halves whose mask
    # prefix sums share one i32 vector (low/high 16-bit fields): the prefix
    # sum is the kernel's hot loop, and packing halves the rolled data.  The
    # halves are split at the REF level (sublane slices of live vectors crash
    # Mosaic's layout pass; ref slices are plain loads).
    mt = centers_ref.shape[0]
    n_pad = xyz_ref.shape[1]
    # Packing puts two rows' prefix counts in one i32 as 16-bit fields; that
    # is only carry-free while counts <= N < 2^15.  Larger N falls back to
    # the unpacked (one row per i32) prefix sum — slower but exact.
    # (An MXU blocked scan — per-128-lane-tile triangular bf16 matmul +
    # small inter-tile roll scan — was built and measured at 4.68 ms vs
    # 2.99 ms for this roll loop at the L1 shapes: the (h, N) <-> (h*N/128,
    # 128) relayouts cost more than the rolls save.  Reverted; see git
    # history and docs/performance.md.)
    packed = mt >= 16 and n < (1 << 15)  # halves must stay 8-sublane-aligned
    h = mt // 2 if packed else mt

    lane = jax.lax.broadcasted_iota(jnp.int32, (h, n_pad), 1)
    valid = lane < n
    px = xyz_ref[0:1, :]
    py = xyz_ref[1:2, :]
    pz = xyz_ref[2:3, :]

    def in_radius(row0):
        c = centers_ref[row0:row0 + h, :]
        dx = c[:, 0:1] - px
        dy = c[:, 1:2] - py
        dz = c[:, 2:3] - pz
        return (dx * dx + dy * dy + dz * dz < r2) & valid

    mask_lo = in_radius(0)
    if packed:
        mask_hi = in_radius(h)
        p = mask_lo.astype(jnp.int32) + (mask_hi.astype(jnp.int32) << 16)
    else:
        mask_hi = None
        p = mask_lo.astype(jnp.int32)

    # Prefix sum along lanes: pos[m, j] = # of in-radius points with index
    # <= j.  Counts <= N < 2^15, so the two 16-bit fields never carry.
    shift = 1
    while shift < n_pad:
        rolled = pltpu.roll(p, shift, axis=1)
        p = p + jnp.where(lane >= shift, rolled, 0)
        shift *= 2

    out_lane = jax.lax.broadcasted_iota(jnp.int32, (h, nsample_pad), 1)

    def finalize(pos, mask):
        # pos is nondecreasing along lanes, so its row max IS the hit count.
        cnt = jnp.minimum(jnp.max(pos, axis=1, keepdims=True), nsample)
        # Capped position: points beyond the first nsample are dropped.
        sel = jnp.where(mask & (pos <= nsample), pos, 0)  # 1-based, 0=none
        first_hit = jnp.sum(jnp.where(sel == 1, lane, 0), axis=1,
                            keepdims=True)  # (h, 1); 0 when no hits
        init = jnp.where(out_lane < nsample,
                         jnp.broadcast_to(first_hit, (h, nsample_pad)), 0)
        return cnt, sel, init

    cnt_lo, sel_lo, init_lo = finalize(p & 0xFFFF if packed else p, mask_lo)
    if packed:
        cnt_hi, sel_hi, init_hi = finalize(p >> 16, mask_hi)
        cnt_max = jnp.maximum(jnp.max(cnt_lo), jnp.max(cnt_hi))
    else:
        cnt_hi = sel_hi = init_hi = None
        cnt_max = jnp.max(cnt_lo)

    # Slot extraction, bounded by the tile's max hit count: every slot s >=
    # cnt[m] is a repeat of the first hit (the CUDA padding rule), so only
    # slots < max(cnt) need a lane reduction at all.  With sparse balls (the
    # common case: ~4 hits among 8192 points at SA level 1 on real chunk
    # geometry) this turns 32 full-width reduction passes into ~4.
    def extract(sel, cnt, idxs, s):
        idx_s = jnp.sum(jnp.where(sel == s + 1, lane, 0), axis=1,
                        keepdims=True)
        return jnp.where((out_lane == s) & (cnt > s), idx_s, idxs)

    if packed:
        def slot_body(state):
            s, ilo, ihi = state
            return s + 1, extract(sel_lo, cnt_lo, ilo, s), \
                extract(sel_hi, cnt_hi, ihi, s)

        _, idxs_lo, idxs_hi = jax.lax.while_loop(
            lambda state: state[0] < cnt_max, slot_body,
            (jnp.int32(1), init_lo, init_hi),
        )
        idx_ref[0:h, :] = idxs_lo
        idx_ref[h:mt, :] = idxs_hi
        cnt_ref[0:h, :] = jnp.broadcast_to(cnt_lo, (h, cnt_ref.shape[1]))
        cnt_ref[h:mt, :] = jnp.broadcast_to(cnt_hi, (h, cnt_ref.shape[1]))
    else:
        def slot_body(state):
            s, idxs = state
            return s + 1, extract(sel_lo, cnt_lo, idxs, s)

        _, idxs = jax.lax.while_loop(
            lambda state: state[0] < cnt_max, slot_body,
            (jnp.int32(1), init_lo),
        )
        idx_ref[...] = idxs
        cnt_ref[...] = jnp.broadcast_to(cnt_lo, cnt_ref.shape)


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
