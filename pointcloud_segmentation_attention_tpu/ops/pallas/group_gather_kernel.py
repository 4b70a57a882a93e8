"""Pallas TPU kernel: count-aware neighborhood gather (group_point).

Reference capability: ``tf_grouping_g.cu:40-78`` (``out[b,m,s,:] =
points[b, idx[b,m,s], :]``).  The XLA gather at the L1 shapes (B16, 8192 ->
1024 centers x 32 slots x 9ch) issues one descriptor per (m, s) slot — 524k
36-byte slices, ~4 ms, >98 % descriptor overhead (docs/performance.md).

This kernel exploits the ball-query padding rule: slots ``s >= cnt[m]`` all
repeat slot 0, and real chunk geometry gives ``cnt ~ 4`` of 32 — so only
``cnt`` rows per center are DISTINCT.  With the source resident in VMEM:

- one vector load + one broadcast store fills ALL ``nsample`` slots with the
  slot-0 row,
- a scalar loop issues only ``cnt - 1`` further row copies (VMEM -> VMEM,
  no HBM descriptors).

That is ~8x fewer dynamic row accesses than the dense gather, and every
access stays on-chip.  Indices and counts ride in SMEM so the scalar core
can drive addresses directly.

Gradient: the op carries a custom VJP (XLA scatter-add, the same transpose
``ops/geometry.group_point`` derives), so it is used at EVERY SA level via
``ops.group_point_with_counts`` — at level 1 the inputs are data and the
VJP is dead-code-eliminated; at deeper levels it is live.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Module-level knob for the scatter-add VJP's MXU ingest precision (None =
# backend default bf16 ingest; jax.lax.Precision.HIGHEST = f32-exact, see
# the note inside _scatter_add_kernel).  A module flag rather than a per-op
# arg because the op sits several layers below the model API.
VJP_PRECISION = None


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _group_gather_kernel(idx_ref, cnt_ref, src_ref, out_ref, *, mt: int,
                         nsample: int, c_pad: int):
    # idx_ref (Mt, nsample) SMEM i32; cnt_ref (Mt, 1) SMEM i32;
    # src_ref (N_pad, c_pad) VMEM; out_ref (Mt * nsample, c_pad) VMEM.
    def per_center(m, _):
        i0 = idx_ref[m, 0]
        row0 = src_ref[pl.ds(i0, 1), :]  # (1, c_pad)
        # Fill every slot with the slot-0 row (the CUDA padding rule makes
        # this correct for all s >= cnt; s < cnt are overwritten below).
        out_ref[pl.ds(m * nsample, nsample), :] = jnp.broadcast_to(
            row0, (nsample, c_pad)
        )
        c = jnp.minimum(cnt_ref[m, 0], nsample)

        def per_slot(s, _):
            out_ref[pl.ds(m * nsample + s, 1), :] = src_ref[
                pl.ds(idx_ref[m, s], 1), :
            ]
            return 0

        jax.lax.fori_loop(1, c, per_slot, 0)
        return 0

    jax.lax.fori_loop(0, mt, per_center, 0)


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def group_gather(points, idx, cnt, interpret=False):
    """(B,N,C), (B,M,ns) i32, (B,M) i32 -> (B,M,ns,C).

    Semantically identical to ``geometry.group_point(points, idx)`` GIVEN
    ball-query output (slots >= cnt repeat slot 0); ``cnt`` lets the kernel
    skip the repeated slots.
    """
    return _group_gather_fwd_impl(points, idx, cnt, interpret)


def _pick_center_tile(m: int, ns: int, c_pad: int) -> int:
    """Center-tile size: bounds SMEM (idx tile) AND the double-buffered VMEM
    out tile.  Mosaic double-buffers output blocks across grid steps, so the
    out tile (mt * ns * c_pad * 4 B) must stay <= ~4 MB or large-nsample
    shapes (e.g. cls MSG's 512 x 128-slot level) blow the 16 MB scoped-vmem
    stack — observed as a compile-time OOM at f32[8,65536,128].

    Mosaic also requires the SMEM idx block's second-to-last dim (mt) be a
    multiple of 8 unless it equals the array dim, so mt rounds DOWN to 8s
    (with an mt=8 floor) and non-divisible m is handled by center padding
    (m_pad), never by shrinking mt below 8 — an earlier halving loop
    degenerated to mt=2 at cls MSG's m=128/85-row bound and tripped the
    divisibility check."""
    if m <= 8:
        return m  # block == array dim: always a legal Mosaic block
    rows = (4 << 20) // (ns * c_pad * 4)
    return max(8, min(256, rows, m) // 8 * 8)


def _group_gather_fwd_impl(points, idx, cnt, interpret):
    b, n, c = points.shape
    m, ns = idx.shape[1], idx.shape[2]
    c_pad = _round_up(c, 128)
    n_pad = _round_up(n, 8)
    mt = _pick_center_tile(m, ns, c_pad)
    m_pad = _round_up(m, mt)

    src = points.astype(jnp.float32)
    if c_pad != c or n_pad != n:
        src = jnp.pad(src, ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    idx_p = idx.astype(jnp.int32)
    cnt_p = cnt.astype(jnp.int32)[..., None]
    if m_pad != m:
        idx_p = jnp.pad(idx_p, ((0, 0), (0, m_pad - m), (0, 0)))
        cnt_p = jnp.pad(cnt_p, ((0, 0), (0, m_pad - m), (0, 0)))

    out = pl.pallas_call(
        partial(_group_gather_kernel, mt=mt, nsample=ns, c_pad=c_pad),
        grid=(b, m_pad // mt),
        in_specs=[
            pl.BlockSpec((None, mt, ns), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, mt, 1), lambda i, j: (i, j, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((None, n_pad, c_pad), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, mt * ns, c_pad), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad * ns, c_pad), jnp.float32),
        interpret=interpret,
    )(idx_p, cnt_p, src)
    out = out.reshape(b, m_pad, ns, c_pad)[:, :m, :, :c]
    return out.astype(points.dtype)


def _group_gather_fwd(points, idx, cnt, interpret):
    # ``points`` rides in the residuals only for its shape/dtype (the
    # scatter-add transpose ignores its values); when no gradient is
    # requested (the L1 forward-only case) DCE drops it.
    return _group_gather_fwd_impl(points, idx, cnt, interpret), (idx, points)


def _scatter_add_kernel(idx_ref, g_ref, out_ref):
    # idx_ref (rt, 128) i32 (col 0 = target row); g_ref (rt, c_pad);
    # out_ref (n_pad, c_pad), accumulated over the row-tile grid dim.
    rt = idx_ref.shape[0]
    n_pad = out_ref.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rt, n_pad), 1)
    onehot = (lane == idx_ref[:, 0:1]).astype(jnp.float32)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # dP[t] += sum_r 1[idx_r == t] * g_r — the scatter-add as an MXU
    # matmul (contraction spec, not explicit transpose: Mosaic would
    # materialize onehot.T — see the interpolate kernel's bwd note).
    # Precision (advisor r3): VJP_PRECISION=HIGHEST makes the gradient
    # operand's ingest exact (the indicator operand is 0/1, exact either
    # way) and matches the f32 XLA scatter-add numerics — at a measured
    # +1.0 ms/step across SA2-4 at flagship shapes (21.0 -> 22.0 ms, r4)
    # for a 1.7e-3-relative gradient delta (bf16-MXU class, gradients not
    # parameters), so the default stays the fast MXU ingest; flip the
    # module flag for numerics-sensitive work.
    out_ref[...] += jax.lax.dot_general(
        onehot, g_ref[...], (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=VJP_PRECISION,
    )


def _scatter_add_mxu(flat_idx, flat_g, n, c, interpret):
    """sum-scatter flat_g (B, R, C) rows into (B, n, C) by flat_idx (B, R).

    XLA lowers the equivalent `.at[idx].add()` to a serialized per-row
    scatter (1.4 ms/step across SA2-4 at flagship shapes); with the target
    set small (<= ~2 k rows) the transpose is an indicator matmul that
    rides the MXU instead.  bf16-ingest precision class (as the MXU
    interpolate kernel; gradients, not parameters)."""
    b, r = flat_idx.shape
    n_pad = _round_up(n, 128)
    c_pad = _round_up(c, 128)
    rt = 512
    r_pad = _round_up(r, rt)
    # Padded rows: index 0 with zero update -> contribute nothing.
    i = jnp.pad(flat_idx.astype(jnp.int32)[..., None],
                ((0, 0), (0, r_pad - r), (0, 127)))
    gp = jnp.pad(flat_g.astype(jnp.float32),
                 ((0, 0), (0, r_pad - r), (0, c_pad - c)))
    out = pl.pallas_call(
        _scatter_add_kernel,
        grid=(b, r_pad // rt),
        in_specs=[
            pl.BlockSpec((None, rt, 128), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, rt, c_pad), lambda bi, ri: (bi, ri, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, n_pad, c_pad), lambda bi, ri: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(i, gp)
    return out[:, :n, :c]


def _mxu_scatter_supported(n, c) -> bool:
    n_pad = _round_up(n, 128)
    c_pad = _round_up(c, 128)
    # VMEM: onehot tile (512, n_pad) + out (n_pad, c_pad) + g tile.
    return (512 * n_pad + n_pad * c_pad + 512 * c_pad) * 4 <= (10 << 20)


def _group_gather_bwd(interpret, res, g):
    idx, points = res
    b, n, c = points.shape
    src_dtype = points.dtype
    flat_idx = idx.reshape(b, -1)
    flat_g = g.reshape(b, -1, c)
    if _mxu_scatter_supported(n, c):
        dpoints = _scatter_add_mxu(flat_idx, flat_g, n, c, interpret)
        return dpoints.astype(src_dtype), None, None
    # Scatter-add transpose (XLA path, same as geometry.group_point's VJP) —
    # for target sets too large for the indicator tile (e.g. SA1's 8192,
    # whose VJP is DCE'd in the flagship anyway: inputs carry no grad).
    dpoints = jax.vmap(
        lambda fi, fg: jnp.zeros((n, c), jnp.float32).at[fi].add(fg)
    )(flat_idx, flat_g.astype(jnp.float32)).astype(src_dtype)
    return dpoints, None, None


group_gather.defvjp(_group_gather_fwd, _group_gather_bwd)
