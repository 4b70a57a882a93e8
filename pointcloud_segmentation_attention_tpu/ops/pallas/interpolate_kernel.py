"""Pallas TPU kernel: three_interpolate as a weighted-indicator matmul.

The XLA formulation gathers 3 neighbor rows per dense point and weights them —
half a million sub-tile gathers per step at ScanNet scale.  On TPU the same
computation is an MXU matmul: build W[m, j] = sum_k w_k * [idx_k == j]
(each dense point's sparse row over the known points) in VMEM and compute
``out = W @ P``.  The backward pass is two more matmuls of the same shape
(dP = W^T dG, and dw_k = (dG P^T)[m, idx_k]), so the whole FP interpolation
(fwd + bwd) rides the systolic array instead of the scatter/gather units.

Falls back to the XLA gather implementation for shapes where the indicator
tile would not fit VMEM (see ``three_interpolate`` dispatch).

Precision note: on TPU the MXU ingests f32 operands as bf16 by default (f32
accumulation), so results differ from the gather formulation by ~0.1-0.5 %
relative — the same precision class as standard bf16 training, and well
within the tolerance-based parity the reference itself affords (its CPU op
accumulated in f64; SURVEY.md 'CPU-op parity trap').
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _build_w(idx_ref, w_ref, mt, n_pad):
    lane = jax.lax.broadcasted_iota(jnp.int32, (mt, n_pad), 1)
    w = jnp.zeros((mt, n_pad), jnp.float32)
    for k in range(3):
        w = w + jnp.where(lane == idx_ref[:, k:k + 1], w_ref[:, k:k + 1], 0.0)
    return w


def _fwd_kernel(points_ref, idx_ref, w_ref, out_ref):
    # points_ref: (N_pad, C_pad); idx_ref: (Mt, 128) i32; w_ref: (Mt, 128) f32;
    # out_ref: (Mt, C_pad).
    mt = idx_ref.shape[0]
    n_pad = points_ref.shape[0]
    w = _build_w(idx_ref, w_ref, mt, n_pad)
    out_ref[...] = jnp.dot(w, points_ref[...], preferred_element_type=jnp.float32)


def _bwd_kernel(idx_ref, w_ref, g_ref, points_ref, dpoints_ref, dw_ref):
    # Accumulates dP over the m-tile grid dimension; computes dw per tile.
    mt = idx_ref.shape[0]
    n_pad = points_ref.shape[0]
    w = _build_w(idx_ref, w_ref, mt, n_pad)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dpoints_ref[...] = jnp.zeros_like(dpoints_ref)

    g = g_ref[...]  # (Mt, C_pad)
    # dot_general with contracting dims instead of explicit .T: Mosaic
    # materializes in-kernel transposes (measured 2.97 ms for this kernel at
    # the FP4 shapes with w.T / points.T), while a contraction spec feeds the
    # MXU directly.
    dpoints_ref[...] += jax.lax.dot_general(
        w, g, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Np, C_pad)
    # dw_k[m] = <g[m], P[idx_k[m]]> = (g @ P^T)[m, idx_k[m]]
    gpt = jax.lax.dot_general(
        g, points_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (Mt, Np)
    lane = jax.lax.broadcasted_iota(jnp.int32, (mt, n_pad), 1)
    dw = jnp.zeros((mt, 128), jnp.float32)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (mt, 128), 1)
    for k in range(3):
        val = jnp.sum(
            jnp.where(lane == idx_ref[:, k:k + 1], gpt, 0.0), axis=1,
            keepdims=True,
        )
        dw = jnp.where(out_lane == k, val, dw)
    dw_ref[...] = dw


def _pad_inputs(points, idx, weight):
    b, n, c = points.shape
    m = idx.shape[1]
    n_pad = _round_up(n, 128)
    c_pad = _round_up(c, 128)
    budget_rows = (4 << 20) // (4 * n_pad)
    mt = 8
    while mt * 2 <= min(budget_rows, 512, max(m, 8)):
        mt *= 2
    m_pad = _round_up(m, mt)
    p = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, c_pad - c)))
    # Padded rows get index 0 / weight 0 -> contribute nothing.
    i = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, m_pad - m), (0, 128 - 3)))
    w = jnp.pad(weight.astype(jnp.float32), ((0, 0), (0, m_pad - m), (0, 128 - 3)))
    return p, i, w, mt, m_pad, n_pad, c_pad


def _fwd(points, idx, weight, interpret):
    b, n, c = points.shape
    m = idx.shape[1]
    p, i, w, mt, m_pad, n_pad, c_pad = _pad_inputs(points, idx, weight)
    out = pl.pallas_call(
        _fwd_kernel,
        grid=(b, m_pad // mt),
        in_specs=[
            pl.BlockSpec((None, n_pad, c_pad), lambda bi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, mt, 128), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, mt, 128), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, mt, c_pad), lambda bi, mi: (bi, mi, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m_pad, c_pad), jnp.float32),
        interpret=interpret,
    )(p, i, w)
    return out[:, :m, :c]


@partial(jax.custom_vjp, nondiff_argnums=(3,))
def three_interpolate_pallas(points, idx, weight, interpret=False):
    """out[b,m,:] = sum_k weight[b,m,k] * points[b, idx[b,m,k], :].

    MXU formulation; differentiable w.r.t. points and weight.
    """
    return _fwd(points, idx, weight, interpret)


def _vjp_fwd(points, idx, weight, interpret):
    return _fwd(points, idx, weight, interpret), (points, idx, weight)


def _vjp_bwd(interpret, residuals, g):
    points, idx, weight = residuals
    b, n, c = points.shape
    m = idx.shape[1]
    p, i, w, mt, m_pad, n_pad, c_pad = _pad_inputs(points, idx, weight)
    g_pad = jnp.pad(
        g.astype(jnp.float32), ((0, 0), (0, m_pad - m), (0, c_pad - c))
    )
    dpoints, dw = pl.pallas_call(
        _bwd_kernel,
        grid=(b, m_pad // mt),
        in_specs=[
            pl.BlockSpec((None, mt, 128), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, mt, 128), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, mt, c_pad), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, n_pad, c_pad), lambda bi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((None, n_pad, c_pad), lambda bi, mi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, mt, 128), lambda bi, mi: (bi, mi, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, n_pad, c_pad), jnp.float32),
            jax.ShapeDtypeStruct((b, m_pad, 128), jnp.float32),
        ),
        interpret=interpret,
    )(i, w, g_pad, p)
    return (
        dpoints[:, :n, :c].astype(points.dtype),
        None,
        dw[:, :m, :3].astype(weight.dtype),
    )


three_interpolate_pallas.defvjp(_vjp_fwd, _vjp_bwd)


def pallas_interpolate_supported(points, idx) -> bool:
    """VMEM feasibility: indicator tile + points must fit."""
    n, c = points.shape[1], points.shape[2]
    n_pad = _round_up(n, 128)
    c_pad = _round_up(c, 128)
    return n_pad * c_pad * 4 <= (6 << 20) and n_pad * 4 * 512 <= (6 << 20)
