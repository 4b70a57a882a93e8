"""Pallas TPU kernel: farthest point sampling.

The reference's CUDA kernel (``tf_sampling_g.cu:105-170``) keeps the running
min-distance array in shared memory and does a block-wide max reduction per
selected point.  The TPU formulation keeps the whole per-cloud state in VMEM:

- grid = (B,): one program per cloud.
- xyz is laid out coordinate-major (B, 3, N) so each coordinate is a lane
  vector; N padded to a lane multiple with -inf min-distance sentinels.
- A fori_loop over the m-1 selections runs entirely on vector ops (Mosaic
  forbids scalar VMEM stores / dynamic-lane loads): the last pick's
  coordinates come from masked lane reductions, the new pick from a
  max + first-matching-lane reduction, and the output row is updated with a
  masked vector store.  Zero HBM traffic inside the loop — the pure-XLA scan
  version re-reads/writes the (B, N) min-distance array from HBM every
  iteration.

Semantics match the reference exactly: seed index 0, argmax of the running
min-squared-distance with first-index tie-breaking.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _fps_kernel(xyz_ref, out_ref, mind_ref, *, npoint: int, n: int):
    # xyz_ref: (3, Bp, Np) VMEM; out_ref: (Bp, npoint_p) int32 VMEM;
    # mind_ref: (Bp, Np) f32 scratch.  The whole batch is processed in ONE
    # program with clouds stacked in the sublane dimension: the selection loop
    # is latency-bound (npoint sequential reductions), so vectorizing over B
    # cuts loop trips B-fold vs a per-cloud grid (which Mosaic runs serially
    # on the single TensorCore).
    b_pad, n_pad = mind_ref.shape
    npoint_pad = out_ref.shape[1]
    lane = jax.lax.broadcasted_iota(jnp.int32, (b_pad, n_pad), 1)
    out_lane = jax.lax.broadcasted_iota(jnp.int32, (b_pad, npoint_pad), 1)
    valid = lane < n
    mind_ref[...] = jnp.where(valid, 1e38, -jnp.inf)
    out_ref[...] = jnp.zeros((b_pad, npoint_pad), jnp.int32)

    xr = xyz_ref[0]
    yr = xyz_ref[1]
    zr = xyz_ref[2]

    def body(j, old):
        # old: (Bp, 1) last pick per cloud.
        sel = lane == old
        x0 = jnp.sum(jnp.where(sel, xr, 0.0), axis=1, keepdims=True)
        y0 = jnp.sum(jnp.where(sel, yr, 0.0), axis=1, keepdims=True)
        z0 = jnp.sum(jnp.where(sel, zr, 0.0), axis=1, keepdims=True)
        dx = xr - x0
        dy = yr - y0
        dz = zr - z0
        d2 = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[...], jnp.where(valid, d2, -jnp.inf))
        mind_ref[...] = mind
        # Per-row argmax with first-index tie-break.
        best = jnp.max(mind, axis=1, keepdims=True)
        nxt = jnp.min(
            jnp.where(mind == best, lane, n_pad), axis=1, keepdims=True
        ).astype(jnp.int32)
        out_ref[...] = jnp.where(out_lane == j, nxt, out_ref[...])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((b_pad, 1), jnp.int32))


@partial(jax.jit, static_argnums=(1, 2))
def farthest_point_sample_pallas(
    xyz: jnp.ndarray, npoint: int, interpret: bool = False
) -> jnp.ndarray:
    """(B, N, 3) f32 -> (B, npoint) int32, reference FPS semantics."""
    b, n, _ = xyz.shape
    n_pad = _round_up(n, 128)
    npoint_pad = _round_up(npoint, 128)
    # Batch tile: keep ~8 (Bt, Np) f32 temporaries within the VMEM budget.
    bt = 8
    while bt * 2 <= min(_round_up(b, 8), (10 << 20) // (8 * 4 * n_pad) or 8):
        bt *= 2
    b_pad = _round_up(b, bt)
    # Coordinate-major layout: (3, Bp, Np).
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (2, 0, 1))
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, b_pad - b), (0, n_pad - n)))

    out = pl.pallas_call(
        partial(_fps_kernel, npoint=npoint, n=n),
        grid=(b_pad // bt,),
        in_specs=[
            pl.BlockSpec((3, bt, n_pad), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bt, npoint_pad), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, npoint_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((bt, n_pad), jnp.float32)],
        interpret=interpret,
    )(xyz_t)
    return out[:b, :npoint]
