"""Pure-XLA point-cloud geometry ops.

TPU-native equivalents of the reference's custom CUDA/C++ TF ops
(``pointnet2_tensorflow/tf_ops/{sampling,grouping,interpolation_3d}``), written
as jittable JAX functions over static-shape ``(B, N, 3)`` / ``(B, N, C)``
tensors.  These are the semantic source of truth: the Pallas kernels in
``ops/pallas/`` are tested against them, and they double as fallbacks on
CPU/GPU backends.

Exact-parity notes vs the reference:

- ``farthest_point_sample`` — seeds at index 0 and iteratively picks the argmax
  of the running min-squared-distance, like
  ``tf_ops/sampling/tf_sampling_g.cu:105-170`` (``farthestpointsamplingKernel``).
- ``ball_query`` — selects the FIRST ``nsample`` points in index order with
  euclidean distance ``max(d, 1e-20) < radius`` and pads all slots with the
  first hit, returning the clamped in-radius count, like
  ``tf_ops/grouping/tf_grouping_g.cu:3-36`` (``query_ball_point_gpu``).
- ``three_nn`` — 3 nearest neighbors by *squared* distance (no sqrt), like
  ``tf_ops/interpolation_3d/tf_interpolate.cpp:60-103``.
- ``group_point`` / ``gather_point`` / ``three_interpolate`` — gathers whose
  autodiff transpose is XLA's deterministic scatter-add, replacing the
  reference's ``atomicAdd`` gradient kernels
  (``tf_grouping_g.cu:40-78``, ``tf_sampling_g.cu:172-192``,
  ``tf_interpolate.cpp:107-153``).

Large pairwise-distance intermediates are tiled with ``lax.map`` over query
chunks so nothing bigger than ``_MAX_CHUNK_ELEMS`` is ever materialized —
shapes stay static, XLA fuses the distance computation into the reduction.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax

# Budget (elements) for a single (B, M_chunk, N) distance tile. 2**23 f32 = 32 MiB.
_MAX_CHUNK_ELEMS = 2 ** 23


def _pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances between point sets.

    a: (..., M, 3), b: (..., N, 3) -> (..., M, N).  Uses the expanded-difference
    form (not the |a|^2 - 2ab + |b|^2 trick) for better numerics near zero,
    which matters for the d < radius test on coincident points.
    """
    diff = a[..., :, None, :] - b[..., None, :, :]
    return jnp.sum(diff * diff, axis=-1)


def _chunk_queries(m: int, b: int, n: int) -> int:
    """Pick a query-axis chunk size keeping B*chunk*N under the element budget."""
    per_query = max(b * n, 1)
    chunk = max(1, min(m, _MAX_CHUNK_ELEMS // per_query))
    # Round down to a divisor-friendly size; we pad to a multiple anyway.
    return chunk


def _map_over_query_chunks(fn, queries: jnp.ndarray, chunk: int):
    """Apply fn to (B, chunk, ...) slices of queries (B, M, ...), re-concatenate.

    Pads M up to a multiple of chunk (results for the padding are sliced off).
    fn must return arrays whose leading dims are (B, chunk).
    """
    b, m = queries.shape[0], queries.shape[1]
    num_chunks = -(-m // chunk)
    pad = num_chunks * chunk - m
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[:, :1], (b, pad) + queries.shape[2:])],
            axis=1,
        )
    # (num_chunks, B, chunk, ...)
    stacked = jnp.moveaxis(
        queries.reshape(b, num_chunks, chunk, *queries.shape[2:]), 1, 0
    )
    out = lax.map(fn, stacked)
    out = jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, 1).reshape(b, num_chunks * x.shape[2], *x.shape[3:])[:, :m],
        out,
    )
    return out


@partial(jax.jit, static_argnums=(1,))
def farthest_point_sample(xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """Iterative farthest point sampling.

    Args:
      xyz: (B, N, 3) float point coordinates.
      npoint: number of points to select (static).

    Returns:
      (B, npoint) int32 indices into N.  idx[:, 0] == 0 (seeded at the first
      point, matching ``tf_sampling_g.cu:118-121``); subsequent picks maximize
      the running minimum squared distance to the chosen set.
    """
    b, n, _ = xyz.shape
    if npoint < 1:
        raise ValueError("npoint must be >= 1")
    xyz = xyz.astype(jnp.float32)

    def body(carry, _):
        min_d2, last = carry  # (B, N), (B,)
        last_pt = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d2 = jnp.sum((xyz - last_pt) ** 2, axis=-1)  # (B, N)
        min_d2 = jnp.minimum(min_d2, d2)
        nxt = jnp.argmax(min_d2, axis=-1).astype(jnp.int32)
        return (min_d2, nxt), nxt

    init = (jnp.full((b, n), 1e38, jnp.float32), jnp.zeros((b,), jnp.int32))
    if npoint == 1:
        return jnp.zeros((b, 1), jnp.int32)
    (_, _), picks = lax.scan(body, init, None, length=npoint - 1)
    first = jnp.zeros((b, 1), jnp.int32)
    return jnp.concatenate([first, picks.T], axis=1)


def gather_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, m, :] = points[b, idx[b, m], :].

    points: (B, N, C), idx: (B, M) int -> (B, M, C).  Differentiable w.r.t.
    points (transpose = deterministic scatter-add; reference:
    ``tf_sampling.py:44-48`` + ``tf_sampling_g.cu:180-192``).
    """
    return jnp.take_along_axis(points, idx[..., None], axis=1)


def group_point(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, m, k, :] = points[b, idx[b, m, k], :].

    points: (B, N, C), idx: (B, M, K) int -> (B, M, K, C).  Differentiable
    w.r.t. points (reference: ``tf_grouping.py:42-46``).
    """
    b, m, k = idx.shape
    flat = jnp.take_along_axis(points, idx.reshape(b, m * k)[..., None], axis=1)
    return flat.reshape(b, m, k, points.shape[-1])


@partial(jax.jit, static_argnums=(2, 3))
def ball_query(
    xyz: jnp.ndarray, new_xyz: jnp.ndarray, radius: float, nsample: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fixed-radius neighborhood query with first-k-in-order semantics.

    For each query center, returns the indices of the first ``nsample`` points
    (in ascending point index) whose euclidean distance (clamped to >= 1e-20)
    is strictly less than ``radius``.  Slots beyond the in-radius count are
    padded with the first hit.  If a center has no in-radius point at all
    (cannot happen when centers are drawn from the point set) the padding is 0.

    Args:
      xyz: (B, N, 3) points to search.
      new_xyz: (B, M, 3) query centers.
      radius: ball radius (static).
      nsample: neighbors per center (static).

    Returns:
      idx: (B, M, nsample) int32, pts_cnt: (B, M) int32 in [0, nsample].

    Reference: ``tf_grouping_g.cu:3-36``; order-dependence is part of the
    contract — downstream attention pooling uses group element 0 as its query.
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    r2_lo = max(radius, 1e-20)  # d clamped to 1e-20 before the compare
    xyz = xyz.astype(jnp.float32)

    k_eff = min(nsample, n)  # nsample may exceed the point count

    def one_chunk(centers: jnp.ndarray):
        # centers: (B, Mc, 3)
        d2 = _pairwise_sqdist(centers.astype(jnp.float32), xyz)  # (B, Mc, N)
        mask = d2 < (r2_lo * r2_lo)
        j = lax.broadcasted_iota(jnp.int32, mask.shape, dimension=2)
        # Key: in-radius points keep their index, others get N (sorted last).
        key = jnp.where(mask, j, n)
        # top_k of -key = k_eff smallest keys, ascending after negation.
        neg_sorted, _ = lax.top_k(-key, k_eff)
        idx_sorted = -neg_sorted  # (B, Mc, k_eff), ascending j, invalid == n
        if k_eff < nsample:
            idx_sorted = jnp.concatenate(
                [idx_sorted,
                 jnp.full(idx_sorted.shape[:-1] + (nsample - k_eff,), n,
                          idx_sorted.dtype)], axis=-1,
            )
        valid = idx_sorted < n
        first = idx_sorted[..., :1]
        first = jnp.where(first < n, first, 0)
        idx = jnp.where(valid, idx_sorted, first).astype(jnp.int32)
        cnt = jnp.minimum(jnp.sum(mask, axis=-1), nsample).astype(jnp.int32)
        return idx, cnt

    chunk = _chunk_queries(m, b, n)
    if chunk >= m:
        return one_chunk(new_xyz)
    return _map_over_query_chunks(one_chunk, new_xyz, chunk)


@partial(jax.jit, static_argnums=(0,))
def knn_point(
    k: int, xyz: jnp.ndarray, new_xyz: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """k nearest neighbors of each query center among xyz.

    Args:
      k: neighbor count (static).
      xyz: (B, N, 3) points to search.
      new_xyz: (B, M, 3) query centers.

    Returns:
      dist: (B, M, k) squared distances (ascending), idx: (B, M, k) int32.

    Reference: ``tf_grouping.py:48-73`` (full pairwise distance matrix +
    ``SelectionSort`` partial sort, which is stable — ``lax.top_k`` matches).
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    xyz = xyz.astype(jnp.float32)

    k_eff = min(k, n)

    def one_chunk(centers: jnp.ndarray):
        d2 = _pairwise_sqdist(centers.astype(jnp.float32), xyz)  # (B, Mc, N)
        neg_top, idx = lax.top_k(-d2, k_eff)
        dist, idx = -neg_top, idx.astype(jnp.int32)
        if k_eff < k:
            # Fewer points than requested neighbors: repeat the farthest.
            pad = k - k_eff
            dist = jnp.concatenate(
                [dist, jnp.repeat(dist[..., -1:], pad, axis=-1)], axis=-1
            )
            idx = jnp.concatenate(
                [idx, jnp.repeat(idx[..., -1:], pad, axis=-1)], axis=-1
            )
        return dist, idx

    chunk = _chunk_queries(m, b, n)
    if chunk >= m:
        return one_chunk(new_xyz)
    return _map_over_query_chunks(one_chunk, new_xyz, chunk)


@jax.jit
def three_nn(xyz1: jnp.ndarray, xyz2: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """3 nearest neighbors of each "unknown" point among the "known" points.

    Args:
      xyz1: (B, N, 3) unknown (dense) points.
      xyz2: (B, M, 3) known (sparse) points, M >= 3.

    Returns:
      dist: (B, N, 3) *squared* distances ascending, idx: (B, N, 3) int32.

    Reference: ``tf_interpolate.cpp:60-103`` (CPU brute force, squared dists).
    """
    b, m = xyz2.shape[0], xyz2.shape[1]
    n = xyz1.shape[1]
    xyz2 = xyz2.astype(jnp.float32)
    k_eff = min(3, m)

    def one_chunk(unknown: jnp.ndarray):
        d2 = _pairwise_sqdist(unknown.astype(jnp.float32), xyz2)  # (B, Nc, M)
        neg_top, idx = lax.top_k(-d2, k_eff)
        dist, idx = -neg_top, idx.astype(jnp.int32)
        if k_eff < 3:
            # Fewer than 3 known points: pad with index 0 / dist 1e40, matching
            # the reference's insertion-sort initialization
            # (tf_interpolate.cpp:64-69) — the huge distance makes the padded
            # neighbors' interpolation weights vanish.
            pad = 3 - k_eff
            big = jnp.finfo(dist.dtype).max  # ref uses 1e40 double; f32-safe
            dist = jnp.concatenate(
                [dist, jnp.full(dist.shape[:-1] + (pad,), big, dist.dtype)], axis=-1
            )
            idx = jnp.concatenate(
                [idx, jnp.zeros(idx.shape[:-1] + (pad,), idx.dtype)], axis=-1
            )
        return dist, idx

    chunk = _chunk_queries(n, b, m)
    if chunk >= n:
        return one_chunk(xyz1)
    return _map_over_query_chunks(one_chunk, xyz1, chunk)


def three_interpolate(
    points: jnp.ndarray, idx: jnp.ndarray, weight: jnp.ndarray
) -> jnp.ndarray:
    """Weighted interpolation from 3 neighbors: out = sum_k w_k * points[idx_k].

    Args:
      points: (B, M, C) known features.
      idx: (B, N, 3) int neighbor indices into M.
      weight: (B, N, 3) interpolation weights.

    Returns:
      (B, N, C).  Differentiable w.r.t. points and weight (reference:
      ``tf_interpolate.py:29-34`` + ``tf_interpolate.cpp:191-262``).
    """
    gathered = group_point(points, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interpolation_weights(
    dist: jnp.ndarray, eps: float = 1e-10
) -> jnp.ndarray:
    """Inverse-distance weights over the 3 neighbors, normalized to sum to 1.

    dist: (B, N, 3) squared distances -> (B, N, 3) weights.
    Reference: ``pointnet_util.py:218-223`` (dist = max(dist, 1e-10), w = (1/d)/sum(1/d)).
    """
    dist = jnp.maximum(dist, eps)
    inv = 1.0 / dist
    return inv / jnp.sum(inv, axis=-1, keepdims=True)


def prob_sample(cdf_weights: jnp.ndarray, uniforms: jnp.ndarray) -> jnp.ndarray:
    """Weighted categorical sampling via inverse-CDF search.

    Args:
      cdf_weights: (B, N) non-negative weights (need not be normalized).
      uniforms: (B, M) uniform samples in [0, 1).

    Returns:
      (B, M) int32 sampled indices.

    Reference: ``tf_sampling_g.cu:7-104`` (``cumsumKernel`` + ``binarysearchKernel``).
    """
    cdf = jnp.cumsum(cdf_weights.astype(jnp.float32), axis=-1)
    total = cdf[..., -1:]
    targets = uniforms.astype(jnp.float32) * total
    idx = jax.vmap(partial(jnp.searchsorted, side="left"))(cdf, targets)
    return jnp.clip(idx, 0, cdf_weights.shape[-1] - 1).astype(jnp.int32)
