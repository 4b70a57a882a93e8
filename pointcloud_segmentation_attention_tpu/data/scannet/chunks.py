"""Scene chunkers: random training cuboids + full-coverage eval grids.

Host-side numpy equivalents of the reference's TF-graph chunk samplers:

- ``sample_random_chunk``  — ref ``attention_points/scannet_dataset/
  data_transformation.py:70-154`` (``get_subset``): random 1.5 x 1.5 m x
  full-height cuboid with a 0.2 m context margin, validity-checked
  (>= 70 % labeled, >= 2 % voxel occupancy on a 31x31x62 grid), <= 10 retries,
  exactly ``npoints`` sampled with replacement, per-point weight =
  class_weight x in-inner-box mask (:152-153).
- ``full_scene_chunks``    — ref ``complete_scene_loader.py:4-117``
  ("smarter scene subsets"): grid of 1.5 m cells with 0.2 m context margin,
  per-cell shuffle keeping the inverse order, ceil(len/npoints) chunks
  covering *every* point, ragged tail filled with random repeats that are
  masked out; returns per-chunk masks + original vertex indices.
- ``map_back``             — ref ``benchmark/generate_predictions.py:19-37``:
  inverse-shuffle scatter of masked chunk values back to original vertex ids.

The reference ran the random sampler inside the TF graph (tf.cond retry
chains) and found it slow enough to precompute (Report.pdf §3.3); here it is
plain numpy feeding fixed-shape device batches, per SURVEY.md §7.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet.label_map import (
    TRAIN_LABEL_WEIGHTS,
)

CHUNK_SIZE = 1.5       # xy extent of a chunk/cell in meters (ref :98)
CONTEXT_MARGIN = 0.2   # context padding around the inner box (ref :99)
# Both are DEFAULTS, not constants: every chunker below takes
# ``chunk_size``/``margin`` overrides so the reference's context-margin
# ablation (Report.pdf Table 4: margin 0 vs 0.2 is its +2.7-pt headline
# mechanism, ref complete_scene_loader.py:31-42) is a knob, not a fork.
MIN_LABELED_FRACTION = 0.7    # validity: fraction of annotated points (ref :120)
MIN_VOXEL_OCCUPANCY = 0.02    # validity: occupied voxel fraction (ref :127-138)
OCCUPANCY_GRID = (31, 31, 62)  # validity voxel grid (ref :127)
MAX_TRIES = 10                 # retry budget (ref :139-141)


def check_grid_geometry(chunk_size: float, margin: float) -> None:
    """Validate the grid-chunker geometry knob.

    Every grid chunker (host, native C++, and the device twin in
    eval/resident_serving.py) enumerates only the 2x2 cell neighborhood of
    a point's margin-shifted cell, which covers all memberships iff
    ``2*margin <= chunk_size``.  A larger margin would need a wider
    neighborhood; without this check it would silently DROP the
    further-away context members (home coverage stays exact, so nothing
    else errors) and quietly corrupt a margin-ablation result."""
    if not (chunk_size > 0):
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")
    if margin < 0:
        raise ValueError(f"context margin must be >= 0, got {margin}")
    if 2.0 * margin > chunk_size:
        raise ValueError(
            f"context margin {margin} too large for chunk_size "
            f"{chunk_size}: the grid chunkers enumerate a 2x2 cell "
            "neighborhood, which requires 2*margin <= chunk_size"
        )


def _points_in_box(xy: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    return ((xy >= lo) & (xy <= hi)).all(axis=1)


def _voxel_occupancy(pts: np.ndarray) -> float:
    """Fraction of occupied voxels on the validity grid (ref :127-138)."""
    if len(pts) == 0:
        return 0.0
    lo = pts.min(axis=0)
    extent = np.maximum(pts.max(axis=0) - lo, 1e-6)
    grid = np.array(OCCUPANCY_GRID, np.float64)
    cell = np.minimum((pts - lo) / extent * grid, grid - 1).astype(np.int64)
    flat = (cell[:, 0] * OCCUPANCY_GRID[1] + cell[:, 1]) * OCCUPANCY_GRID[2] + cell[:, 2]
    return len(np.unique(flat)) / float(np.prod(OCCUPANCY_GRID))


def sample_random_chunk(
    points: np.ndarray,
    labels: np.ndarray,
    colors: Optional[np.ndarray],
    normals: Optional[np.ndarray],
    npoints: int,
    rng: np.random.RandomState,
    weight_table: Optional[np.ndarray] = None,
    chunk_size: float = CHUNK_SIZE,
    margin: float = CONTEXT_MARGIN,
) -> Tuple[np.ndarray, np.ndarray, Optional[np.ndarray], Optional[np.ndarray], np.ndarray]:
    """Random training cuboid (ref data_transformation.py:70-154).

    Returns ``(points, labels, colors, normals, weights)`` with exactly
    ``npoints`` rows; ``colors``/``normals`` pass through as None when absent.
    ``weights[i] = weight_table[labels[i]] * (point i inside the inner box)``.
    """
    if weight_table is None:
        weight_table = TRAIN_LABEL_WEIGHTS
    xy = points[:, :2]
    half = chunk_size / 2.0
    sel = None
    inner = None
    for _ in range(MAX_TRIES):
        center = xy[rng.randint(len(points))]
        lo, hi = center - half, center + half
        cand = np.flatnonzero(_points_in_box(xy, lo - margin, hi + margin))
        if len(cand) == 0:
            continue
        sel = cand
        inner = _points_in_box(xy[cand], lo, hi)
        labeled_frac = float((labels[cand] > 0).mean())
        if labeled_frac < MIN_LABELED_FRACTION:
            continue
        if _voxel_occupancy(points[cand]) < MIN_VOXEL_OCCUPANCY:
            continue
        break
    if sel is None:  # degenerate scene: fall back to everything
        sel = np.arange(len(points))
        inner = np.ones(len(points), bool)

    take = rng.choice(len(sel), npoints, replace=True)
    idx = sel[take]
    weights = (weight_table[labels[idx]] * inner[take]).astype(np.float32)
    return (
        points[idx].astype(np.float32),
        labels[idx].astype(np.int32),
        colors[idx] if colors is not None else None,
        normals[idx].astype(np.float32) if normals is not None else None,
        weights,
    )


@dataclasses.dataclass
class ChunkSet:
    """Fixed-shape chunks covering a whole scene (ref complete_scene_loader).

    ``masks[x, i]`` is True iff slot ``i`` of chunk ``x`` is a *real* point
    whose home cell is this chunk's cell (not context margin, not tail fill);
    every original vertex is mask-True in exactly one slot, so
    ``map_back(values, orig_idx, masks, n)`` is a faithful inverse shuffle.
    """
    points: np.ndarray              # (X, npoints, 3) float32
    features: List[np.ndarray]      # each (X, npoints, ...) in input order
    masks: np.ndarray               # (X, npoints) bool
    orig_idx: np.ndarray            # (X, npoints) int64
    weights: Optional[np.ndarray]   # (X, npoints) float32 | None


def full_scene_chunks(
    points: np.ndarray,
    features: Sequence[np.ndarray],
    get_sample_weights: bool,
    npoints: int,
    rng: np.random.RandomState,
    weight_table: Optional[np.ndarray] = None,
    chunk_size: float = CHUNK_SIZE,
    margin: float = CONTEXT_MARGIN,
) -> ChunkSet:
    """Full-coverage grid chunks with context margins
    (ref complete_scene_loader.py:4-117).

    ``features[0]`` must be the per-point labels when
    ``get_sample_weights=True`` (weights = weight_table[label] x mask).
    """
    check_grid_geometry(chunk_size, margin)
    if weight_table is None:
        weight_table = TRAIN_LABEL_WEIGHTS
    from pointcloud_segmentation_attention_tpu import native

    xy = points[:, :2]
    # (cell, point) membership pairs for margin-enlarged cells — O(N) in C++
    # (numpy fallback inside), replacing an O(cells x N) box scan.
    cells, pids, ncx, ncy = native.grid_chunk_assign(
        points, cell=chunk_size, margin=margin
    )
    # Home cell of every point (exact partition; boundary points clip into
    # the last cell, which the margin-enlarged enumeration always contains).
    xy_min = xy.min(axis=0)
    home = np.minimum(
        (xy - xy_min) // chunk_size, [ncx - 1, ncy - 1]
    ).astype(np.int64)
    home_id = home[:, 0] * ncy + home[:, 1]

    sort = np.argsort(cells, kind="stable")
    cells_s, pids_s = cells[sort], pids[sort]
    uniq, starts = np.unique(cells_s, return_index=True)
    bounds = np.append(starts, len(cells_s))

    out_points, out_feats, out_mask, out_idx = [], [], [], []
    for ui, cid in enumerate(uniq):
        member = pids_s[bounds[ui]:bounds[ui + 1]]
        inner = home_id[member] == cid
        if not inner.any():
            continue  # margin-only cell: its points are inner elsewhere
        order = rng.permutation(len(member))
        n_chunks = -(-len(member) // npoints)
        pad = n_chunks * npoints - len(member)
        fill = rng.randint(0, len(member), pad)
        seq = np.concatenate([order, fill])
        mask_seq = np.concatenate([inner[order], np.zeros(pad, bool)])
        orig = member[seq]
        out_points.append(points[orig].reshape(n_chunks, npoints, 3))
        out_feats.append([np.asarray(f)[orig].reshape((n_chunks, npoints)
                                                      + np.asarray(f).shape[1:])
                          for f in features])
        out_mask.append(mask_seq.reshape(n_chunks, npoints))
        out_idx.append(orig.reshape(n_chunks, npoints).astype(np.int64))

    points_arr = np.concatenate(out_points).astype(np.float32)
    masks = np.concatenate(out_mask)
    orig_idx = np.concatenate(out_idx)
    feats = [np.concatenate([c[i] for c in out_feats]) for i in range(len(features))]
    weights = None
    if get_sample_weights:
        labels = feats[0].astype(np.int64)
        weights = (weight_table[labels] * masks).astype(np.float32)
    return ChunkSet(points_arr, feats, masks, orig_idx, weights)


def map_back(
    values: np.ndarray,
    orig_idx: np.ndarray,
    masks: np.ndarray,
    num_vertices: int,
    fill_value=0,
) -> np.ndarray:
    """Inverse-shuffle scatter: chunked per-point values back to original
    vertex order (ref generate_predictions.py:19-37).  Uncovered vertices
    (none, for ``full_scene_chunks`` output) get ``fill_value``."""
    values = np.asarray(values)
    out = np.full((num_vertices,) + values.shape[2:], fill_value, values.dtype)
    flat_idx = np.asarray(orig_idx).reshape(-1)
    flat_mask = np.asarray(masks).reshape(-1).astype(bool)
    out[flat_idx[flat_mask]] = values.reshape((-1,) + values.shape[2:])[flat_mask]
    return out


def grid_chunks_for_eval(
    points: np.ndarray,
    labels: np.ndarray,
    colors: np.ndarray,
    normals: np.ndarray,
    npoints: int,
    rng: Optional[np.random.RandomState] = None,
    chunk_size: float = CHUNK_SIZE,
    margin: float = CONTEXT_MARGIN,
) -> Dict[str, np.ndarray]:
    """Validation chunks: the full-coverage grid chunker packaged as the
    train-batch dict layout (ref precompute_dataset.py:49-78 precomputed the
    val set with the same subset machinery)."""
    rng = rng if rng is not None else np.random.RandomState(0)
    cs = full_scene_chunks(points, [labels, colors, normals],
                           get_sample_weights=True, npoints=npoints, rng=rng,
                           chunk_size=chunk_size, margin=margin)
    return {
        "points": cs.points,
        "labels": cs.features[0].astype(np.int32),
        "colors": cs.features[1],
        "normals": cs.features[2].astype(np.float32),
        "weights": cs.weights,
        "masks": cs.masks,
        "orig_idx": cs.orig_idx,
    }


def random_z_rotation(
    points: np.ndarray, normals: Optional[np.ndarray],
    rng: np.random.RandomState,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Rotate one cloud and its normals by the same random angle around z
    (ref data_transformation.py:334-352)."""
    a = rng.uniform() * 2 * np.pi
    c, s = np.cos(a), np.sin(a)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    r_pts = points @ rot
    r_nrm = normals @ rot if normals is not None else None
    return r_pts, r_nrm
