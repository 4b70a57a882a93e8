"""On-device random-chunk sampling from HBM-resident scenes.

The reference found its in-graph chunk sampler so slow it PRECOMPUTED
chunks to disk (Report.pdf §3.3, ``precompute_dataset.py``) — and the
host-side numpy port (``data/scannet/chunks.sample_random_chunk``) inherits
that design.  On TPU the economics invert: the sampler is a handful of
fixed-shape masks, one scatter-max occupancy histogram, and a
``prob_sample`` draw — microseconds on the VPU — so raw SCENES can live in
HBM (real ScanNet: ~180M points x 26 B ≈ 4.7 GB f32, or less quantized)
and every training step can cut a FRESH random cuboid on device:

- no precompute pass, no chunk corpus on disk,
- unlimited epoch diversity (every visit samples a new chunk, vs the
  precomputed corpus's fixed one-chunk-per-(epoch, scene)),
- per-step H2D = a (B,) scene-id array.

Semantics mirror ``sample_random_chunk`` (ref data_transformation.py:70-154)
exactly in structure: random center point, 1.5 m x 1.5 m xy cuboid with a
0.2 m context margin, validity retries (<= 10) requiring >= 70 % labeled
candidates and >= 2 % occupancy on the 31x31x62 voxel grid, degenerate
fallback to the whole scene, ``npoints`` drawn with replacement, weight =
class_weight[label] * inside-inner-box.  (The RNG streams differ from the
numpy sampler's, so individual chunks differ; the structural contract and
its statistics are tested in ``tests/test_device_sampler.py``.)

Scenes of different sizes ride in one concatenated buffer with per-scene
(offset, length); each sample works on a fixed ``max_len`` window.
"""
from __future__ import annotations

from functools import partial
from typing import Dict, List, Optional, Tuple

import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet.chunks import (
    CHUNK_SIZE, CONTEXT_MARGIN, MAX_TRIES, MIN_LABELED_FRACTION,
    MIN_VOXEL_OCCUPANCY, OCCUPANCY_GRID,
)
from pointcloud_segmentation_attention_tpu.train.steps import (
    SCANNET_CLASS_WEIGHTS,
)

_N_VOXELS = int(np.prod(OCCUPANCY_GRID))


class ResidentScenes:
    """Concatenate scene arrays and upload them once.

    points (T, 3) f32, labels (T,) i32, colors (T, 3) u8, normals (T, 3)
    f32; ``offsets`` (S,) / ``lengths`` (S,) index scenes into the buffer.
    ``max_len`` (static) = longest scene, the per-sample window size.
    """

    def __init__(self, scenes: List[Dict[str, np.ndarray]], mesh=None,
                 use_colors: bool = True, use_normals: bool = True):
        import jax

        lengths = np.array([len(s["points"]) for s in scenes], np.int32)
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
        self.max_len = int(lengths.max())
        self.lengths = lengths
        self.offsets = offsets
        self.use_colors = use_colors
        self.use_normals = use_normals

        def put(x):
            if mesh is None:
                return jax.device_put(x)
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(x, NamedSharding(mesh, P()))

        cat = lambda k, dt: put(np.concatenate(
            [np.asarray(s[k]) for s in scenes]).astype(dt))
        self.points = cat("points", np.float32)
        self.labels = cat("labels", np.int32)
        self.colors = cat("colors", np.uint8) if use_colors else None
        self.normals = cat("normals", np.float32) if use_normals else None
        self.d_offsets = put(offsets)
        self.d_lengths = put(lengths)


def _occupancy_fraction(pts, cand):
    """Fraction of occupied voxels among candidate points — the jnp twin of
    ``chunks._voxel_occupancy`` (ref data_transformation.py:127-138), with
    non-candidates routed to a sentinel bin."""
    import jax.numpy as jnp

    big = jnp.float32(1e30)
    masked = jnp.where(cand[:, None], pts, big)
    lo = jnp.min(masked, axis=0)
    masked_hi = jnp.where(cand[:, None], pts, -big)
    extent = jnp.maximum(jnp.max(masked_hi, axis=0) - lo, 1e-6)
    grid = jnp.asarray(OCCUPANCY_GRID, jnp.float32)
    cell = jnp.minimum((pts - lo) / extent * grid, grid - 1).astype(jnp.int32)
    flat = ((cell[:, 0] * OCCUPANCY_GRID[1] + cell[:, 1])
            * OCCUPANCY_GRID[2] + cell[:, 2])
    flat = jnp.where(cand, jnp.clip(flat, 0, _N_VOXELS - 1), _N_VOXELS)
    # Distinct-count via sort + transitions: a batched scatter-max here cost
    # ~45 ms/step inside the vmapped retry loop (TPU scatters serialize);
    # the vectorized sort is ~20x cheaper for the same exact count.
    s = jnp.sort(flat)
    first_real = (s[0] < _N_VOXELS).astype(jnp.float32)
    transitions = jnp.sum(((s[1:] != s[:-1]) & (s[1:] < _N_VOXELS))
                          .astype(jnp.float32))
    return (transitions + first_real) / _N_VOXELS


def _sample_one(points, labels, colors, normals, offset, length, key,
                *, npoints: int, max_len: int, class_weights,
                with_box: bool = False):
    """Sample one chunk from one scene window; returns a chunk dict of
    fixed shapes (npoints rows)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    win_pts = lax.dynamic_slice(points, (offset, 0), (max_len, 3))
    win_lab = lax.dynamic_slice(labels, (offset,), (max_len,))
    valid = jnp.arange(max_len) < length
    xy = win_pts[:, :2]
    half = CHUNK_SIZE / 2.0

    def candidates(lo, hi):
        in_ctx = ((xy >= lo - CONTEXT_MARGIN) & (xy <= hi + CONTEXT_MARGIN)
                  ).all(axis=1) & valid
        return in_ctx

    def body(carry):
        tries, ok, best_lo, best_hi = carry
        k = jax.random.fold_in(key, tries)
        ci = jax.random.randint(k, (), 0, length)
        center = xy[ci]
        lo, hi = center - half, center + half
        cand = candidates(lo, hi)
        n_cand = jnp.sum(cand)
        labeled = jnp.sum(cand & (win_lab > 0)) / jnp.maximum(n_cand, 1)
        occ = _occupancy_fraction(win_pts, cand)
        good = ((n_cand > 0) & (labeled >= MIN_LABELED_FRACTION)
                & (occ >= MIN_VOXEL_OCCUPANCY))
        take = good & ~ok
        best_lo = jnp.where(take, lo, best_lo)
        best_hi = jnp.where(take, hi, best_hi)
        return tries + 1, ok | good, best_lo, best_hi

    def cond(carry):
        tries, ok, *_ = carry
        return (~ok) & (tries < MAX_TRIES)

    init = (jnp.int32(0), jnp.bool_(False),
            jnp.zeros((2,), jnp.float32), jnp.zeros((2,), jnp.float32))
    _, ok, lo, hi = lax.while_loop(cond, body, init)

    # Degenerate fallback (ref :143-145): the whole scene, inner = all.
    cand = jnp.where(ok, candidates(lo, hi), valid)
    inner = jnp.where(
        ok, ((xy >= lo) & (xy <= hi)).all(axis=1) & cand, valid)

    # npoints WITH replacement, uniform over candidates (ref :147
    # rng.choice(len(sel), npoints, replace=True)) — inverse-CDF over the
    # candidate mask as weights.
    cdf = jnp.cumsum(cand.astype(jnp.float32))
    u = jax.random.uniform(jax.random.fold_in(key, 1000), (npoints,))
    take = jnp.clip(jnp.searchsorted(cdf, u * cdf[-1], side="left"),
                    0, max_len - 1).astype(jnp.int32)

    out = {
        "points": win_pts[take],
        "labels": win_lab[take],
        "weights": (jnp.asarray(class_weights, jnp.float32)[win_lab[take]]
                    * inner[take].astype(jnp.float32)),
    }
    parts = []
    if colors is not None:
        win_col = lax.dynamic_slice(colors, (offset, 0), (max_len, 3))
        parts.append(win_col[take].astype(jnp.float32) / 255.0)
    if normals is not None:
        win_nrm = lax.dynamic_slice(normals, (offset, 0), (max_len, 3))
        parts.append(win_nrm[take])
    if parts:
        out["features"] = jnp.concatenate(parts, axis=-1)
    if with_box:  # test/debug metadata: the accepted inner box (or ok=False)
        out["chunk_lo"] = lo
        out["chunk_hi"] = hi
        out["chunk_ok"] = ok
    return out


def sample_chunk_batch(scenes: ResidentScenes, scene_ids, rng, npoints: int,
                       class_weights=None, with_box: bool = False):
    """(B,) scene ids + rng -> a standard training batch, entirely on
    device (jit-safe; vmapped over the batch)."""
    import jax

    cw = tuple(class_weights) if class_weights is not None \
        else SCANNET_CLASS_WEIGHTS
    keys = jax.random.split(rng, scene_ids.shape[0])
    fn = partial(_sample_one, npoints=npoints, max_len=scenes.max_len,
                 class_weights=cw, with_box=with_box)
    return jax.vmap(
        lambda sid, k: fn(scenes.points, scenes.labels, scenes.colors,
                          scenes.normals, scenes.d_offsets[sid],
                          scenes.d_lengths[sid], k)
    )(scene_ids, keys)


def make_sampling_train_step(scenes: ResidentScenes, npoints: int,
                             mesh=None, donate=True, class_weights=None,
                             **step_kwargs):
    """jit ``(state, scene_ids, rng) -> (state, metrics)``: cut a fresh
    random chunk per sample ON DEVICE and train on it — the no-precompute
    training path.  scene_ids shard over ``data`` under a mesh."""
    import jax

    from pointcloud_segmentation_attention_tpu.train.steps import (
        seg_train_step,
    )

    def step(state, scene_ids, rng):
        batch = sample_chunk_batch(
            scenes, scene_ids, jax.random.fold_in(rng, state.step),
            npoints, class_weights)
        return seg_train_step(state, batch, rng, **step_kwargs)

    donate_argnums = (0,) if donate else ()
    if mesh is None:
        return jax.jit(step, donate_argnums=donate_argnums)

    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    return jax.jit(
        step, in_shardings=(repl, NamedSharding(mesh, P("data")), repl),
        donate_argnums=donate_argnums,
    )
