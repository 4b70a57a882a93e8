"""On-device random-chunk sampling from HBM-resident scenes.

The reference found its in-graph chunk sampler so slow it PRECOMPUTED
chunks to disk (Report.pdf §3.3, ``precompute_dataset.py``) — and the
host-side numpy port (``data/scannet/chunks.sample_random_chunk``) inherits
that design.  On TPU the economics invert: the sampler is a handful of
fixed-shape masks, one occupancy count, and a ``prob_sample`` draw —
microseconds on the VPU — so raw SCENES can live in HBM (real ScanNet:
~180M points x 26 B ≈ 4.7 GB f32, or less quantized) and every training
step can cut a FRESH random cuboid on device:

- no precompute pass, no chunk corpus on disk,
- unlimited epoch diversity (every visit samples a new chunk, vs the
  precomputed corpus's fixed one-chunk-per-(epoch, scene)),
- per-step H2D = a (B,) scene-id array.

Semantics mirror ``sample_random_chunk`` (ref data_transformation.py:70-154)
in structure: random center point, 1.5 m x 1.5 m xy cuboid with a 0.2 m
context margin, validity retries (<= 10) requiring >= 70 % labeled
candidates and >= 2 % occupancy on the 31x31x62 voxel grid, retry-exhausted
fallback to the LAST tried candidate-bearing box (ref :141-145 'if fails,
get the last' — the whole scene only in the no-candidates degenerate case),
``npoints`` drawn with replacement, weight = class_weight[label] *
inside-inner-box.  (The RNG streams differ from the numpy sampler's, so
individual chunks differ; the structural contract and its statistics are
tested in ``tests/test_device_sampler.py``.)

Occupancy check, TPU-shaped: the host port fits the 31x31x62 grid to the
candidate bbox and counts distinct voxels — on device that was a full-window
sort per retry (the dominant cost: ~43 of a 64 ms sampling step at flagship
geometry).  Here each scene is sorted ONCE (at upload, on host) by a
scene-anchored voxel id whose cells are chunk-sized/31 in xy and
scene-height/62 in z; the distinct-voxels-among-candidates count then
collapses to one cumsum + two gathers per retry ("first candidate in its
voxel run" counting — no sort, no scatter, both of which serialize on TPU).
The grid is anchored to the scene instead of refit to each candidate bbox,
an intentional, measured approximation of the validity heuristic (decision
agreement is asserted in tests); ``occupancy='exact'`` keeps the bbox-fit
sort path for A/B.

Scenes of different sizes ride in one concatenated buffer with per-scene
(offset, length).  Because the voxel sort's PRIMARY key is the x-cell,
every tried box's candidate set lives in a contiguous x-STRIPE of the
sorted scene — so each try and the final draw work on a fixed ``sub_len``
stripe window (the host-computed max stripe population) instead of the
whole scene, and the sampling cost scales with ~1.9 m of room, not room
size.  The buffer carries ``max_len`` rows of tail padding so stripe
slices never clamp (a clamped ``dynamic_slice`` start would silently
misalign the window with the per-scene offsets and bleed the previous
scene's points into the sample).
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


def scene_voxel_sort(
    points: np.ndarray,
    chunk_size: float = CHUNK_SIZE,
    margin: float = CONTEXT_MARGIN,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Host-side, once per scene: sort order by scene-anchored voxel id +
    per-point first-index-of-my-voxel-run (relative to the sorted scene) +
    the sorted per-point x-cell index.

    Cell sizes: (chunk + 2*margin)/31 in xy — so a candidate box spans ~31
    cells like the reference's bbox-fit grid — and scene z extent / 62.
    The PRIMARY sort key is the x-cell, which makes every chunk's candidate
    set a contiguous x-STRIPE of the sorted scene: the sampler then works
    on a bounded sub-window instead of the whole scene (the sub-window
    length is the dominant per-step cost).
    Returns ``(order, run_start_rel, vx_sorted)`` indexed in sorted order.
    """
    lo = points.min(axis=0)
    cxy = (chunk_size + 2 * margin) / OCCUPANCY_GRID[0]
    cz = max(float(points[:, 2].max() - lo[2]), 1e-6) / OCCUPANCY_GRID[2]
    vx = np.floor((points[:, 0] - lo[0]) / cxy).astype(np.int64)
    vy = np.floor((points[:, 1] - lo[1]) / cxy).astype(np.int64)
    vz = np.minimum((points[:, 2] - lo[2]) / cz,
                    OCCUPANCY_GRID[2] - 1).astype(np.int64)
    vid = (vx * (vy.max() + 1) + vy) * OCCUPANCY_GRID[2] + vz
    order = np.argsort(vid, kind="stable")
    sorted_vid = vid[order]
    new_run = np.empty(len(points), bool)
    new_run[0] = True
    np.not_equal(sorted_vid[1:], sorted_vid[:-1], out=new_run[1:])
    run_start_rel = np.maximum.accumulate(
        np.where(new_run, np.arange(len(points)), 0)).astype(np.int32)
    return order, run_start_rel, vx[order].astype(np.int32)


# x-cells a (chunk + 2*margin)-wide box can straddle: 31 cells of exactly
# that width, +1 for grid phase, +1 so the exclusive upper bound is safe.
_STRIPE_CELLS = OCCUPANCY_GRID[0] + 2


def stripe_window_len(vx_sorted: np.ndarray) -> int:
    """Max points any chunk's x-stripe can contain in this scene: the
    largest population of ``_STRIPE_CELLS`` consecutive x-cells (exact —
    host two-pointer over the x-cell histogram, once at upload)."""
    counts = np.bincount(vx_sorted)
    prefix = np.concatenate([[0], np.cumsum(counts)])
    w = min(_STRIPE_CELLS, len(counts))
    return int((prefix[w:] - prefix[:-w]).max()) if len(prefix) > w \
        else len(vx_sorted)


class ResidentScenes:
    """Concatenate scene arrays and upload them once.

    points (T, 3) f32, labels (T,) i32, colors (T, 3) u8, normals (T, 3)
    f32; ``offsets`` (S,) / ``lengths`` (S,) index scenes into the buffer.
    ``max_len`` (static) = longest scene, the per-sample window size.
    Scene points are voxel-sorted (``scene_voxel_sort``) so the sampler's
    occupancy check is sort-free; the buffer is padded by ``max_len`` rows
    so window slices never clamp.
    """

    @staticmethod
    def estimate_bytes(lengths, use_colors: bool = True,
                       use_normals: bool = True) -> int:
        """Device (== host peak) bytes the resident buffers will take for
        scenes of these lengths — points f32x3 + labels i32 + run_start i32
        + vx i32 [+ colors u8x3 + normals f32x3], each padded by max_len
        tail rows.  Computable from scene headers BEFORE loading any scene
        body, so the budget check fails fast."""
        lengths = np.asarray(lengths, np.int64)
        rows = int(lengths.sum() + lengths.max())
        per_row = 12 + 4 + 4 + 4
        if use_colors:
            per_row += 3
        if use_normals:
            per_row += 12
        return rows * per_row

    def __init__(self, scenes: List[Dict[str, np.ndarray]], mesh=None,
                 use_colors: bool = True, use_normals: bool = True,
                 chunk_size: float = CHUNK_SIZE,
                 margin: float = CONTEXT_MARGIN,
                 budget_mb: Optional[float] = None):
        import jax

        if not scenes:
            # Happens on a multi-host run whose process got an empty
            # host_shard slice (more processes than train scenes) — fail
            # with the cause instead of a zero-size numpy reduction while
            # the other hosts hang at their first collective.
            raise ValueError(
                "ResidentScenes got an empty scene list — with "
                "input='sampler' every process needs at least one train "
                "scene after per-host sharding (fewer scenes than "
                "jax.process_count()?)")
        lengths = np.array([len(s["points"]) for s in scenes], np.int32)
        if budget_mb is not None:
            need = self.estimate_bytes(lengths, use_colors, use_normals)
            if need > budget_mb * 2**20:
                raise ValueError(
                    f"resident sampler corpus needs {need / 2**20:.0f} MB "
                    f"of HBM (and host RAM to build it) > budget_mb="
                    f"{budget_mb:.0f} for {len(scenes)} scenes — raise "
                    "sampler_budget_mb, shard scenes across hosts "
                    "(parallel.host_shard), or fall back to a packed input "
                    "mode")
        offsets = np.concatenate([[0], np.cumsum(lengths)[:-1]]).astype(np.int32)
        self.max_len = int(lengths.max())
        self.lengths = lengths
        self.offsets = offsets
        self.use_colors = use_colors
        self.use_normals = use_normals
        self.chunk_size = chunk_size
        self.margin = margin

        orders, run_starts, vxs = zip(*(
            scene_voxel_sort(np.asarray(s["points"], np.float32),
                             chunk_size, margin)
            for s in scenes))
        # Static stripe window: the largest x-stripe population over all
        # scenes (rounded up for stable compiled shapes; capped by max_len,
        # at which point the stripe path degenerates to the full window).
        raw_sub = max(stripe_window_len(v) for v in vxs)
        self.sub_len = min(self.max_len, -(-raw_sub // 1024) * 1024)

        def put(x):
            if mesh is None:
                return jax.device_put(x)
            from jax.sharding import NamedSharding, PartitionSpec as P

            return jax.device_put(x, NamedSharding(mesh, P()))

        def cat(k, dt):
            parts = [np.asarray(s[k])[o] for s, o in zip(scenes, orders)]
            pad_shape = (self.max_len,) + parts[0].shape[1:]
            parts.append(np.zeros(pad_shape, parts[0].dtype))
            return put(np.concatenate(parts).astype(dt))

        self.points = cat("points", np.float32)
        self.labels = cat("labels", np.int32)
        self.colors = cat("colors", np.uint8) if use_colors else None
        self.normals = cat("normals", np.float32) if use_normals else None
        self.run_start = put(np.concatenate(
            list(run_starts) + [np.zeros(self.max_len, np.int32)]))
        # Sentinel-padded x-cells: padding never matches a stripe search.
        self.vx = put(np.concatenate(
            list(vxs) + [np.full(self.max_len, 2**30, np.int32)]))
        self.x_mins = put(np.stack(
            [np.asarray(s["points"], np.float32)[:, 0].min()
             for s in scenes]).astype(np.float32))
        self.d_offsets = put(offsets)
        self.d_lengths = put(lengths)


def _occupancy_fraction_exact(pts, cand):
    """Fraction of occupied voxels among candidate points, bbox-fit grid —
    the jnp twin of ``chunks._voxel_occupancy`` (ref
    data_transformation.py:127-138), with non-candidates routed to a
    sentinel bin.  One full-window sort per call: the A/B reference for the
    default sort-free path, not the production sampler."""
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


def _occupancy_fraction_fast(win_run_start, cand, max_len: int):
    """Distinct-voxels-among-candidates on a voxel-PRESORTED window: point i
    is counted iff it is the first candidate of its voxel run, i.e. the
    nearest candidate strictly before i lies before the run start.  One
    cummax + elementwise — no sort, and crucially NO GATHER: a first
    formulation gathered ``cumsum[run_start]`` per retry, and that single
    (max_len,)-element random gather cost more than the sort it replaced
    (TPU gathers pay per element, not per byte)."""
    import jax
    import jax.numpy as jnp

    iota = jnp.arange(max_len, dtype=jnp.int32)
    prev_incl = jax.lax.cummax(jnp.where(cand, iota, -1))
    prev_before = jnp.concatenate(
        [jnp.full((1,), -1, jnp.int32), prev_incl[:-1]])
    first_in_run = cand & (prev_before < win_run_start)
    return jnp.sum(first_in_run.astype(jnp.float32)) / _N_VOXELS


def _sample_one(points, labels, colors, normals, run_start, vx, x_min,
                offset, length, key, *, npoints: int, max_len: int,
                sub_len: int, class_weights, occupancy: str = "fast",
                with_box: bool = False, chunk_size: float = CHUNK_SIZE,
                margin: float = CONTEXT_MARGIN):
    """Sample one chunk from one scene; returns a chunk dict of fixed
    shapes (npoints rows).

    All per-try and per-draw work happens on a ``sub_len`` x-STRIPE window
    of the x-cell-sorted scene (the stripe provably contains every
    candidate of the tried box; ``sub_len`` is the host-computed max stripe
    population) — the sampling cost scales with the stripe, not the scene.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    cxy = (chunk_size + 2 * margin) / OCCUPANCY_GRID[0]
    half = chunk_size / 2.0
    big_vx = jnp.int32(2**30)
    # Scene x-cell sequence (monotone within the scene; positions past
    # ``length`` belong to the NEXT scene and must be masked to a sentinel
    # or they would break the stripe binary search).
    win_vx = lax.dynamic_slice(vx, (offset,), (max_len,))
    win_vx = jnp.where(jnp.arange(max_len) < length, win_vx, big_vx)

    def stripe_start(lo_x):
        # First sorted index whose x-cell can hold x >= lo_x - margin.
        target = jnp.floor((lo_x - margin - x_min) / cxy
                           ).astype(jnp.int32)
        return jnp.searchsorted(win_vx, target, side="left"
                                ).astype(jnp.int32)

    def stripe(arrs, start):
        out = []
        for a in arrs:
            if a.ndim == 1:
                out.append(lax.dynamic_slice(a, (offset + start,),
                                             (sub_len,)))
            else:
                out.append(lax.dynamic_slice(
                    a, (offset + start, 0), (sub_len, a.shape[1])))
        return out

    def stripe_masks(s_pts, start, lo, hi):
        valid = start + jnp.arange(sub_len) < length
        xy = s_pts[:, :2]
        cand = ((xy >= lo - margin) & (xy <= hi + margin)
                ).all(axis=1) & valid
        return valid, cand

    def body(carry):
        tries, ok, any_cand, box_lo, box_hi, box_start = carry
        k = jax.random.fold_in(key, tries)
        ci = jnp.clip(jax.random.randint(k, (), 0, length), 0, max_len - 1)
        center = points[offset + ci, :2]
        lo, hi = center - half, center + half
        start = stripe_start(lo[0])
        s_pts, s_lab = stripe((points, labels), start)
        valid, cand = stripe_masks(s_pts, start, lo, hi)
        n_cand = jnp.sum(cand)
        labeled = jnp.sum(cand & (s_lab > 0)) / jnp.maximum(n_cand, 1)
        if occupancy == "fast":
            (s_rs,) = stripe((run_start,), start)
            occ = _occupancy_fraction_fast(s_rs - start, cand, sub_len)
        else:
            occ = _occupancy_fraction_exact(s_pts, cand)
        good = ((n_cand > 0) & (labeled >= MIN_LABELED_FRACTION)
                & (occ >= MIN_VOXEL_OCCUPANCY))
        # The box always tracks the LATEST candidate-bearing try, so on
        # retry exhaustion the sampler keeps the last tried chunk exactly
        # like the host port / ref :141-145 ('if fails, get the last').
        take = (n_cand > 0) & ~ok
        box_lo = jnp.where(take, lo, box_lo)
        box_hi = jnp.where(take, hi, box_hi)
        box_start = jnp.where(take, start, box_start)
        return (tries + 1, ok | good, any_cand | (n_cand > 0),
                box_lo, box_hi, box_start)

    def cond(carry):
        tries, ok, *_ = carry
        return (~ok) & (tries < MAX_TRIES)

    init = (jnp.int32(0), jnp.bool_(False), jnp.bool_(False),
            jnp.zeros((2,), jnp.float32), jnp.zeros((2,), jnp.float32),
            jnp.int32(0))
    _, ok, any_cand, lo, hi, start = lax.while_loop(cond, body, init)

    win_pts, win_lab = stripe((points, labels), start)
    valid, cand = stripe_masks(win_pts, start, lo, hi)
    xy = win_pts[:, :2]
    # Degenerate fallback (ref :84-96 `sel is None`): only when NO try ever
    # produced candidates does the sampler fall back to everything in view
    # (unreachable in practice — the center point is its own candidate).
    cand = jnp.where(any_cand, cand, valid)
    inner = jnp.where(
        any_cand, ((xy >= lo) & (xy <= hi)).all(axis=1) & cand, valid)

    # npoints WITH replacement, uniform over candidates (ref :147
    # rng.choice(len(sel), npoints, replace=True)) — inverse-CDF over the
    # candidate mask as weights.  method='sort': the default 'scan' binary
    # search is ~18 sequential iterations of per-element gathers — traced
    # at 24 ms/step at flagship geometry; one vectorized co-sort of
    # (cdf ++ queries) does the same rank lookup in ~3 ms.
    cdf = jnp.cumsum(cand.astype(jnp.float32))
    u = jax.random.uniform(jax.random.fold_in(key, 1000), (npoints,))
    take = jnp.clip(
        jnp.searchsorted(cdf, u * cdf[-1], side="left", method="sort"),
        0, sub_len - 1).astype(jnp.int32)

    out = {
        "points": win_pts[take],
        "labels": win_lab[take],
        "weights": (jnp.asarray(class_weights, jnp.float32)[win_lab[take]]
                    * inner[take].astype(jnp.float32)),
    }
    parts = []
    if colors is not None:
        (win_col,) = stripe((colors,), start)
        parts.append(win_col[take].astype(jnp.float32) / 255.0)
    if normals is not None:
        (win_nrm,) = stripe((normals,), start)
        parts.append(win_nrm[take])
    if parts:
        out["features"] = jnp.concatenate(parts, axis=-1)
    if with_box:  # test/debug metadata: the kept box (ok=False: last tried)
        out["chunk_lo"] = lo
        out["chunk_hi"] = hi
        out["chunk_ok"] = ok
    return out


def sample_chunk_batch(scenes: ResidentScenes, scene_ids, rng, npoints: int,
                       class_weights=None, occupancy: str = "fast",
                       with_box: bool = False):
    """(B,) scene ids + rng -> a standard training batch, entirely on
    device (jit-safe; vmapped over the batch)."""
    import jax

    cw = tuple(class_weights) if class_weights is not None \
        else SCANNET_CLASS_WEIGHTS
    keys = jax.random.split(rng, scene_ids.shape[0])
    fn = partial(_sample_one, npoints=npoints, max_len=scenes.max_len,
                 sub_len=scenes.sub_len, class_weights=cw,
                 occupancy=occupancy, with_box=with_box,
                 chunk_size=scenes.chunk_size, margin=scenes.margin)
    return jax.vmap(
        lambda sid, k: fn(scenes.points, scenes.labels, scenes.colors,
                          scenes.normals, scenes.run_start, scenes.vx,
                          scenes.x_mins[sid], scenes.d_offsets[sid],
                          scenes.d_lengths[sid], k)
    )(scene_ids, keys)


def make_sampling_train_step(scenes: ResidentScenes, npoints: int,
                             mesh=None, donate=True, class_weights=None,
                             occupancy: str = "fast", augment=False,
                             **step_kwargs):
    """jit ``(state, scene_ids, rng) -> (state, metrics)``: cut a fresh
    random chunk per sample ON DEVICE and train on it — the no-precompute
    training path.  scene_ids shard over ``data`` under a mesh.

    ``augment=True`` z-rotates every sampled chunk (points + normal
    features) by a fresh per-sample angle — the on-device twin of the
    rotation the precompute pass bakes per (epoch, scene)
    (ref data_transformation.py:334-352), without which the sampler path
    would silently train UNaugmented."""
    import jax

    from pointcloud_segmentation_attention_tpu.train.device_replay import (
        rotate_batch_z,
    )
    from pointcloud_segmentation_attention_tpu.train.steps import (
        seg_train_step,
    )

    def step(state, scene_ids, rng):
        batch = sample_chunk_batch(
            scenes, scene_ids, jax.random.fold_in(rng, state.step),
            npoints, class_weights, occupancy=occupancy)
        if augment:
            # ``scenes`` quacks like a WireSpec here (use_colors/use_normals).
            batch = rotate_batch_z(
                batch, scenes,
                jax.random.fold_in(jax.random.fold_in(rng, 77), state.step))
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
