"""Resident-scene serving: full-scene prediction without the per-chunk link.

The host serving path (``eval/full_scene.py``) chunks each scene on host and
ships every chunk batch up the link — on a high-latency tunnel that caps
serving at ~6 % of the device inference rate (docs/performance.md).  Here a
scene crosses the link ONCE, as a single packed u8 buffer (q16: 12 B/point),
and everything else happens on device:

- the full-coverage grid chunker (the TPU twin of
  ``chunks.full_scene_chunks`` / ref ``complete_scene_loader.py:4-117``):
  ONE lexicographic sort groups the (cell, hash, point) membership
  entries, a top_k extracts the kept-cell table, and tiny table arithmetic
  + one gather invert slots to points — no host round trip, no scatter,
- chunk batches gather their points/features from the resident buffer and
  predict under ``lax.map``,
- argmaxed labels stitch back to vertex order by one stable sort (every
  vertex is mask-True exactly once, so sorting by masked vertex id IS
  ``chunks.map_back`` / ref ``generate_predictions.py:19-37``),
- all of the above compiles into a SINGLE program per scene-size bucket
  (``make_scene_program``) — one dispatch, one upload, one
  (num_vertices,) u8 fetch per scene.

Chunk composition is DETERMINISTIC (a keyed integer hash replaces the host
chunker's ``rng.permutation``, modulo-fill replaces its random tail fill) and
is reproduced bit-for-bit by the numpy twin ``deterministic_scene_chunks`` —
so the device path's stitched output can be asserted identical to the host
path fed the same chunks (``tests/test_resident_serving.py``).

Grid semantics match ``full_scene_chunks``: 1.5 m cells over the scene's xy
bbox, 0.2 m context margin (a point belongs to every cell whose margin-
enlarged box contains it: with 2*margin < cell that is at most 2x2 cells),
cells without inner (home) points dropped, ceil(members/npoints) chunks per
cell, every vertex mask-True exactly once (its home entry).
"""
from __future__ import annotations

from typing import Dict, Iterator, Optional, Sequence, Tuple

import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet.chunks import (
    CHUNK_SIZE, CONTEXT_MARGIN, ChunkSet, check_grid_geometry,
)

_HASH_MULT = np.uint32(2654435761)      # Knuth multiplicative


def _hash32(pid, seed: int):
    """Deterministic uint32 hash of a point id — the shared 'shuffle' key of
    the host twin and the device chunker (identical integer semantics in
    numpy and jnp)."""
    h = (pid.astype(np.uint32) + np.uint32(seed * 7919 + 1)) * _HASH_MULT
    return h ^ (h >> np.uint32(16))


def _grid_dims(xy: np.ndarray, chunk_size: float = CHUNK_SIZE,
               ) -> Tuple[np.ndarray, int, int]:
    # f32 division to match the device chunker's grid arithmetic exactly
    # (a f64 host division could round ceil() differently on extents that
    # are near-multiples of the cell size).
    mn = xy.min(axis=0)
    ext = (xy.max(axis=0) - mn).astype(np.float32)
    ncx = max(1, int(np.ceil(ext[0] / np.float32(chunk_size))))
    ncy = max(1, int(np.ceil(ext[1] / np.float32(chunk_size))))
    return mn, ncx, ncy


def _memberships_np(xy: np.ndarray, mn, ncx: int, ncy: int,
                    chunk_size: float = CHUNK_SIZE,
                    margin: float = CONTEXT_MARGIN):
    """(N, 4) membership enumeration: the 2x2 cells whose margin-enlarged box
    can contain the point (2*margin < cell).  Returns (cell_x, cell_y,
    member, home_id) with cell ids int64."""
    rel = xy - mn
    lo = np.floor((rel - margin) / chunk_size).astype(np.int64)
    home = np.minimum(np.floor(rel / chunk_size).astype(np.int64),
                      [ncx - 1, ncy - 1])
    home = np.maximum(home, 0)
    home_id = home[:, 0] * ncy + home[:, 1]
    cxs, cys, members = [], [], []
    # Box arithmetic in f32 with the SAME op order as the device chunker
    # (cast-int * size - margin, then + width): host and device margin
    # boundaries are then bit-identical, so membership (and chunk_count)
    # cannot disagree with the device by a boundary ulp.
    chunk_f = np.float32(chunk_size)
    margin_f = np.float32(margin)
    width_f = np.float32(chunk_size + 2 * margin)
    for dx in (0, 1):
        for dy in (0, 1):
            cx = lo[:, 0] + dx
            cy = lo[:, 1] + dy
            box_lo_x = cx.astype(np.float32) * chunk_f - margin_f
            box_lo_y = cy.astype(np.float32) * chunk_f - margin_f
            member = (
                (cx >= 0) & (cx < ncx) & (cy >= 0) & (cy < ncy)
                & (rel[:, 0] >= box_lo_x)
                & (rel[:, 0] < box_lo_x + width_f)
                & (rel[:, 1] >= box_lo_y)
                & (rel[:, 1] < box_lo_y + width_f)
            )
            cxs.append(cx)
            cys.append(cy)
            members.append(member)
    cell_id = np.stack(cxs, 1) * ncy + np.stack(cys, 1)       # (N, 4)
    return cell_id, np.stack(members, 1), home_id


def chunk_count(points: np.ndarray, npoints: int,
                chunk_size: float = CHUNK_SIZE,
                margin: float = CONTEXT_MARGIN) -> int:
    """Exact number of full-coverage chunks for a scene — cheap host-side
    metadata (bincounts, no permutation) so the serving loop knows how many
    predict steps to launch WITHOUT a device->host sync on the on-device
    chunker's output."""
    check_grid_geometry(chunk_size, margin)
    mn, ncx, ncy = _grid_dims(points[:, :2].astype(np.float32), chunk_size)
    cell_id, member, home_id = _memberships_np(
        points[:, :2].astype(np.float32), mn, ncx, ncy, chunk_size, margin)
    n_cells = ncx * ncy
    member_counts = np.bincount(cell_id[member], minlength=n_cells)
    home_counts = np.bincount(home_id, minlength=n_cells)
    kept = home_counts > 0
    return int(np.sum(-(-member_counts[kept] // npoints)))


def deterministic_scene_chunks(
    points: np.ndarray,
    features: Sequence[np.ndarray],
    npoints: int,
    seed: int = 0,
    chunk_size: float = CHUNK_SIZE,
    margin: float = CONTEXT_MARGIN,
) -> ChunkSet:
    """Numpy twin of the DEVICE chunker: same contract as
    ``chunks.full_scene_chunks`` (every vertex mask-True exactly once) with
    deterministic hash order and modulo tail fill — chunk composition is
    bit-identical to ``make_scene_chunker``'s, so host-path predictions on
    these chunks equal the resident device path's."""
    check_grid_geometry(chunk_size, margin)
    xy = points[:, :2].astype(np.float32)
    mn, ncx, ncy = _grid_dims(xy, chunk_size)
    cell_id, member, home_id = _memberships_np(xy, mn, ncx, ncy,
                                               chunk_size, margin)
    pid = np.broadcast_to(np.arange(len(points), dtype=np.int64)[:, None],
                          cell_id.shape)
    cells_f = cell_id[member]
    pids_f = pid[member]
    h = _hash32(pids_f, seed).astype(np.int64)
    order = np.lexsort((pids_f, h, cells_f))
    cells_s, pids_s = cells_f[order], pids_f[order]
    is_home_s = home_id[pids_s] == cells_s

    uniq, starts = np.unique(cells_s, return_index=True)
    bounds = np.append(starts, len(cells_s))
    out_points, out_feats, out_mask, out_idx = [], [], [], []
    for ui in range(len(uniq)):
        s, e = bounds[ui], bounds[ui + 1]
        members_c = pids_s[s:e]
        inner_c = is_home_s[s:e]
        if not inner_c.any():
            continue  # margin-only cell: its points are inner elsewhere
        L = e - s
        n_chunks = -(-L // npoints)
        t = np.arange(n_chunks * npoints) % L     # modulo tail fill
        orig = members_c[t]
        mask_seq = (np.arange(n_chunks * npoints) < L) & inner_c[t]
        out_points.append(points[orig].reshape(n_chunks, npoints, 3))
        out_feats.append([
            np.asarray(f)[orig].reshape((n_chunks, npoints)
                                        + np.asarray(f).shape[1:])
            for f in features
        ])
        out_mask.append(mask_seq.reshape(n_chunks, npoints))
        out_idx.append(orig.reshape(n_chunks, npoints))
    return ChunkSet(
        np.concatenate(out_points).astype(np.float32),
        [np.concatenate([c[i] for c in out_feats])
         for i in range(len(features))],
        np.concatenate(out_mask),
        np.concatenate(out_idx).astype(np.int64),
        None,
    )


# ---------------------------------------------------------------------------
# Packed scene buffers (one H2D transfer per scene)
# ---------------------------------------------------------------------------

class SceneLayout:
    """Static description of the packed resident scene buffer.

    q16: header (8 f32: mn[3], mx[3], pad) + xyz u16 + colors u8 +
    normals i8 — 12 B/point.  f32: xyz f32 + colors u8 + normals f32
    (27 B/point) — the bit-exact layout the parity tests use.
    """

    def __init__(self, layout: str, n_pad: int, use_colors: bool = True,
                 use_normals: bool = True):
        if layout not in ("q16", "f32"):
            raise ValueError(f"unknown scene layout {layout!r}")
        self.layout = layout
        self.n_pad = n_pad
        self.use_colors = use_colors
        self.use_normals = use_normals

    @property
    def header_nbytes(self) -> int:
        return 32 if self.layout == "q16" else 0

    @property
    def nbytes(self) -> int:
        n = self.n_pad
        size = self.header_nbytes + (6 if self.layout == "q16" else 12) * n
        if self.use_colors:
            size += 3 * n
        if self.use_normals:
            size += (3 if self.layout == "q16" else 12) * n
        return size

    def pack(self, points: np.ndarray, colors: Optional[np.ndarray],
             normals: Optional[np.ndarray]) -> np.ndarray:
        """Scene arrays -> one u8 buffer (points padded to n_pad with the
        first point so padding never lands outside the scene bbox)."""
        n, n_pad = len(points), self.n_pad
        if n > n_pad:
            raise ValueError(f"scene has {n} points > n_pad {n_pad}")

        def padded(a, dt):
            a = np.asarray(a)
            out = np.empty((n_pad,) + a.shape[1:], dt)
            out[:n] = a
            out[n:] = a[:1] if n else 0
            return out

        buf = np.empty(self.nbytes, np.uint8)
        off = 0

        def put(a):
            nonlocal off
            raw = np.ascontiguousarray(a).view(np.uint8).reshape(-1)
            buf[off:off + raw.size] = raw
            off += raw.size

        pts = padded(points, np.float32)
        if self.layout == "q16":
            mn, mx = pts.min(0), pts.max(0)
            header = np.zeros(8, np.float32)
            header[:3], header[3:6] = mn, mx
            put(header)
            scale = np.where(mx > mn, mx - mn, 1.0)
            put(np.clip(np.rint((pts - mn) / scale * 65535.0),
                        0, 65535).astype(np.uint16))
        else:
            put(pts)
        if self.use_colors:
            put(padded(colors, np.uint8))
        if self.use_normals:
            if self.layout == "q16":
                put(np.clip(np.rint(padded(normals, np.float32) * 127.0),
                            -127, 127).astype(np.int8))
            else:
                put(padded(normals, np.float32))
        assert off == self.nbytes
        return buf

    def decode_host(self, buf: np.ndarray) -> Dict[str, np.ndarray]:
        """Host-side decode — the EXACT coordinates the device will see
        (``chunk_count`` must count on these, not the raw f32 scene, or the
        host step count could disagree with the device chunker)."""
        n = self.n_pad
        off = self.header_nbytes
        if self.layout == "q16":
            header = buf[:32].view(np.float32)
            mn, mx = header[:3], header[3:6]
            q = buf[off:off + 6 * n].view(np.uint16).reshape(n, 3)
            scale = np.where(mx > mn, mx - mn, 1.0)
            pts = (mn + q.astype(np.float32) * (scale / 65535.0)).astype(
                np.float32)
            off += 6 * n
        else:
            pts = buf[off:off + 12 * n].view(np.float32).reshape(n, 3).copy()
            off += 12 * n
        out = {"points": pts}
        if self.use_colors:
            out["colors"] = buf[off:off + 3 * n].reshape(n, 3).copy()
            off += 3 * n
        if self.use_normals:
            if self.layout == "q16":
                out["normals"] = (buf[off:off + 3 * n].view(np.int8)
                                  .reshape(n, 3).astype(np.float32) / 127.0)
            else:
                out["normals"] = buf[off:off + 12 * n].view(
                    np.float32).reshape(n, 3).copy()
        return out


# ---------------------------------------------------------------------------
# Device chunker
# ---------------------------------------------------------------------------

def _decode_scene_jnp(buf, layout: SceneLayout):
    """On-device twin of ``SceneLayout.decode_host`` (bitcast + dequant)."""
    import jax
    import jax.numpy as jnp

    n = layout.n_pad
    off = layout.header_nbytes

    def take(nbytes):
        nonlocal off
        v = jax.lax.slice_in_dim(buf, off, off + nbytes, axis=0)
        off += nbytes
        return v

    out = {}
    if layout.layout == "q16":
        header = jax.lax.bitcast_convert_type(
            buf[:32].reshape(8, 4), jnp.float32)
        mn, mx = header[:3], header[3:6]
        q = jax.lax.bitcast_convert_type(
            take(6 * n).reshape(n, 3, 2), jnp.uint16).astype(jnp.float32)
        scale = jnp.where(mx > mn, mx - mn, 1.0)
        out["points"] = mn + q * (scale / 65535.0)
    else:
        out["points"] = jax.lax.bitcast_convert_type(
            take(12 * n).reshape(n, 3, 4), jnp.float32)
    if layout.use_colors:
        out["colors"] = take(3 * n).reshape(n, 3)
    if layout.use_normals:
        if layout.layout == "q16":
            out["normals"] = jax.lax.bitcast_convert_type(
                take(3 * n), jnp.int8).reshape(n, 3).astype(
                    jnp.float32) / 127.0
        else:
            out["normals"] = jax.lax.bitcast_convert_type(
                take(12 * n).reshape(n, 3, 4), jnp.float32)
    return out


def make_scene_chunker(layout: SceneLayout, x_cap: int, npoints: int,
                       seed: int = 0, jit: bool = True,
                       chunk_size: float = CHUNK_SIZE,
                       margin: float = CONTEXT_MARGIN):
    """jit ``(scene_buf u8, n) -> (idx (x_cap, npoints) i32,
    mask (x_cap, npoints) bool, n_chunks i32)`` — the full-coverage grid
    chunker as ONE device program (two sorts + cumsums; no host round trip).

    Bit-identical chunk composition to ``deterministic_scene_chunks``:
    same memberships, same hash order, same modulo tail fill.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    n_pad = layout.n_pad
    e_total = 4 * n_pad
    i32max = jnp.iinfo(jnp.int32).max
    # All device indices/keys are int32 (x64 is disabled by default in JAX;
    # int64 literals would silently truncate): chunk slots x_cap * npoints
    # and 4 * n_pad entry ids both stay far below 2^31, and the sort is
    # multi-key lexicographic instead of a packed 64-bit key.

    def chunker(buf, n):
        xyz = _decode_scene_jnp(buf, layout)["points"]
        valid = jnp.arange(n_pad) < n
        xy = xyz[:, :2]
        big = jnp.float32(3e38)
        mn = jnp.min(jnp.where(valid[:, None], xy, big), axis=0)
        mx = jnp.max(jnp.where(valid[:, None], xy, -big), axis=0)
        ext = mx - mn
        ncx = jnp.maximum(jnp.ceil(ext[0] / chunk_size), 1).astype(jnp.int32)
        ncy = jnp.maximum(jnp.ceil(ext[1] / chunk_size), 1).astype(jnp.int32)

        rel = xy - mn
        lo = jnp.floor((rel - margin) / chunk_size).astype(jnp.int32)
        home = jnp.clip(jnp.floor(rel / chunk_size).astype(jnp.int32),
                        0, jnp.stack([ncx - 1, ncy - 1]))
        home_id = home[:, 0] * ncy + home[:, 1]

        cells, members = [], []
        w = chunk_size + 2 * margin
        for dx in (0, 1):
            for dy in (0, 1):
                cx = lo[:, 0] + dx
                cy = lo[:, 1] + dy
                blx = cx.astype(jnp.float32) * chunk_size - margin
                bly = cy.astype(jnp.float32) * chunk_size - margin
                member = (
                    valid & (cx >= 0) & (cx < ncx) & (cy >= 0) & (cy < ncy)
                    & (rel[:, 0] >= blx) & (rel[:, 0] < blx + w)
                    & (rel[:, 1] >= bly) & (rel[:, 1] < bly + w)
                )
                cells.append(cx * ncy + cy)
                members.append(member)
        cell_id = jnp.stack(cells, 1)                       # (N, 4) i32
        member = jnp.stack(members, 1)
        pid = jnp.broadcast_to(jnp.arange(n_pad, dtype=jnp.int32)[:, None],
                               (n_pad, 4))
        h = _hash32_jnp(pid, seed)

        # THE sort: lexicographic (cell, hash, pid); non-members to the
        # end.  pid and the home flag ride as ONE packed payload so the
        # later per-slot fetch is a single gather.
        cell_key = jnp.where(member, cell_id, i32max).reshape(-1)
        packed = ((pid << 1) | (cell_id == home_id[:, None]).astype(
            jnp.int32)).reshape(-1)
        cell_s, _, packed_s = lax.sort(
            (cell_key, h.reshape(-1), packed), num_keys=3)
        memb_valid = cell_s < i32max
        is_home_s = ((packed_s & 1) == 1) & memb_valid

        # Run boundaries over the sorted cell ids (the sentinel run included,
        # so the last real run's end is well-defined).
        iota = jnp.arange(e_total, dtype=jnp.int32)
        new_run = jnp.concatenate(
            [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]])
        run_start = lax.cummax(jnp.where(new_run, iota, 0))
        nxt = jnp.concatenate(
            [jnp.where(new_run, iota, e_total)[1:],
             jnp.full((1,), e_total, jnp.int32)])
        next_start = lax.cummin(nxt[::-1])[::-1]
        run_len = next_start - run_start

        # Kept cells: >= 1 home entry in the run.
        ch = jnp.cumsum(is_home_s.astype(jnp.int32))
        ch0 = jnp.concatenate([jnp.zeros((1,), jnp.int32), ch])
        homes_in_run = ch0[next_start] - ch0[run_start]
        keep = memb_valid & (homes_in_run > 0)

        # Global chunk numbering in cell order: base = chunks before my run.
        chunks_of_run = -(-run_len // npoints)              # ceil
        heads = new_run & keep
        contrib = jnp.where(heads, chunks_of_run, 0)
        cum = jnp.cumsum(contrib)
        n_chunks = cum[-1]

        # Kept-cell table (<= x_cap rows, since every kept cell has >= 1
        # chunk): head-entry positions via ONE top_k over the entry array —
        # no second sort, no searchsorted (an earlier slot-inversion
        # co-sorted 1.2M keys; with <= x_cap cells the inversion is tiny
        # table arithmetic + one gather).
        _, head_pos = jax.lax.top_k(
            jnp.where(heads, -iota, -jnp.int32(2**30)), x_cap)
        # top_k returns descending keys -> head positions ascend by iota.
        n_cells = jnp.sum(heads.astype(jnp.int32))
        cell_valid = jnp.arange(x_cap) < n_cells            # (C,)
        hp = jnp.clip(head_pos, 0, e_total - 1)
        t_rs = run_start[hp]                                # (C,) tiny gathers
        t_len = run_len[hp]
        t_base = cum[hp] - chunks_of_run[hp]                # exclusive cumsum

        # Per-chunk cell rank: r(x) = #(kept cells whose base <= x) - 1.
        x_ids = jnp.arange(x_cap, dtype=jnp.int32)          # (X,)
        r = (jnp.sum((t_base[None, :] <= x_ids[:, None])
                     & cell_valid[None, :], axis=1) - 1)
        r = jnp.clip(r, 0, x_cap - 1)
        c_rs = t_rs[r]                                      # (X,) tiny gathers
        c_len = jnp.maximum(t_len[r], 1)
        c_base = t_base[r]

        # Per-slot: rank within the cell's slot space -> entry index in the
        # sorted array -> ONE (X * npoints) gather of the packed payload.
        s_ids = jnp.arange(npoints, dtype=jnp.int32)        # (n,)
        rank_in_cell = ((x_ids - c_base)[:, None] * npoints
                        + s_ids[None, :])                   # (X, n)
        real = rank_in_cell < c_len[:, None]
        fill_rel = rank_in_cell % c_len[:, None]            # modulo tail
        entry = jnp.clip(c_rs[:, None] + fill_rel, 0, e_total - 1)
        got = packed_s[entry]                               # THE gather
        in_chunks = (x_ids < n_chunks)[:, None]
        out_pid = jnp.where(in_chunks, got >> 1, 0).astype(jnp.int32)
        out_mask = real & ((got & 1) == 1) & in_chunks
        return (out_pid, out_mask, n_chunks.astype(jnp.int32))

    return jax.jit(chunker) if jit else chunker


def _hash32_jnp(pid, seed: int):
    import jax.numpy as jnp

    h = (pid.astype(jnp.uint32) + jnp.uint32(seed * 7919 + 1)
         ) * jnp.uint32(2654435761)
    return h ^ (h >> jnp.uint32(16))


def make_resident_predict_step(state, layout: SceneLayout, batch_size: int,
                               npoints: int, jit: bool = True):
    """jit ``(scene_buf, idx (B, npoints)) -> (B, npoints) u8 labels``:
    gather the chunk batch from the resident buffer, predict, argmax."""
    import jax
    import jax.numpy as jnp

    def step(st, buf, idx):
        scene = _decode_scene_jnp(buf, layout)
        flat = idx.reshape(-1)
        pts = scene["points"][flat].reshape(batch_size, npoints, 3)
        parts = []
        if layout.use_colors:
            parts.append(scene["colors"][flat].reshape(
                batch_size, npoints, 3).astype(jnp.float32) / 255.0)
        if layout.use_normals:
            parts.append(scene["normals"][flat].reshape(
                batch_size, npoints, 3))
        feats = jnp.concatenate(parts, axis=-1) if parts else None
        variables = {"params": st.params, "batch_stats": st.batch_stats}
        logits = st.apply_fn(variables, pts, feats, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.uint8)

    return jax.jit(step) if jit else step


def make_stitch(n_pad: int, x_cap: int, npoints: int, jit: bool = True):
    """jit ``(labels (x_cap, npoints) u8, idx, mask) -> (n_pad,) u8``: the
    device ``map_back``.  Every vertex is mask-True exactly once, so ONE
    stable sort by ``where(mask, idx, sentinel)`` places vertex v's label at
    position v — replacing a 131k-element scatter per batch (XLA scatters
    serialize per element on TPU) with a single vectorized sort per scene."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    def stitch(labels, idx, mask):
        key = jnp.where(mask, idx, n_pad).reshape(-1)
        _, lab_s = lax.sort((key, labels.reshape(-1)), num_keys=1)
        return lab_s[:n_pad]

    return jax.jit(stitch) if jit else stitch


def _scene_program_body(layout: SceneLayout, x_cap: int, nb: int,
                        batch_size: int, npoints: int, seed: int,
                        chunk_size: float, margin: float):
    """The un-jitted per-scene pipeline ``(state, buf, n) -> (labels u8,
    n_chunks)`` shared by the single-device and mesh programs."""
    import jax.numpy as jnp
    from jax import lax

    chunker = make_scene_chunker(layout, x_cap, npoints, seed, jit=False,
                                 chunk_size=chunk_size, margin=margin)
    predict = make_resident_predict_step(None, layout, batch_size,
                                         npoints, jit=False)
    stitch = make_stitch(layout.n_pad, x_cap, npoints, jit=False)

    def program(st, buf, n):
        idx, mask, n_chunks = chunker(buf, n)
        batches = idx[:nb * batch_size].reshape(nb, batch_size, npoints)
        labs = lax.map(lambda ib: predict(st, buf, ib), batches)
        labs = labs.reshape(nb * batch_size, npoints)
        if nb * batch_size < x_cap:
            labs = jnp.concatenate([
                labs, jnp.zeros((x_cap - nb * batch_size, npoints),
                                jnp.uint8)])
        # n_chunks rides back with the labels so the host can assert the
        # scheduled nb * batch_size really covered every device chunk (the
        # q16 one-batch slack is a heuristic; exceeding it must fail loudly,
        # not stitch label 0 into the surplus chunks' home vertices).
        return stitch(labs, idx, mask), n_chunks

    return program


def make_scene_program(state, layout: SceneLayout, x_cap: int, nb: int,
                       batch_size: int, npoints: int, seed: int = 0,
                       chunk_size: float = CHUNK_SIZE,
                       margin: float = CONTEXT_MARGIN):
    """jit ``(scene_buf u8, n) -> ((n_pad,) u8, n_chunks)``: the WHOLE
    per-scene pipeline — grid chunker, ``nb`` predict batches (``lax.map``),
    stitch — as ONE compiled program.  One dispatch per scene: the
    split-program path paid ~12 tunnel dispatches per scene (each
    re-marshalling the state tree), which serialized into the scene rate."""
    import jax

    return jax.jit(_scene_program_body(layout, x_cap, nb, batch_size,
                                       npoints, seed, chunk_size, margin))


def make_scene_program_group(state, layout: SceneLayout, x_cap: int, nb: int,
                             batch_size: int, npoints: int, seed: int = 0,
                             chunk_size: float = CHUNK_SIZE,
                             margin: float = CONTEXT_MARGIN):
    """jit ``(state, bufs (K, nbytes) u8, ns (K,)) -> ((K, n_pad) u8,
    (K,) n_chunks)``: K scenes per dispatch on ONE device (``lax.map`` over
    the per-scene program).

    This exists for high-RTT host links: the measured serving floor on the
    tunnel is SERIALIZED upload-RTT + program + fetch-RTT per scene
    (docs/performance.md) — batching K scenes into one upload, one
    dispatch, and one fetch pays the two RTTs once per GROUP instead of
    once per scene (K=4 cuts ~2 RTTs/scene to ~0.5).  Device compute is
    unchanged (the K programs still run serially on the chip)."""
    import jax
    from jax import lax

    body = _scene_program_body(layout, x_cap, nb, batch_size, npoints,
                               seed, chunk_size, margin)

    def multi(st, bufs, ns):
        return lax.map(lambda bn: body(st, bn[0], bn[1]), (bufs, ns))

    return jax.jit(multi)


def make_scene_program_mesh(state, layout: SceneLayout, x_cap: int, nb: int,
                            batch_size: int, npoints: int, mesh,
                            seed: int = 0, chunk_size: float = CHUNK_SIZE,
                            margin: float = CONTEXT_MARGIN,
                            axis_name: str = "data"):
    """jit ``(state, bufs (D, nbytes) u8, ns (D,)) -> ((D, n_pad) u8,
    (D,) n_chunks)``: SCENE-PER-DEVICE serving — each mesh device runs the
    whole per-scene program on its own scene, ONE dispatch for D scenes.

    This is the north-star sharding of full-scene inference (BASELINE.json:
    'full-scene inference shards cuboid subsets across chips', subsuming
    ref ``train_multi_gpu.py:181-203``'s tower split): the per-scene
    program is already a single fused device computation, so the natural
    mesh axis is the SCENE, not the chunk — zero collectives, no cross-chip
    traffic, and the per-scene pipeline (chunker -> lax.map predicts ->
    stitch) is byte-identical to the single-device program, which keeps the
    stitched output bit-equal for any device count (asserted in
    tests/test_resident_serving.py)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    body = _scene_program_body(layout, x_cap, nb, batch_size, npoints,
                               seed, chunk_size, margin)

    def per_device(st, buf1, n1):
        lab, nc = body(st, buf1[0], n1[0])
        return lab[None], nc[None]

    mapped = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(axis_name, None), P(axis_name)),
        out_specs=(P(axis_name, None), P(axis_name)),
        # The body is an independent per-device program (no collectives);
        # varying-manual-axes checking adds nothing and rejects the
        # replicated-state broadcast pattern on some versions.
        check_vma=False,
    )
    return jax.jit(
        mapped,
        in_shardings=(NamedSharding(mesh, P()),
                      NamedSharding(mesh, P(axis_name, None)),
                      NamedSharding(mesh, P(axis_name))),
    )


# ---------------------------------------------------------------------------
# The server
# ---------------------------------------------------------------------------

def _bucket(x: int, mult: int) -> int:
    return max(mult, -(-x // mult) * mult)


class ResidentSceneServer:
    """Full-scene prediction with one upload and one fetch per scene.

    Compiled programs are cached per (n_pad, x_cap) bucket; scene sizes are
    bucketed (powers of two over ``pad_multiple``) to bound recompiles.
    ``predict_scenes`` keeps ``pipeline_depth`` scenes in flight so uploads,
    chunking, and predict batches overlap across scenes on an async
    dispatch queue (the link latency then pipelines instead of serializing).

    ``mesh``: a 1-D ``jax.sharding.Mesh`` shards serving SCENE-PER-DEVICE —
    groups of ``mesh.size`` scenes are packed to a common bucket, uploaded
    as one sharded (D, nbytes) buffer, and predicted by one dispatch of the
    shard_map program (``make_scene_program_mesh``); stitched outputs are
    bit-identical to the single-device path.

    ``group_size``: on ONE device, batch this many scenes per
    upload/dispatch/fetch (``make_scene_program_group``) — amortizes the
    per-scene link RTTs that set the serving floor on high-latency hosts;
    also bit-identical to the unbatched path.
    """

    def __init__(self, state, npoints: int, batch_size: int = 16,
                 layout: str = "q16", seed: int = 0, use_colors: bool = True,
                 use_normals: bool = True, pad_multiple: int = 16384,
                 pipeline_depth: int = 2, chunk_size: float = CHUNK_SIZE,
                 margin: float = CONTEXT_MARGIN, mesh=None,
                 group_size: int = 1):
        check_grid_geometry(chunk_size, margin)
        if mesh is not None and mesh.devices.size == 1:
            mesh = None  # a 1-device mesh IS the single-device path
        if mesh is not None and group_size > 1:
            raise ValueError("mesh and group_size are exclusive: the mesh "
                             "path already groups mesh.size scenes per "
                             "dispatch (one per device)")
        if mesh is not None and len(mesh.axis_names) != 1:
            raise ValueError(
                "serving mesh must be 1-D (scene-per-device); got axes "
                f"{mesh.axis_names} — serving shards SCENES, so build a "
                "dedicated 1-D mesh over the serving devices")
        self._axis = mesh.axis_names[0] if mesh is not None else None
        if mesh is not None:
            import jax
            from jax.sharding import NamedSharding, PartitionSpec as P

            # Params/batch-stats replicated across the serving mesh once.
            state = jax.device_put(state, NamedSharding(mesh, P()))
        self.mesh = mesh
        self.n_lanes = (int(mesh.devices.size) if mesh is not None
                        else max(1, int(group_size)))
        self.state = state
        self.npoints = npoints
        self.batch_size = batch_size
        self.layout_kind = layout
        self.seed = seed
        self.use_colors = use_colors
        self.use_normals = use_normals
        self.pad_multiple = pad_multiple
        self.pipeline_depth = pipeline_depth
        self.chunk_size = chunk_size
        self.margin = margin
        self._chunkers = {}
        self._steps = {}
        self._programs = {}

    def _n_pad(self, n: int) -> int:
        # Linear buckets: padding waste is bounded by pad_multiple points
        # (uploaded bytes scale with n_pad — a doubling bucket would waste
        # up to 2x link bandwidth for a few fewer compiles).
        return -(-n // self.pad_multiple) * self.pad_multiple

    def _layout(self, n_pad: int) -> SceneLayout:
        return SceneLayout(self.layout_kind, n_pad, self.use_colors,
                           self.use_normals)

    def _get_programs(self, n_pad: int, x_cap: int):
        ck = (n_pad, x_cap)
        if ck not in self._chunkers:
            self._chunkers[ck] = (
                make_scene_chunker(self._layout(n_pad), x_cap, self.npoints,
                                   self.seed, chunk_size=self.chunk_size,
                                   margin=self.margin),
                make_stitch(n_pad, x_cap, self.npoints),
            )
        if n_pad not in self._steps:
            self._steps[n_pad] = make_resident_predict_step(
                self.state, self._layout(n_pad), self.batch_size,
                self.npoints)
        return (*self._chunkers[ck], self._steps[n_pad])

    def _stage(self, scene: Dict[str, np.ndarray]):
        """Host work + the ONE upload for a scene (safe to run from the
        prefetch thread: device_put is thread-safe and async, and running
        it off-thread is what lets the wire time hide behind the previous
        scene's device compute — measured 0.95 overlap efficiency on this
        link, utils/h2d_bench)."""
        import jax

        points = np.asarray(scene["points"], np.float32)
        n = len(points)
        n_pad = self._n_pad(n)
        layout = self._layout(n_pad)
        buf = layout.pack(
            points,
            scene.get("colors") if self.use_colors else None,
            scene.get("normals") if self.use_normals else None)
        # Count on the coords the device will see (q16 decode shifts points
        # by up to half a quantum — enough to flip a margin membership).
        x = chunk_count(layout.decode_host(buf)["points"][:n], self.npoints,
                        self.chunk_size, self.margin)
        # q16 slack: host numpy and XLA may round the dequant mul-add
        # differently (FMA), so the device chunk count can drift by a cell's
        # worth of ceil — schedule one extra batch so no device chunk is
        # ever left unpredicted.  (f32 membership arithmetic is exact: all
        # products in it are representable, so no slack needed.)
        x += self.batch_size if self.layout_kind == "q16" else 0
        return (scene.get("scene_name"), n, n_pad,
                _bucket(x, 4 * self.batch_size), x, jax.device_put(buf))

    def _compute(self, staged):
        """Enqueue one staged scene's device pipeline (ONE program
        dispatch); returns (name, n, device label buffer) without
        synchronizing."""
        name, n, n_pad, x_cap, x, dbuf = staged
        nb = -(-x // self.batch_size)
        pk = (n_pad, x_cap, nb)
        if pk not in self._programs:
            self._programs[pk] = make_scene_program(
                self.state, self._layout(n_pad), x_cap, nb,
                self.batch_size, self.npoints, self.seed,
                chunk_size=self.chunk_size, margin=self.margin)
        acc, n_chunks = self._programs[pk](self.state, dbuf, n)
        try:  # overlap D2H with the next scene's compute
            acc.copy_to_host_async()
        except AttributeError:
            pass
        return name, n, acc, n_chunks, nb * self.batch_size

    def _fetch(self, computed) -> Tuple[str, np.ndarray]:
        """Sync one computed scene; the per-scene guard that the scheduled
        predict batches covered every device chunk lives HERE (the existing
        sync point) so it costs no extra round trip."""
        name, n, acc, n_chunks, cap = computed
        nc = int(n_chunks)
        if nc > cap:
            raise RuntimeError(
                f"device chunker produced {nc} chunks for scene {name!r} "
                f"but only {cap} predict slots were scheduled — the q16 "
                "host/device chunk-count slack was exceeded; raise the "
                "slack in ResidentSceneServer._stage")
        return name, np.asarray(acc)[:n].astype(np.int32)

    # -- mesh (scene-per-device) path ------------------------------------

    def _stage_group(self, group):
        """Pack ``<= n_lanes`` scenes at a COMMON bucket (max over the
        group; the chunker's output is invariant to n_pad/x_cap padding, so
        group bucketing does not change any scene's stitched labels) and
        upload them as ONE (D, nbytes) buffer — sharded scene-per-device
        on a mesh, or resident on the single device in grouped mode."""
        import jax

        n_real = len(group)
        names = [s.get("scene_name") for s in group]
        pts = [np.asarray(s["points"], np.float32) for s in group]
        ns_real = [len(p) for p in pts]
        n_pad = self._n_pad(max(ns_real))
        layout = self._layout(n_pad)
        packed = [
            layout.pack(p, s.get("colors") if self.use_colors else None,
                        s.get("normals") if self.use_normals else None)
            for p, s in zip(pts, group)]
        xs = [chunk_count(layout.decode_host(b)["points"][:n], self.npoints,
                          self.chunk_size, self.margin)
              for b, n in zip(packed, ns_real)]
        # Short groups pad by REPLICATING the last scene's already-packed
        # buffer (padding the scene list before packing would re-pack and
        # re-chunk_count the same scene once per idle lane — an O(N) host
        # cost multiplied by the lane count on every tail group).
        n_fill = self.n_lanes - n_real
        bufs = np.stack(packed + [packed[-1]] * n_fill)
        ns = np.array(ns_real + [ns_real[-1]] * n_fill, np.int32)
        slack = self.batch_size if self.layout_kind == "q16" else 0
        x = max(xs) + slack
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            dbufs = jax.device_put(
                bufs, NamedSharding(self.mesh, P(self._axis, None)))
            dns = jax.device_put(ns, NamedSharding(self.mesh, P(self._axis)))
        else:
            dbufs = jax.device_put(bufs)
            dns = jax.device_put(ns)
        return (names, ns, n_real, n_pad, _bucket(x, 4 * self.batch_size),
                x, dbufs, dns)

    def _compute_group(self, staged):
        names, ns, n_real, n_pad, x_cap, x, dbufs, dns = staged
        nb = -(-x // self.batch_size)
        pk = (n_pad, x_cap, nb)
        if pk not in self._programs:
            if self.mesh is not None:
                self._programs[pk] = make_scene_program_mesh(
                    self.state, self._layout(n_pad), x_cap, nb,
                    self.batch_size, self.npoints, self.mesh, self.seed,
                    chunk_size=self.chunk_size, margin=self.margin,
                    axis_name=self._axis)
            else:
                self._programs[pk] = make_scene_program_group(
                    self.state, self._layout(n_pad), x_cap, nb,
                    self.batch_size, self.npoints, self.seed,
                    chunk_size=self.chunk_size, margin=self.margin)
        acc, n_chunks = self._programs[pk](self.state, dbufs, dns)
        try:
            acc.copy_to_host_async()
        except AttributeError:
            pass
        return names, ns, n_real, acc, n_chunks, nb * self.batch_size

    def _fetch_group(self, computed):
        names, ns, n_real, acc, n_chunks, cap = computed
        ncs = np.asarray(n_chunks)
        labs = np.asarray(acc)
        for i in range(n_real):
            if int(ncs[i]) > cap:
                raise RuntimeError(
                    f"device chunker produced {int(ncs[i])} chunks for "
                    f"scene {names[i]!r} but only {cap} predict slots were "
                    "scheduled — the q16 host/device chunk-count slack was "
                    "exceeded; raise the slack in "
                    "ResidentSceneServer._stage_group")
            yield names[i], labs[i, :ns[i]].astype(np.int32)

    # -- public API ------------------------------------------------------

    def predict_scene(self, scene: Dict[str, np.ndarray]) -> np.ndarray:
        """points (N,3) [+ colors u8 / normals f32] -> per-vertex labels
        (N,) int32."""
        if self.n_lanes > 1:
            return next(self._fetch_group(
                self._compute_group(self._stage_group([scene]))))[1]
        return self._fetch(self._compute(self._stage(scene)))[1]

    def predict_scenes(self, scenes) -> Iterator[Tuple[str, np.ndarray]]:
        """Pipelined multi-scene serving; yields (scene_name, labels).

        Uploads run in a prefetch thread while the main thread drives
        device compute and fetches, ``pipeline_depth`` scenes (or
        scene-groups, on a mesh) in flight."""
        from collections import deque

        from pointcloud_segmentation_attention_tpu.data.pipeline import (
            prefetch,
        )

        if self.n_lanes > 1:
            def groups():
                g = []
                for s in scenes:
                    g.append(s)
                    if len(g) == self.n_lanes:
                        yield g
                        g = []
                if g:
                    yield g

            staged = prefetch((self._stage_group(g) for g in groups()),
                              depth=self.pipeline_depth)
            pending = deque()
            for st in staged:
                pending.append(self._compute_group(st))
                if len(pending) > self.pipeline_depth:
                    yield from self._fetch_group(pending.popleft())
            while pending:
                yield from self._fetch_group(pending.popleft())
            return

        staged = prefetch((self._stage(s) for s in scenes),
                          depth=self.pipeline_depth)
        pending = deque()
        for st in staged:
            pending.append(self._compute(st))
            if len(pending) > self.pipeline_depth:
                yield self._fetch(pending.popleft())
        while pending:
            yield self._fetch(pending.popleft())


def generate_predictions_resident(
    state,
    data_root: str,
    scene_names,
    output_dir: str,
    npoints: int = 8192,
    batch_size: int = 16,
    layout: str = "q16",
    use_colors: bool = True,
    use_normals: bool = True,
    with_labels: bool = True,
    save_npy: bool = True,
    seed: int = 0,
    chunk_size: float = CHUNK_SIZE,
    margin: float = CONTEXT_MARGIN,
    mesh=None,
):
    """Resident-path twin of ``eval.full_scene.generate_predictions``
    (ref ``benchmark/generate_predictions.py:151-186``): predict every
    scene through ``ResidentSceneServer`` and write the same artifacts
    (per-scene npy + ScanNet-benchmark txt).  Yields per-scene dicts."""
    import os

    from pointcloud_segmentation_attention_tpu.data.scannet.scenes import (
        load_scene_mapped,
    )
    from pointcloud_segmentation_attention_tpu.eval.benchmark import (
        export_benchmark_txt,
    )

    os.makedirs(output_dir, exist_ok=True)
    server = ResidentSceneServer(
        state, npoints, batch_size=batch_size, layout=layout, seed=seed,
        use_colors=use_colors, use_normals=use_normals,
        chunk_size=chunk_size, margin=margin, mesh=mesh)
    scenes = []

    def stream():
        for name in scene_names:
            sc = load_scene_mapped(data_root, name)
            sc["scene_name"] = name
            scenes.append(sc)
            yield sc

    for name, pred in server.predict_scenes(stream()):
        scene = next(s for s in scenes if s["scene_name"] == name)
        if save_npy:
            np.save(os.path.join(output_dir, f"{name}_points.npy"),
                    scene["points"])
            np.save(os.path.join(output_dir, f"{name}_labels.npy"), pred)
            if with_labels:
                np.save(os.path.join(output_dir, f"{name}_gt.npy"),
                        scene["labels"])
        export_benchmark_txt(os.path.join(output_dir, f"{name}.txt"), pred)
        scenes.remove(scene)
        yield {
            "scene_name": name,
            "predictions": pred,
            "labels": scene["labels"] if with_labels else None,
        }
