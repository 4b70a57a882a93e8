"""Native (C++) host-side ops via ctypes.

Builds ``native_ops.cpp`` on first use (g++, cached .so next to the source),
mirroring how the reference shipped native host code as a ctypes .so
(``utils/render_balls_so.cpp`` + ``show3d_balls.py:9-12``).  Everything here
degrades gracefully: if no compiler is available, ``available()`` is False and
callers fall back to the numpy implementations.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native_ops.cpp")
_SO = os.path.join(_HERE, "libnative_ops.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or os.path.getmtime(_SO) < os.path.getmtime(_SRC):
            try:
                subprocess.run(
                    ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                     "-o", _SO, _SRC],
                    check=True, capture_output=True,
                )
            except (subprocess.CalledProcessError, FileNotFoundError):
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.render_ball.restype = None
        lib.three_nn_cpu.restype = None
        lib.ball_query_cpu.restype = None
        lib.grid_chunk_assign.restype = ctypes.c_int64
        _lib = lib
        return lib


def available() -> bool:
    return _build() is not None


def render_ball(
    points: np.ndarray, colors: np.ndarray, h: int = 600, w: int = 600,
    radius: int = 3, background: int = 255,
) -> np.ndarray:
    """Z-buffered ball-splat render of screen-space points (n,3 float; x,y in
    pixels, z = depth) with per-point (n,3) uint8 colors -> (h,w,3) uint8."""
    lib = _build()
    points = np.ascontiguousarray(points, np.float32)
    colors = np.ascontiguousarray(colors, np.uint8)
    image = np.full((h, w, 3), background, np.uint8)
    if lib is None:
        return _render_ball_numpy(points, colors, image, radius)
    zbuf = np.full((h, w), np.inf, np.float32)
    lib.render_ball(
        ctypes.c_int(h), ctypes.c_int(w),
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        zbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int(len(points)),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        colors.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        ctypes.c_int(radius),
    )
    return image


def _render_ball_numpy(points, colors, image, radius):
    h, w, _ = image.shape
    zbuf = np.full((h, w), np.inf, np.float32)
    order = np.argsort(-points[:, 2])  # far-to-near fallback (no sphere bump)
    for i in order:
        x, y, z = points[i]
        xi, yi = int(round(x)), int(round(y))
        for dy in range(-radius, radius + 1):
            for dx in range(-radius, radius + 1):
                if dx * dx + dy * dy > radius * radius:
                    continue
                px, py = xi + dx, yi + dy
                if 0 <= px < w and 0 <= py < h and z < zbuf[py, px]:
                    zbuf[py, px] = z
                    image[py, px] = colors[i]
    return image


def three_nn(xyz1: np.ndarray, xyz2: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(dist (B,N,3) sq, idx (B,N,3) i32) — C++ fast path, numpy fallback."""
    lib = _build()
    xyz1 = np.ascontiguousarray(xyz1, np.float32)
    xyz2 = np.ascontiguousarray(xyz2, np.float32)
    b, n, _ = xyz1.shape
    m = xyz2.shape[1]
    if lib is None:
        d2 = np.sum(
            (xyz1[:, :, None, :].astype(np.float64) - xyz2[:, None, :, :]) ** 2, -1
        )
        order = np.argsort(d2, -1, kind="stable")[..., :3]
        return (
            np.take_along_axis(d2, order, -1).astype(np.float32),
            order.astype(np.int32),
        )
    dist = np.empty((b, n, 3), np.float32)
    idx = np.empty((b, n, 3), np.int32)
    lib.three_nn_cpu(
        ctypes.c_int(b), ctypes.c_int(n), ctypes.c_int(m),
        xyz1.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        xyz2.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dist.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return dist, idx


def ball_query(
    xyz: np.ndarray, centers: np.ndarray, radius: float, nsample: int
) -> Tuple[np.ndarray, np.ndarray]:
    """(idx (B,M,ns) i32, cnt (B,M) i32) with reference first-k semantics."""
    lib = _build()
    if lib is None:
        raise RuntimeError("native ball_query unavailable (no compiler)")
    xyz = np.ascontiguousarray(xyz, np.float32)
    centers = np.ascontiguousarray(centers, np.float32)
    b, n, _ = xyz.shape
    m = centers.shape[1]
    idx = np.empty((b, m, nsample), np.int32)
    cnt = np.empty((b, m), np.int32)
    lib.ball_query_cpu(
        ctypes.c_int(b), ctypes.c_int(n), ctypes.c_int(m),
        ctypes.c_float(radius), ctypes.c_int(nsample),
        xyz.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        centers.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        cnt.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return idx, cnt


def grid_chunk_assign(
    points: np.ndarray, cell: float = 1.5, margin: float = 0.2
) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """(cell_ids, point_ids, ncell_x, ncell_y) pairs for the full-scene
    chunker's selection loop; C++ O(N), numpy fallback."""
    points = np.ascontiguousarray(points, np.float32)
    mn = points.min(0)
    mx = points.max(0)
    ncx = max(1, int(np.ceil((mx[0] - mn[0]) / cell)))
    ncy = max(1, int(np.ceil((mx[1] - mn[1]) / cell)))
    lib = _build()
    if lib is None:
        # Vectorized margin-enlarged cell enumeration: each point lands in the
        # cells its +-margin box overlaps.  Per axis that is
        # [floor((p-margin)/cell), floor((p+margin)/cell)] — at most
        # floor(2*margin/cell)+2 offsets — so candidates are a fixed
        # (N, Kx, Ky) broadcast, masked to the valid range.  Pair order
        # matches the C++ writer: point-major, then cx, then cy.
        rel = (points[:, :2].astype(np.float64) - mn[:2])
        lo = np.floor((rel - margin) / cell).astype(np.int64)  # (N, 2)
        hi = np.floor((rel + margin) / cell).astype(np.int64)
        span = hi - lo  # >= 0 per axis
        kx = int(span[:, 0].max(initial=0)) + 1
        ky = int(span[:, 1].max(initial=0)) + 1
        ox = np.arange(kx)[None, :]                      # (1, Kx)
        oy = np.arange(ky)[None, :]                      # (1, Ky)
        cx = (lo[:, :1] + ox)[:, :, None]                # (N, Kx, 1)
        cy = (lo[:, 1:2] + oy)[:, None, :]               # (N, 1, Ky)
        valid = (
            (ox[:, :, None] <= span[:, :1, None])        # within this point's x-span
            & (oy[:, None, :] <= span[:, 1:2, None])     # ... y-span
            & (cx >= 0) & (cx < ncx) & (cy >= 0) & (cy < ncy)
        )
        cell_ids = np.broadcast_to(cx * ncy + cy, valid.shape)
        pids = np.broadcast_to(
            np.arange(len(points), dtype=np.int64)[:, None, None], valid.shape
        )
        flat = valid.reshape(-1)
        return cell_ids.reshape(-1)[flat], pids.reshape(-1)[flat], ncx, ncy
    capacity = len(points) * 4
    pairs = np.empty((capacity, 2), np.int64)
    n_written = lib.grid_chunk_assign(
        ctypes.c_int64(len(points)),
        points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_float(mn[0]), ctypes.c_float(mn[1]),
        ctypes.c_int(ncx), ctypes.c_int(ncy),
        ctypes.c_float(cell), ctypes.c_float(margin),
        ctypes.c_int64(capacity), pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if n_written > capacity:  # extremely dense margins; retry with exact size
        pairs = np.empty((n_written, 2), np.int64)
        n_written = lib.grid_chunk_assign(
            ctypes.c_int64(len(points)),
            points.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            ctypes.c_float(mn[0]), ctypes.c_float(mn[1]),
            ctypes.c_int(ncx), ctypes.c_int(ncy),
            ctypes.c_float(cell), ctypes.c_float(margin),
            ctypes.c_int64(n_written), pairs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        )
    pairs = pairs[:n_written]
    return pairs[:, 0].copy(), pairs[:, 1].copy(), ncx, ncy
