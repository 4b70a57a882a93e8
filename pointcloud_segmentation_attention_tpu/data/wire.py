"""Packed single-buffer wire format: one H2D transfer per training batch.

The end-to-end trainer rate is host/link-bound on a remote-tunneled chip
(docs/performance.md): the r2 'compact' wire format halved bytes but still
shipped 4-6 separate arrays per step, paying the tunnel's per-transfer
latency each time.  Here every sample is ONE fixed-size uint8 record and a
batch is a single ``(B, row_nbytes)`` uint8 array — one ``device_put`` —
and the decode (bitcast + dequantize + feature concat + class-weight
lookup) runs ON DEVICE, fused into the jitted step by XLA.

Two layouts:

- ``f32``  — bit-exact: points f32, normals f16, colors u8, labels u8,
  mask u8 (23 B/point with colors+normals; same bytes as 'compact' but one
  transfer).
- ``q16``  — quantized: points u16 over the per-sample bbox (resolution
  extent/65535 ≈ 0.05 mm on a 1.9 m chunk — far below sensor noise),
  normals i8 (±1/127).  14 B/point: 1.64x fewer bytes than f32/compact.

Record layout keeps every section aligned for on-device bitcast: the f32
section leads, then f16/u16, then bytes.  The per-sample bbox header of
``q16`` is 8 f32 values (mn[3], mx[3], 2 pad) = 32 B.

This replaces the role of the reference's pickled-chunk replay
(``precompute_dataset.py:149-271``) as the answer to its pipeline
bottleneck (Report.pdf §3.3) — but designed for a TPU serving path:
fixed shapes, single buffer, compiler-fused decode.
"""
from __future__ import annotations

import re
from typing import Dict, List, NamedTuple, Optional, Tuple

import numpy as np

_FORMAT_RE = re.compile(r"packed(_q16)?(?:x(\d+))?")


class WireSpec(NamedTuple):
    """Static (hashable) description of a packed record; close over it when
    jitting a step so the on-device unpack compiles once."""

    n: int                    # points per sample
    layout: str = "f32"       # 'f32' | 'q16'
    use_colors: bool = True
    use_normals: bool = True

    @classmethod
    def from_format(cls, fmt: str, n: int, use_colors: bool,
                    use_normals: bool) -> Tuple[Optional["WireSpec"], int]:
        """Parse a wire-format string ('packed', 'packed_q16',
        'packed_q16x4', ...) -> (spec, n_transfer_splits); (None, 1) for
        non-packed formats.  THE single owner of the format grammar."""
        m = _FORMAT_RE.fullmatch(fmt)
        if not m:
            return None, 1
        spec = cls(n=n, layout="q16" if m.group(1) else "f32",
                   use_colors=use_colors, use_normals=use_normals)
        return spec, int(m.group(2) or 1)

    @property
    def header_nbytes(self) -> int:
        return 32 if self.layout == "q16" else 0

    @property
    def row_nbytes(self) -> int:
        n = self.n
        if self.layout == "f32":
            size = 12 * n                     # points f32
            if self.use_normals:
                size += 6 * n                 # normals f16
        elif self.layout == "q16":
            size = self.header_nbytes + 6 * n  # bbox + points u16
            if self.use_normals:
                size += 3 * n                 # normals i8
        else:
            raise ValueError(f"unknown wire layout {self.layout!r}")
        if self.use_colors:
            size += 3 * n                     # colors u8
        size += 2 * n                         # labels u8 + mask u8
        return size


def _row_views(row: np.ndarray, spec: WireSpec) -> Dict[str, np.ndarray]:
    """Split a (B, row_nbytes) u8 array into per-field views (no copies)."""
    b = row.shape[0]
    n = spec.n
    off = 0

    def take(nbytes):
        nonlocal off
        v = row[:, off:off + nbytes]
        off += nbytes
        return v

    out = {}
    if spec.layout == "f32":
        out["points"] = take(12 * n)
        if spec.use_normals:
            out["normals"] = take(6 * n)
    else:
        out["bbox"] = take(32)
        out["points"] = take(6 * n)
        if spec.use_normals:
            out["normals"] = take(3 * n)
    if spec.use_colors:
        out["colors"] = take(3 * n)
    out["labels"] = take(n)
    out["mask"] = take(n)
    assert off == spec.row_nbytes
    return out


def pack_arrays(
    points: np.ndarray,            # (B, N, 3) f32
    labels: np.ndarray,            # (B, N) int
    mask: np.ndarray,              # (B, N) bool/int
    colors: Optional[np.ndarray],  # (B, N, 3) uint8-ranged
    normals: Optional[np.ndarray],  # (B, N, 3) f32
    spec: WireSpec,
) -> np.ndarray:
    """Stacked arrays -> (B, row_nbytes) u8 packed batch."""
    b = points.shape[0]
    row = np.empty((b, spec.row_nbytes), np.uint8)
    v = _row_views(row, spec)
    if spec.layout == "f32":
        v["points"][:] = np.ascontiguousarray(
            points, np.float32).view(np.uint8).reshape(b, -1)
        if spec.use_normals:
            v["normals"][:] = np.ascontiguousarray(
                normals, np.float16).view(np.uint8).reshape(b, -1)
    else:
        mn = points.min(axis=1)                          # (B, 3)
        mx = points.max(axis=1)
        header = np.zeros((b, 8), np.float32)
        header[:, :3] = mn
        header[:, 3:6] = mx
        v["bbox"][:] = header.view(np.uint8)
        scale = np.where(mx > mn, mx - mn, 1.0)
        q = np.clip(
            np.rint((points - mn[:, None]) / scale[:, None] * 65535.0),
            0, 65535,
        ).astype(np.uint16)
        v["points"][:] = q.view(np.uint8).reshape(b, -1)
        if spec.use_normals:
            nq = np.clip(np.rint(np.asarray(normals, np.float32) * 127.0),
                         -127, 127).astype(np.int8)
            v["normals"][:] = nq.view(np.uint8).reshape(b, -1)
    if spec.use_colors:
        v["colors"][:] = np.asarray(colors).astype(np.uint8).reshape(b, -1)
    v["labels"][:] = np.asarray(labels).astype(np.uint8)
    v["mask"][:] = (np.asarray(mask) != 0).astype(np.uint8)
    return row


def pack_chunks(chunks: List[Dict[str, np.ndarray]], spec: WireSpec) -> np.ndarray:
    """List of chunk dicts (precompute format: points/labels/colors/normals/
    weights) -> packed (B, row_nbytes) u8 batch.  The stored per-point weight
    only carries the inner-box mask (!= 0), like ref train.py:106-108."""
    return pack_arrays(
        np.stack([c["points"] for c in chunks]).astype(np.float32),
        np.stack([c["labels"] for c in chunks]),
        np.stack([c["weights"] for c in chunks]) != 0,
        np.stack([c["colors"] for c in chunks]) if spec.use_colors else None,
        np.stack([c["normals"] for c in chunks]) if spec.use_normals else None,
        spec,
    )


def unpack_batch(packed, spec: WireSpec, class_weights=None) -> Dict:
    """(B, row_nbytes) u8 device array -> standard batch dict, in jnp ops
    (jit-safe; XLA fuses the decode into the consuming step).

    Returns {'points' f32, 'labels' i32, 'weights' f32, 'features' f32?} —
    weights = class_weight[label] * inner_mask exactly as
    ``train.steps.make_sample_weights`` (ref train.py:106-108).
    """
    import jax
    import jax.numpy as jnp

    from pointcloud_segmentation_attention_tpu.train.steps import (
        make_sample_weights,
    )

    b = packed.shape[0]
    n = spec.n
    off = 0

    def take(nbytes):
        nonlocal off
        v = jax.lax.slice_in_dim(packed, off, off + nbytes, axis=1)
        off += nbytes
        return v

    def bitcast(u8, dtype, *shape):
        width = jnp.dtype(dtype).itemsize
        return jax.lax.bitcast_convert_type(
            u8.reshape(b, *shape, width), dtype)

    out = {}
    if spec.layout == "f32":
        out["points"] = bitcast(take(12 * n), jnp.float32, n, 3)
        normals = (bitcast(take(6 * n), jnp.float16, n, 3).astype(jnp.float32)
                   if spec.use_normals else None)
    else:
        header = bitcast(take(32), jnp.float32, 8)     # (B, 8)
        mn = header[:, None, :3]
        mx = header[:, None, 3:6]
        q = bitcast(take(6 * n), jnp.uint16, n, 3).astype(jnp.float32)
        scale = jnp.where(mx > mn, mx - mn, 1.0)
        out["points"] = mn + q * (scale / 65535.0)
        if spec.use_normals:
            i8 = jax.lax.bitcast_convert_type(take(3 * n), jnp.int8)
            normals = i8.reshape(b, n, 3).astype(jnp.float32) / 127.0
        else:
            normals = None
    parts = []
    if spec.use_colors:
        colors = take(3 * n).reshape(b, n, 3)
        parts.append(colors.astype(jnp.float32) / 255.0)
    if spec.use_normals:
        parts.append(normals)
    labels = take(n).astype(jnp.int32)
    mask = take(n)
    out["labels"] = labels
    out["weights"] = make_sample_weights(labels, mask != 0, class_weights)
    if parts:
        out["features"] = jnp.concatenate(parts, axis=-1)
    return out


def split_wire_batch(batch: Dict[str, np.ndarray], k: int) -> Dict[str, np.ndarray]:
    """{'packed': rows} -> K contiguous byte-column slices ('packed0'..).

    On a high-latency host->device link, K concurrent in-flight transfers
    pipeline where one large put serializes (measured on the tunneled chip;
    see utils/h2d_bench).  The step re-concatenates on device
    (train.steps.expand_wire_batch)."""
    if k <= 1:
        return batch
    rows = batch["packed"]
    bounds = np.linspace(0, rows.shape[1], k + 1).astype(int)
    return {
        f"packed{i}": np.ascontiguousarray(rows[:, bounds[i]:bounds[i + 1]])
        for i in range(k)
    }
