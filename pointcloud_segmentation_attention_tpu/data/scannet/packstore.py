"""Memmap-able packed-record chunk store: zero-decode replay.

The r2 trainer replayed one ``.npz`` per (epoch, scene) chunk
(``precompute.replay_train_chunks``) — every batch paid zlib-free but still
real npz parsing, per-chunk dict assembly, and a stack.  Production TPU
input pipelines want the opposite: a fixed-size binary record per sample so
an epoch is ONE flat file, replay is ``np.memmap`` + fancy-index (a single
memcpy straight into the batch buffer), and the batch is already in the
single-buffer wire format (``data/wire.py``) ready for its one H2D
transfer.

Layout on disk::

    pack_dir/
      meta.json            {n, layout, use_colors, use_normals, row_nbytes,
                            scenes: [...], epochs: K}
      epoch-0000.pack      (n_scenes, row_nbytes) u8, C-order
      epoch-0001.pack      ...

Replaces the role of the reference's pickle replay
(``precompute_dataset.py:149-271``, its answer to the pipeline bottleneck,
Report.pdf §3.3) with an O(memcpy) host path.
"""
from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

from pointcloud_segmentation_attention_tpu.data.wire import (
    WireSpec, pack_chunks,
)
from pointcloud_segmentation_attention_tpu.data.scannet import precompute

META_NAME = "meta.json"


def _epoch_path(pack_dir: str, epoch: int) -> str:
    return os.path.join(pack_dir, f"epoch-{epoch:04d}.pack")


def write_pack_from_npz(
    precompute_dir: str,
    pack_dir: str,
    epochs: int,
    scene_names: Sequence[str],
    spec: WireSpec,
) -> int:
    """Convert precomputed npz chunks into the packed store; returns rows
    written.  Idempotent per epoch file (skips existing) — growing ``epochs``
    against the same scenes/spec extends the store.  Any OTHER change
    (scene list, record layout, points-per-sample) invalidates the existing
    epoch files, so it raises instead of silently reusing a stale corpus."""
    os.makedirs(pack_dir, exist_ok=True)
    meta = {
        "n": spec.n, "layout": spec.layout,
        "use_colors": spec.use_colors, "use_normals": spec.use_normals,
        "row_nbytes": spec.row_nbytes,
        "scenes": list(scene_names), "epochs": epochs,
    }
    meta_path = os.path.join(pack_dir, META_NAME)
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            old = json.load(f)
        mismatched = [k for k in ("n", "layout", "use_colors", "use_normals",
                                  "row_nbytes", "scenes")
                      if old.get(k) != meta[k]]
        if mismatched:
            raise ValueError(
                f"pack store {pack_dir!r} was written for different "
                f"{mismatched} — delete it to rebuild (its epoch files do "
                f"not match the current chunks)"
            )
        # Never shrink an existing store's view: a caller asking for fewer
        # epochs than already written would otherwise orphan the extra
        # epoch-*.pack files while the meta silently hid them from readers.
        meta["epochs"] = max(meta["epochs"], old.get("epochs", 0))
    written = 0
    for epoch in range(epochs):
        path = _epoch_path(pack_dir, epoch)
        if os.path.exists(path):
            continue
        chunks = [
            precompute._load_chunk(
                precompute._train_chunk_path(precompute_dir, epoch, name))
            for name in scene_names
        ]
        rows = pack_chunks(chunks, spec)
        # Unique temp per writer: concurrent multi-host builders over a
        # shared filesystem must not interleave into one tmp file.
        tmp = f"{path}.tmp.{os.getpid()}"
        rows.tofile(tmp)
        os.replace(tmp, path)  # atomic: no partial epoch files survive
        written += len(rows)
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return written


class PackReader:
    """Replay a packed store as an infinite stream of wire batches."""

    def __init__(self, pack_dir: str):
        with open(os.path.join(pack_dir, META_NAME)) as f:
            meta = json.load(f)
        self.spec = WireSpec(
            n=meta["n"], layout=meta["layout"],
            use_colors=meta["use_colors"], use_normals=meta["use_normals"],
        )
        if self.spec.row_nbytes != meta["row_nbytes"]:
            raise ValueError(
                f"pack meta row_nbytes {meta['row_nbytes']} != "
                f"{self.spec.row_nbytes} computed from the spec — "
                f"wire layout changed since this pack was written"
            )
        self.pack_dir = pack_dir
        self.epochs = meta["epochs"]
        self.scenes: List[str] = meta["scenes"]
        self._maps: Dict[int, np.ndarray] = {}

    def _epoch_rows(self, epoch: int) -> np.ndarray:
        mm = self._maps.get(epoch)
        if mm is None:
            mm = np.memmap(
                _epoch_path(self.pack_dir, epoch), dtype=np.uint8, mode="r",
            ).reshape(len(self.scenes), self.spec.row_nbytes)
            self._maps[epoch] = mm
        return mm

    def replay_batches(
        self, batch_size: int, shuffle_seed: int = 0,
    ) -> Iterator[Dict[str, np.ndarray]]:
        """Infinite ``{'packed': (B, row_nbytes) u8}`` batches.  Mirrors
        ``precompute.replay_train_chunks`` semantics: each pass walks all
        epochs, scene order reshuffled per epoch; the per-epoch remainder
        carries over into the next epoch's batches (like the chunk-stream
        batching it replaces)."""
        rng = np.random.RandomState(shuffle_seed)
        carry: Optional[np.ndarray] = None
        while True:
            for epoch in range(self.epochs):
                rows = self._epoch_rows(epoch)
                order = rng.permutation(len(rows))
                shuffled = rows[order]  # one bulk memcpy from the mapping
                if carry is not None and len(carry):
                    shuffled = np.concatenate([carry, shuffled], axis=0)
                n_full = len(shuffled) // batch_size * batch_size
                for i in range(0, n_full, batch_size):
                    yield {"packed": shuffled[i:i + batch_size]}
                carry = shuffled[n_full:].copy()
