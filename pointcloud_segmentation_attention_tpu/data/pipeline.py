"""Chunk-dict -> device-batch assembly, batching, threaded prefetch.

Replaces the reference's tf.data stage (``attention_points/train.py:74-109``):
``get_data_tensors`` there batched+prefetched the precomputed chunks, divided
colors by 255, selected the feature concat, and recomputed
``weight = class_weight[label] * (stored_weight != 0)`` (:106-108).  Here the
same happens in plain numpy on the host; devices only ever see the finished
fixed-shape batch.
"""
from __future__ import annotations

import queue
import threading
from typing import Dict, Iterable, Iterator, List, Optional

import numpy as np


def assemble_features(
    colors: Optional[np.ndarray],
    normals: Optional[np.ndarray],
    use_colors: bool,
    use_normals: bool,
) -> Optional[np.ndarray]:
    """Concat the selected per-point features: colors are scaled from
    [0, 255] ints to [0, 1] floats (ref train.py:96-104).  Returns None when
    no features are selected."""
    parts = []
    if use_colors and colors is not None:
        parts.append(np.asarray(colors, np.float32) / 255.0)
    if use_normals and normals is not None:
        parts.append(np.asarray(normals, np.float32))
    if not parts:
        return None
    return np.concatenate(parts, axis=-1)


def make_batch(
    chunks: List[Dict[str, np.ndarray]], use_colors: bool, use_normals: bool,
    wire: str = "f32",
) -> Dict[str, np.ndarray]:
    """Stack chunk dicts into one batch dict.

    weights = class_weight[label] * (stored_weight != 0) — the stored weight's
    only information is the inner-box mask, the class weight is re-applied
    fresh (exactly ref train.py:106-108).

    ``wire='compact'`` emits the low-byte wire format instead (labels + mask
    uint8, colors raw uint8, normals f16; the f32 features/weights are
    reconstructed on device by ``train.steps.expand_wire_batch``) — about
    half the H2D bytes per step, the measured end-to-end bottleneck on a
    remote-tunneled chip.
    """
    from pointcloud_segmentation_attention_tpu.data.wire import (
        WireSpec, pack_chunks, split_wire_batch,
    )

    spec, n_splits = WireSpec.from_format(
        wire, n=chunks[0]["points"].shape[0],
        use_colors=use_colors, use_normals=use_normals,
    )
    if spec is not None:
        # Single-buffer wire (data/wire.py): a batch is one (B, row_nbytes)
        # u8 array -> one H2D transfer; decode fuses into the jitted step.
        # An 'xK' suffix splits it into K concurrent byte-column slices
        # (measured worse than one buffer on this tunnel; knob kept).
        return split_wire_batch({"packed": pack_chunks(chunks, spec)},
                                n_splits)

    points = np.stack([c["points"] for c in chunks]).astype(np.float32)
    labels_i = np.stack([c["labels"] for c in chunks])
    mask = np.stack([c["weights"] for c in chunks]) != 0

    if wire == "compact":
        batch = {
            "points": points,
            "labels": labels_i.astype(np.uint8),
            "mask": mask.astype(np.uint8),
        }
        if use_colors:
            batch["colors_u8"] = np.stack(
                [c["colors"] for c in chunks]).astype(np.uint8)
        if use_normals:
            batch["normals_f16"] = np.stack(
                [c["normals"] for c in chunks]).astype(np.float16)
        return batch

    from pointcloud_segmentation_attention_tpu.data.scannet.label_map import (
        TRAIN_LABEL_WEIGHTS,
    )

    labels = labels_i.astype(np.int32)
    weights = TRAIN_LABEL_WEIGHTS[labels] * mask.astype(np.float32)
    batch = {"points": points, "labels": labels, "weights": weights.astype(np.float32)}
    features = assemble_features(
        np.stack([c["colors"] for c in chunks]) if use_colors else None,
        np.stack([c["normals"] for c in chunks]) if use_normals else None,
        use_colors, use_normals,
    )
    if features is not None:
        batch["features"] = features
    return batch


def batched(
    chunk_iter: Iterable[Dict[str, np.ndarray]],
    batch_size: int,
    use_colors: bool,
    use_normals: bool,
    pad_final: bool = False,
    wire: str = "f32",
) -> Iterator[Dict[str, np.ndarray]]:
    """Group chunks into batches of exactly ``batch_size``.

    The remainder is dropped by default (like the reference's fixed
    BATCH_SIZE=16 train iterator); with ``pad_final=True`` (evaluation) the
    last partial batch is padded with zero-weight, label-0 copies of its
    first chunk — the pad rows contribute nothing to weighted losses or to
    metrics that mask ``labels > 0``, so no val chunk is silently skipped."""
    buf: List[Dict[str, np.ndarray]] = []
    for chunk in chunk_iter:
        buf.append(chunk)
        if len(buf) == batch_size:
            yield make_batch(buf, use_colors, use_normals, wire)
            buf = []
    if buf and pad_final:
        pad = dict(buf[0])
        pad["labels"] = np.zeros_like(buf[0]["labels"])
        pad["weights"] = np.zeros_like(buf[0]["weights"])
        buf.extend([pad] * (batch_size - len(buf)))
        yield make_batch(buf, use_colors, use_normals, wire)


_SENTINEL = object()


def prefetch(iterator: Iterable, depth: int = 4) -> Iterator:
    """Background-thread prefetch (the tf.data ``prefetch(4)`` equivalent,
    ref train.py:90): overlaps host-side chunk loading with device steps.
    Exceptions in the producer re-raise in the consumer."""
    q: "queue.Queue" = queue.Queue(maxsize=depth)

    def worker():
        try:
            for item in iterator:
                q.put(item)
        except BaseException as e:  # propagate to consumer
            q.put((_SENTINEL, e))
            return
        q.put((_SENTINEL, None))

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    while True:
        item = q.get()
        if isinstance(item, tuple) and len(item) == 2 and item[0] is _SENTINEL:
            if item[1] is not None:
                raise item[1]
            return
        yield item
