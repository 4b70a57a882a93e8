"""Chunk precomputation to disk + replay iterators + eval scene streams.

Host-side equivalent of ``attention_points/scannet_dataset/
precompute_dataset.py``: the reference ran its TF-graph chunk sampler once per
(epoch, scene) and pickled the results (:15-78), then replayed the pickles as
an infinite generator during training (:149-271) — 59 % faster epochs
(Report.pdf §3.3).  Here chunks are npz files (one per epoch-scene for train,
one per scene for val), and the eval stream yields whole scenes with
full-coverage chunks, masks and original indices (:81-146).
"""
from __future__ import annotations

import itertools
import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

from pointcloud_segmentation_attention_tpu.data.scannet import chunks as chunks_lib
from pointcloud_segmentation_attention_tpu.data.scannet import scenes as scenes_lib

CHUNK_KEYS = ("points", "labels", "colors", "normals", "weights")


def _train_chunk_path(out_dir: str, epoch: int, scene: str) -> str:
    return os.path.join(out_dir, f"{epoch}-{scene}.npz")


def _val_chunk_path(out_dir: str, scene: str) -> str:
    return os.path.join(out_dir, f"val-{scene}.npz")


def precompute_train_chunks(
    data_root: str,
    scene_names: Sequence[str],
    out_dir: str,
    epochs: int,
    npoints: int = 8192,
    start_epoch: int = 0,
    seed: int = 0,
) -> int:
    """One random z-rotated chunk per (epoch, scene), written as
    ``{epoch}-{scene}.npz`` (ref precompute_dataset.py:15-46; the epoch-scene
    file naming and the refuse-to-clobber behavior match :39-46).
    ``start_epoch`` resumes an interrupted job (ref ``add_epoch`` :16,28).
    Returns the number of chunks written."""
    import zlib

    os.makedirs(out_dir, exist_ok=True)
    written = 0
    for epoch in range(start_epoch, start_epoch + epochs):
        for name in scene_names:
            path = _train_chunk_path(out_dir, epoch, name)
            if os.path.exists(path):
                raise FileExistsError(
                    f"{path} already exists; use start_epoch to resume"
                )
            # Keyed by the scene NAME, not its list position: host-sharded
            # precompute (--num_hosts) must produce bitwise-identical chunks
            # to a single-host run (tests/test_multihost.py).
            rng = np.random.RandomState(
                (seed * 1_000_003 + epoch * 8191
                 + zlib.crc32(name.encode())) % (2**31 - 1)
            )
            scene = scenes_lib.load_scene_mapped(data_root, name)
            pts, nrm = chunks_lib.random_z_rotation(
                scene["points"], scene["normals"], rng
            )
            p, l, c, n, w = chunks_lib.sample_random_chunk(
                pts, scene["labels"], scene["colors"], nrm, npoints, rng
            )
            np.savez(path, points=p, labels=l, colors=c, normals=n, weights=w)
            written += 1
    return written


def precompute_val_chunks(
    data_root: str,
    scene_names: Sequence[str],
    out_dir: str,
    npoints: int = 8192,
    seed: int = 0,
) -> int:
    """Full-coverage grid chunks per val scene, one npz per scene
    (ref precompute_dataset.py:49-78).  Returns total chunk count."""
    os.makedirs(out_dir, exist_ok=True)
    total = 0
    for name in scene_names:
        scene = scenes_lib.load_scene_mapped(data_root, name)
        out = chunks_lib.grid_chunks_for_eval(
            scene["points"], scene["labels"], scene["colors"],
            scene["normals"], npoints, rng=np.random.RandomState(seed),
        )
        np.savez(_val_chunk_path(out_dir, name),
                 **{k: out[k] for k in CHUNK_KEYS})
        total += len(out["points"])
    return total


def _load_chunk(path: str) -> Dict[str, np.ndarray]:
    with np.load(path) as z:
        return {k: z[k] for k in CHUNK_KEYS}


def replay_train_chunks(
    out_dir: str,
    epochs_available: int,
    scene_names: Sequence[str],
    shuffle_seed: int = 0,
) -> Iterator[Dict[str, np.ndarray]]:
    """Infinite chunk replay: each pass walks all precomputed epochs with the
    scene order reshuffled per epoch (ref precompute_dataset.py:149-165 and
    generator_dataset.py:28-35 which shuffles train scenes each epoch)."""
    rng = np.random.RandomState(shuffle_seed)
    names = list(scene_names)
    for _pass in itertools.count():
        for epoch in range(epochs_available):
            order = rng.permutation(len(names))
            for i in order:
                yield _load_chunk(_train_chunk_path(out_dir, epoch, names[i]))


def replay_val_chunks(
    out_dir: str, scene_names: Sequence[str]
) -> Iterator[Dict[str, np.ndarray]]:
    """Finite pass over all precomputed val chunks in scene order
    (ref precompute_dataset.py:192-230)."""
    for name in scene_names:
        stacked = _load_chunk(_val_chunk_path(out_dir, name))
        for i in range(len(stacked["points"])):
            yield {k: stacked[k][i] for k in CHUNK_KEYS}


def eval_scene_stream(
    data_root: str,
    scene_names: Sequence[str],
    npoints: int = 8192,
    with_labels: bool = True,
    seed: int = 0,
) -> Iterator[Dict]:
    """Whole scenes as full-coverage chunk stacks for stitched prediction
    (ref precompute_dataset.py:81-146 ``generate_eval_data``/``test``):
    yields per-scene dicts with chunked points/labels/colors/normals plus
    masks, original indices, and the original vertex arrays."""
    for name in scene_names:
        scene = scenes_lib.load_scene_mapped(data_root, name)
        labels = scene["labels"] if with_labels else np.zeros(
            len(scene["points"]), np.int32
        )
        out = chunks_lib.grid_chunks_for_eval(
            scene["points"], labels, scene["colors"], scene["normals"],
            npoints, rng=np.random.RandomState(seed),
        )
        item = {
            "scene_name": name,
            "points": out["points"],
            "labels": out["labels"],
            "colors": out["colors"],
            "normals": out["normals"],
            "weights": out["weights"],
            "masks": out["masks"],
            "orig_idx": out["orig_idx"],
            "num_vertices": len(scene["points"]),
            "vertex_points": scene["points"],
        }
        if with_labels:
            item["vertex_labels"] = scene["labels"]
        yield item
