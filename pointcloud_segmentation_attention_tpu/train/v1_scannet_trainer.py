"""Upstream-style ScanNet v1 trainer: chopped-scene training + whole-scene
eval with the calibrated voxel-accuracy metric.

Equivalent of ``pointnet2_tensorflow/scannet/train.py``: per-batch random
point dropout (``get_batch_wdp`` :198-214), z-rotation augmentation, chopped-
scene eval, and the whole-scene pass reporting the surface-voxel 'calibrated'
accuracy (:364-483) alongside plain point accuracy.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloud_segmentation_attention_tpu import models, parallel
from pointcloud_segmentation_attention_tpu.data.augment import rotate_point_cloud_z
from pointcloud_segmentation_attention_tpu.data.scannet.v1_compat import (
    ScannetDataset,
    ScannetDatasetVirtualScan,
    ScannetDatasetWholeScene,
)
from pointcloud_segmentation_attention_tpu.train import (
    schedules,
    seg_eval_step,
    seg_train_step,
)
from pointcloud_segmentation_attention_tpu.train.metrics import StreamingMeanIoU
from pointcloud_segmentation_attention_tpu.train.train_state import create_state
from pointcloud_segmentation_attention_tpu.utils.logging import MetricLogger
from pointcloud_segmentation_attention_tpu.utils.pc_util import (
    calibrated_voxel_accuracy,
    point_cloud_label_to_surface_voxel_label_fast,
)


class _FlattenedStacked:
    """Adapts a per-scene STACKED dataset (``__getitem__`` -> (K, N, 3) /
    (K, N) / (K, N) like ``ScannetDatasetWholeScene`` and
    ``ScannetDatasetVirtualScan``) to per-sample indexing for the batch loop.
    Stacks are computed once per scene and cached (the reference likewise
    holds whole scenes in memory, ref scannet_dataset.py:96-108)."""

    def __init__(self, ds):
        self._stacks = [ds[i] for i in range(len(ds))]
        self._index = [(si, k) for si, (p, _, _) in enumerate(self._stacks)
                       for k in range(len(p))]

    def __len__(self):
        return len(self._index)

    def __getitem__(self, i):
        si, k = self._index[i]
        p, l, w = self._stacks[si]
        return p[k], l[k], w[k]


def get_batch_wdp(dataset, idxs, start, bsize, npoints, rng):
    """Batch with random point dropout to point 0 (ref train.py:198-214)."""
    pts = np.zeros((bsize, npoints, 3), np.float32)
    lab = np.zeros((bsize, npoints), np.int32)
    w = np.zeros((bsize, npoints), np.float32)
    for i in range(bsize):
        p, l, sw = dataset[idxs[start + i]]
        drop_ratio = rng.random_sample() * 0.875
        drop = np.where(rng.random_sample(len(p)) <= drop_ratio)[0]
        p, l, sw = p.copy(), l.copy(), sw.copy()
        if len(drop):
            p[drop] = p[0]
            l[drop] = l[0]
            sw[drop] *= 0
        pts[i], lab[i], w[i] = p, l, sw
    return pts, lab, w


def train_scannet_v1(
    data_root: str,
    train_scenes: Sequence[str],
    val_scenes: Sequence[str],
    npoints: int = 8192,
    batch_size: int = 16,
    epochs: int = 201,
    log_dir: str = "logs/scannet_v1",
    n_devices: Optional[int] = None,
    seed: int = 0,
    max_steps: Optional[int] = None,
    dataset_kind: str = "chunk",
):
    """``dataset_kind`` chooses the training dataset like the reference's
    commented dataset swap (ref scannet/train.py:54-58 trains on either the
    chunk, whole-scene, or virtual-scan dataset): ``chunk`` (default),
    ``virtual`` (depth-camera visibility subsampling,
    ref scannet_dataset.py:152-176), or ``whole`` (full-coverage grid
    chunks; each __getitem__ yields a (n_chunks, N, 3) stack that is
    flattened into the batch loop)."""
    if dataset_kind == "virtual":
        train_ds = _FlattenedStacked(
            ScannetDatasetVirtualScan(data_root, train_scenes, npoints,
                                      "train", seed))
    elif dataset_kind == "whole":
        train_ds = _FlattenedStacked(
            ScannetDatasetWholeScene(data_root, train_scenes, npoints, seed,
                                     split="train"))
    elif dataset_kind == "chunk":
        train_ds = ScannetDataset(data_root, train_scenes, npoints, "train",
                                  seed)
    else:
        raise ValueError(f"unknown dataset_kind '{dataset_kind}'")
    whole_ds = ScannetDatasetWholeScene(data_root, val_scenes, npoints, seed)
    model = models.get_model("sem_seg", num_classes=21)
    bn = lambda step: schedules.upstream_bn_momentum(step, batch_size, 200000)
    tx = optax.adam(lambda s: schedules.upstream_learning_rate(s, 1e-3, batch_size))
    rng = jax.random.PRNGKey(seed)
    np_rng = np.random.RandomState(seed)

    example = jnp.zeros((1, npoints, 3), jnp.float32)
    state = create_state(model, tx, rng, example, None, train=False)
    # Unified rng hygiene: the per-step dropout key is folded from a
    # dedicated branch of the init key (the step fold happens inside the
    # train step), never the raw PRNGKey that seeded the params.
    dropout_rng = jax.random.fold_in(rng, 999)
    mesh = parallel.make_mesh(n_devices)
    train_step = parallel.data_parallel_jit(
        lambda s, b, r: seg_train_step(s, b, r, bn_schedule=bn),
        mesh, batch_argnums=(1,), donate_argnums=(0,),
    )
    eval_step = parallel.data_parallel_jit(
        seg_eval_step, mesh, batch_argnums=(1,), donate_argnums=(),
    )
    logger = MetricLogger(log_dir, "scannet_v1")

    steps = 0
    summary = {}
    n = len(train_ds)
    for epoch in range(epochs):
        idxs = np_rng.permutation(n)
        losses = []
        for start in range(0, max(n - batch_size + 1, 1), batch_size):
            bsize = min(batch_size, n - start)
            if bsize < batch_size:
                break
            pts, lab, w = get_batch_wdp(train_ds, idxs, start, batch_size,
                                        npoints, np_rng)
            pts = rotate_point_cloud_z(pts, rng=np_rng)
            batch = {
                "points": jnp.asarray(pts),
                "labels": jnp.asarray(lab),
                "weights": jnp.asarray(w),
            }
            state, m = train_step(state, parallel.shard_batch(batch, mesh),
                                  dropout_rng)
            losses.append(m["loss"])  # device scalar; fetched at epoch end
            steps += 1
            if max_steps and steps >= max_steps:
                break
        metrics = eval_whole_scenes(state, whole_ds, batch_size, mesh, eval_step)
        metrics["train_loss"] = float(np.mean([float(x) for x in losses])) if losses else 0.0
        logger.log(steps, metrics)
        summary.update(metrics)
        if max_steps and steps >= max_steps:
            break
    logger.close()
    summary["steps"] = steps
    return summary


def eval_whole_scenes(state, whole_ds, batch_size, mesh, eval_step):
    """Whole-scene eval: point accuracy, mIoU, and calibrated voxel accuracy
    (ref scannet/train.py:364-483)."""
    miou = StreamingMeanIoU(21)
    correct = total = 0
    vox_correct = np.zeros(20)
    vox_seen = np.zeros(20)
    n_dev = mesh.devices.size
    for si in range(len(whole_ds)):
        pts, lab, w = whole_ds[si]
        preds_all = []
        for start in range(0, len(pts), batch_size):
            pb, lb, wb = (a[start:start + batch_size] for a in (pts, lab, w))
            pad = (-len(pb)) % max(n_dev, 1)
            if pad:
                pb = np.concatenate([pb, np.repeat(pb[-1:], pad, 0)])
                lb = np.concatenate([lb, np.repeat(lb[-1:], pad, 0)])
                wb = np.concatenate([wb, np.repeat(wb[-1:], pad, 0)])
            out = eval_step(state, parallel.shard_batch({
                "points": jnp.asarray(pb), "labels": jnp.asarray(lb),
                "weights": jnp.asarray(wb)}, mesh))
            preds_all.append(np.asarray(out["predictions"])[: len(pts[start:start + batch_size])])
        preds = np.concatenate(preds_all)
        valid = lab > 0
        miou.update(lab, preds, valid)
        correct += ((preds == lab) & valid).sum()
        total += valid.sum()
        # Calibrated voxel accuracy over each chunk's surface voxels.
        for b in range(len(pts)):
            mask = lab[b] > 0
            if mask.sum() == 0:
                continue
            uvlabel, _ = point_cloud_label_to_surface_voxel_label_fast(
                pts[b][mask], np.stack([lab[b][mask], preds[b][mask]], 1)
            )
            for c in range(1, 21):
                sel = uvlabel[:, 0] == c
                vox_seen[c - 1] += sel.sum()
                vox_correct[c - 1] += (uvlabel[sel, 1] == c).sum()
    mean_iou, _ = miou.result()
    return {
        "eval_accuracy": correct / max(total, 1),
        "eval_miou": mean_iou,
        "eval_calibrated_vox_accuracy": calibrated_voxel_accuracy(
            vox_correct, vox_seen
        ),
    }
