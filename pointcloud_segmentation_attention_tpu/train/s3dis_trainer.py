"""S3DIS semantic-segmentation trainer + room inference (PointNet v1).

Equivalents of ``pointnet2_tensorflow/pointnet1/sem_seg/{train.py,
batch_inference.py, eval_iou_accuracy.py}``: 13-class PointNetSemSeg over
1x1 m room blocks (9-channel normalized input), area-split train/test,
whole-room block inference, and confusion-matrix IoU over all rooms.
"""
from __future__ import annotations

import argparse
import os
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloud_segmentation_attention_tpu import models, parallel
from pointcloud_segmentation_attention_tpu.data import s3dis
from pointcloud_segmentation_attention_tpu.train import schedules
from pointcloud_segmentation_attention_tpu.train.checkpoints import BestKeeper
from pointcloud_segmentation_attention_tpu.train.cls_steps import (
    partseg_eval_step,
    partseg_train_step,
)
from pointcloud_segmentation_attention_tpu.train.metrics import StreamingMeanIoU
from pointcloud_segmentation_attention_tpu.train.train_state import create_state
from pointcloud_segmentation_attention_tpu.utils.logging import MetricLogger

NUM_CLASSES = 13


def rooms_to_block_dataset(
    rooms: Sequence[np.ndarray], num_point: int = 4096, seed: int = 0
) -> Tuple[np.ndarray, np.ndarray]:
    """All rooms' normalized blocks stacked (ref gen_indoor3d_h5.py)."""
    rng = np.random.RandomState(seed)
    datas, labels = [], []
    for room in rooms:
        d, l = s3dis.room_to_blocks_normalized(room, num_point, rng=rng)
        if len(d):
            datas.append(d)
            labels.append(l)
    return np.concatenate(datas), np.concatenate(labels)


def train_s3dis(
    train_rooms: Sequence[np.ndarray],
    test_rooms: Sequence[np.ndarray],
    num_point: int = 4096,
    batch_size: int = 24,
    epochs: int = 50,
    base_lr: float = 1e-3,
    log_dir: str = "logs/s3dis",
    n_devices: Optional[int] = None,
    seed: int = 0,
    max_steps: Optional[int] = None,
):
    data, labels = rooms_to_block_dataset(train_rooms, num_point, seed)
    model = models.pointnet1.PointNetSemSeg(num_classes=NUM_CLASSES)
    lr = lambda step: schedules.upstream_learning_rate(
        step, base_lr, batch_size, decay_step=300000
    )
    bn = lambda step: schedules.upstream_bn_momentum(step, batch_size, 300000)
    tx = optax.adam(lr)
    rng = jax.random.PRNGKey(seed)
    state = create_state(model, tx, rng, jnp.asarray(data[:1]), train=False)

    mesh = parallel.make_mesh(n_devices)
    room_eval_step = _make_eval_step(mesh)  # one compile for the whole run
    train_step = parallel.data_parallel_jit(
        lambda s, b, r: partseg_train_step(s, b, r, bn_schedule=bn),
        mesh, batch_argnums=(1,), donate_argnums=(0,),
    )
    logger = MetricLogger(log_dir, "s3dis")
    best = BestKeeper(os.path.join(log_dir, "checkpoints"))
    dropout_rng = jax.random.fold_in(rng, 11)
    order_rng = np.random.RandomState(seed)

    steps = 0
    summary = {}
    n = len(data)
    for epoch in range(epochs):
        order = order_rng.permutation(n)
        losses = []
        for start in range(0, n - batch_size + 1, batch_size):
            sel = order[start:start + batch_size]
            batch = {
                "points": jnp.asarray(data[sel]),
                "labels": jnp.asarray(labels[sel]),
            }
            state, m = train_step(state, parallel.shard_batch(batch, mesh),
                                  dropout_rng)
            losses.append(m["loss"])  # device scalar; fetched at epoch end
            steps += 1
            if max_steps and steps >= max_steps:
                break
        miou, acc = evaluate_rooms(state, test_rooms, num_point, batch_size,
                                   mesh, eval_step=room_eval_step)
        logger.log(steps, {"train_loss": float(np.mean([float(x) for x in losses])) if losses else 0.0,
                           "eval_miou": miou, "eval_accuracy": acc})
        if best.maybe_save(state, steps, miou):
            summary["best_miou"] = miou
        if max_steps and steps >= max_steps:
            break
    logger.close()
    summary.setdefault("best_miou", best.best)
    summary["steps"] = steps
    return summary


def _make_eval_step(mesh):
    return parallel.data_parallel_jit(
        partseg_eval_step, mesh, batch_argnums=(1,), donate_argnums=(),
    )


def predict_room(state, room: np.ndarray, num_point: int, batch_size: int,
                 mesh=None, eval_step=None) -> Tuple[np.ndarray, np.ndarray]:
    """Whole-room block inference (ref batch_inference.py:70-170):
    returns (block_logits (K,N,13), block_labels (K,N)).

    Pass ``eval_step`` (one ``_make_eval_step(mesh)``) when calling in a loop
    — building it here per call would retrace/recompile per room."""
    data, labels = s3dis.room_to_blocks_normalized(
        room, num_point, rng=np.random.RandomState(0)
    )
    if mesh is None:
        mesh = parallel.make_mesh(1)
    if eval_step is None:
        eval_step = _make_eval_step(mesh)
    n_dev = mesh.devices.size
    logits_out = []
    for start in range(0, len(data), batch_size):
        blk = data[start:start + batch_size]
        lab = labels[start:start + batch_size]
        pad = (-len(blk)) % max(batch_size, n_dev)
        if pad:
            blk = np.concatenate([blk, np.repeat(blk[-1:], pad, 0)])
            lab = np.concatenate([lab, np.repeat(lab[-1:], pad, 0)])
        out = eval_step(state, parallel.shard_batch(
            {"points": jnp.asarray(blk), "labels": jnp.asarray(lab)}, mesh))
        logits_out.append(np.asarray(out["logits"])[: len(data[start:start + batch_size])])
    return np.concatenate(logits_out), labels


def evaluate_rooms(state, rooms, num_point, batch_size, mesh=None,
                   eval_step=None):
    """Accumulated 13-class mIoU + accuracy over rooms
    (ref eval_iou_accuracy.py)."""
    miou = StreamingMeanIoU(NUM_CLASSES)
    correct = total = 0
    if mesh is None:
        mesh = parallel.make_mesh(1)
    if eval_step is None:
        eval_step = _make_eval_step(mesh)
    for room in rooms:
        logits, labels = predict_room(state, room, num_point, batch_size,
                                      mesh, eval_step)
        preds = np.argmax(logits, axis=-1)
        miou.update(labels, preds)
        correct += (preds == labels).sum()
        total += labels.size
    mean_iou, _ = miou.result()
    return mean_iou, correct / max(total, 1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True,
                   help="dir of per-room npy (N,7) arrays from s3dis.collect_room")
    p.add_argument("--test_area", default="Area_6")
    p.add_argument("--num_point", type=int, default=4096)
    p.add_argument("--batch_size", type=int, default=24)
    p.add_argument("--max_epoch", type=int, default=50)
    p.add_argument("--log_dir", default="logs/s3dis")
    args = p.parse_args(argv)
    train_rooms, test_rooms = [], []
    for fn in sorted(os.listdir(args.data_root)):
        if not fn.endswith(".npy"):
            continue
        room = np.load(os.path.join(args.data_root, fn))
        (test_rooms if args.test_area in fn else train_rooms).append(room)
    print(train_s3dis(train_rooms, test_rooms, args.num_point, args.batch_size,
                      args.max_epoch, log_dir=args.log_dir))


if __name__ == "__main__":
    main()
