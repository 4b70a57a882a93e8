"""ShapeNet part-segmentation trainer.

Equivalent of ``pointnet2_tensorflow/part_seg/train.py`` and
``train_one_hot.py``: per-epoch training over PartNormalDataset with the
per-shape part-IoU evaluation averaged per category (ref :223-306).
"""
from __future__ import annotations

import argparse
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloud_segmentation_attention_tpu import models, parallel
from pointcloud_segmentation_attention_tpu.data.shapenet_part import PartNormalDataset
from pointcloud_segmentation_attention_tpu.eval.part_iou import PartIoUAccumulator
from pointcloud_segmentation_attention_tpu.train import schedules
from pointcloud_segmentation_attention_tpu.train.checkpoints import BestKeeper
from pointcloud_segmentation_attention_tpu.train.cls_steps import (
    partseg_eval_step,
    partseg_train_step,
)
from pointcloud_segmentation_attention_tpu.train.train_state import create_state
from pointcloud_segmentation_attention_tpu.utils.logging import MetricLogger


def train_part_segmentation(
    data_root: str,
    model_name: str = "part_seg",  # or 'part_seg_msg_one_hot'
    npoints: int = 2048,
    batch_size: int = 16,
    epochs: int = 201,
    base_lr: float = 1e-3,
    log_dir: str = "logs/part_seg",
    n_devices: Optional[int] = None,
    seed: int = 0,
    max_steps: Optional[int] = None,
    reg_weight: Optional[float] = None,
):
    """``reg_weight=None`` auto-selects 0.001 for the T-Net model
    (``pointnet1_seg``), matching the reference v1 part-seg loss
    (``pointnet1/part_seg/pointnet_part_seg.py`` ``mat_diff_loss * 1e-3``)."""
    one_hot = model_name == "part_seg_msg_one_hot"
    is_v1 = model_name == "pointnet1_seg"  # xyz-only input, (logits, end_points)
    if reg_weight is None:
        reg_weight = 0.001 if is_v1 else 0.0
    train_ds = PartNormalDataset(data_root, npoints, split="trainval", seed=seed)
    test_ds = PartNormalDataset(data_root, npoints, split="test", seed=seed)
    model = models.get_model(model_name)

    def _points(pts):
        # PointNet v1 consumes xyz only (ref pointnet1/part_seg/train.py
        # placeholder (B, N, 3)); PointNet++ part-seg takes xyz+normals.
        a = np.asarray(pts)
        return jnp.asarray(a[..., :3] if is_v1 else a)

    lr = lambda step: schedules.upstream_learning_rate(step, base_lr, batch_size)
    bn = lambda step: schedules.upstream_bn_momentum(step, batch_size)
    tx = optax.adam(lr)

    pts0, seg0, cls0, _ = next(train_ds.batches(batch_size, shuffle=False))
    rng = jax.random.PRNGKey(seed)
    if one_hot:
        state = create_state(model, tx, rng, _points(pts0),
                             jnp.asarray(cls0), train=False)
    else:
        state = create_state(model, tx, rng, _points(pts0), train=False)

    mesh = parallel.make_mesh(n_devices)
    train_step = parallel.data_parallel_jit(
        lambda s, b, r: partseg_train_step(s, b, r, bn_schedule=bn,
                                           reg_weight=reg_weight),
        mesh, batch_argnums=(1,), donate_argnums=(0,),
    )
    eval_step = parallel.data_parallel_jit(
        partseg_eval_step, mesh, batch_argnums=(1,), donate_argnums=(),
    )
    logger = MetricLogger(log_dir, "part_seg")
    best = BestKeeper(os.path.join(log_dir, "checkpoints"))
    dropout_rng = jax.random.fold_in(rng, 3)
    cats = sorted(test_ds.classes, key=lambda c: test_ds.classes[c])

    steps = 0
    summary = {}
    for epoch in range(epochs):
        losses, orthos = [], []
        for pts, seg, cls, _ in train_ds.batches(batch_size):
            batch = {"points": _points(pts), "labels": jnp.asarray(seg)}
            if one_hot:
                batch["cls"] = jnp.asarray(cls)
            state, m = train_step(state, parallel.shard_batch(batch, mesh),
                                  dropout_rng)
            losses.append(m["loss"])  # device scalar; fetched at epoch end
            orthos.append(m["ortho_loss"])
            steps += 1
            if max_steps and steps >= max_steps:
                break
        if orthos:
            summary["last_ortho_loss"] = float(orthos[-1])
        # eval: per-category part IoU (ref part_seg/train.py:223-306)
        acc = PartIoUAccumulator()
        for pts, seg, cls, bsize in test_ds.batches(batch_size, shuffle=False):
            batch = {"points": _points(pts), "labels": jnp.asarray(seg)}
            if one_hot:
                batch["cls"] = jnp.asarray(cls)
            logits = np.asarray(
                eval_step(state, parallel.shard_batch(batch, mesh))["logits"]
            )
            for i in range(bsize):
                acc.add_shape(logits[i], seg[i], cats[cls[i]])
        res = acc.result()
        logger.log(steps, {
            "train_loss": float(np.mean([float(x) for x in losses])) if losses else 0.0,
            "eval_class_avg_iou": res["class_avg_iou"],
            "eval_instance_avg_iou": res["instance_avg_iou"],
        })
        if best.maybe_save(state, steps, res["class_avg_iou"]):
            summary["best_class_avg_iou"] = res["class_avg_iou"]
        if max_steps and steps >= max_steps:
            break
    logger.close()
    summary.setdefault("best_class_avg_iou", best.best)
    summary["steps"] = steps
    return summary


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--model", default="part_seg")
    p.add_argument("--num_point", type=int, default=2048)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_epoch", type=int, default=201)
    p.add_argument("--log_dir", default="logs/part_seg")
    args = p.parse_args(argv)
    print(train_part_segmentation(
        args.data_root, args.model, npoints=args.num_point,
        batch_size=args.batch_size, epochs=args.max_epoch, log_dir=args.log_dir,
    ))


if __name__ == "__main__":
    main()
