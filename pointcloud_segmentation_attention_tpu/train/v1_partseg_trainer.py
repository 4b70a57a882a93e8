"""PointNet v1 joint part-segmentation trainer (ShapeNet h5 flow).

Equivalent of ``pointnet2_tensorflow/pointnet1/part_seg/train.py:1-393``:
the joint cls+seg PointNet v1 (``pointnet_part_seg.py`` ``get_model``)
trained on h5 shard lists with the combined loss

    total = weight * seg_loss + (1 - weight) * label_loss + 1e-3 * ortho

with ``weight = 1.0`` (the reference trains segmentation only, ref
``train.py:132-135``), Adam, exponential LR decay (base 1e-3, x0.5 per
16881*20 samples, floor 1e-5) and the BN-decay schedule with double the LR
decay step (ref ``train.py:53-63``).  Per-epoch validation reports label and
per-shape part accuracy like the reference's ``eval_one_epoch``.
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
from pointcloud_segmentation_attention_tpu.data.shapenet_part import (
    ShapeNetPartH5Dataset,
)
from pointcloud_segmentation_attention_tpu.models import pointnet1 as pn1
from pointcloud_segmentation_attention_tpu.train import losses as losses_lib
from pointcloud_segmentation_attention_tpu.train import schedules
from pointcloud_segmentation_attention_tpu.train.checkpoints import BestKeeper
from pointcloud_segmentation_attention_tpu.train.train_state import create_state
from pointcloud_segmentation_attention_tpu.utils.logging import MetricLogger

# ref pointnet1/part_seg/train.py:53-63
V1_PARTSEG_DECAY_STEP = 16881 * 20


def joint_train_step(state, batch, dropout_rng, *, bn_schedule,
                     seg_weight: float = 1.0, reg_weight: float = 1e-3,
                     cat_num: int = 16):
    """One step of the joint loss (ref pointnet_part_seg.get_loss :138-158)."""
    bn_momentum = bn_schedule(state.step)
    rng = jax.random.fold_in(dropout_rng, state.step)
    onehot = jax.nn.one_hot(batch["cls"], cat_num, dtype=jnp.float32)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        (cls_logits, seg_logits, end_points), mutated = state.apply_fn(
            variables, batch["points"], onehot, train=True,
            bn_momentum=bn_momentum, rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        label_loss = losses_lib.mean_softmax_cross_entropy(
            cls_logits, batch["cls"])
        seg_loss = losses_lib.mean_softmax_cross_entropy(
            seg_logits, batch["labels"])
        ortho = pn1.orthogonality_loss(
            end_points["transform"].astype(jnp.float32))
        total = (seg_weight * seg_loss + (1.0 - seg_weight) * label_loss
                 + reg_weight * ortho)
        return total, (cls_logits, seg_logits, ortho,
                       mutated["batch_stats"])

    (loss, (cls_logits, seg_logits, ortho, new_stats)), grads = (
        jax.value_and_grad(loss_fn, has_aux=True)(state.params))
    new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
    metrics = {
        "loss": loss,
        "ortho_loss": ortho,
        "label_accuracy": jnp.mean(
            (jnp.argmax(cls_logits, -1) == batch["cls"]).astype(jnp.float32)),
        "seg_accuracy": jnp.mean(
            (jnp.argmax(seg_logits, -1) == batch["labels"]).astype(jnp.float32)),
    }
    return new_state, metrics


def joint_eval_step(state, batch, *, cat_num: int = 16):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    onehot = jax.nn.one_hot(batch["cls"], cat_num, dtype=jnp.float32)
    cls_logits, seg_logits, _ = state.apply_fn(
        variables, batch["points"], onehot, train=False)
    return {
        "label_accuracy": jnp.mean(
            (jnp.argmax(cls_logits, -1) == batch["cls"]).astype(jnp.float32)),
        "seg_accuracy": jnp.mean(
            (jnp.argmax(seg_logits, -1) == batch["labels"]).astype(jnp.float32)),
    }


def train_v1_part_segmentation(
    train_list: str,
    val_list: str,
    cat_num: int = 16,
    part_num: int = 50,
    npoints: int = 2048,
    batch_size: int = 32,
    epochs: int = 200,
    base_lr: float = 1e-3,
    seg_weight: float = 1.0,
    reg_weight: float = 1e-3,
    log_dir: str = "logs/v1_part_seg",
    n_devices: Optional[int] = None,
    seed: int = 0,
    max_steps: Optional[int] = None,
):
    """Returns summary with best val seg accuracy (the reference checkpoints
    every epoch; we keep the best like the unified trainer)."""
    train_ds = ShapeNetPartH5Dataset(train_list, batch_size, npoints,
                                     shuffle=True, seed=seed)
    val_ds = ShapeNetPartH5Dataset(val_list, batch_size, npoints,
                                   shuffle=False, seed=seed)
    model = models.get_model("pointnet1_part_seg", cat_num=cat_num,
                             part_num=part_num)

    # ref train.py:105-118 — LR x0.5 per DECAY_STEP samples, floor 1e-5;
    # BN decay over 2x that step.
    lr = lambda step: schedules.upstream_learning_rate(
        step, base_lr, batch_size, V1_PARTSEG_DECAY_STEP, decay_rate=0.5)
    bn = lambda step: schedules.upstream_bn_momentum(
        step, batch_size, 2.0 * V1_PARTSEG_DECAY_STEP)
    tx = optax.adam(lr)

    pts0, cls0, seg0 = next(train_ds.batches())
    rng = jax.random.PRNGKey(seed)
    onehot0 = jax.nn.one_hot(jnp.asarray(cls0), cat_num, dtype=jnp.float32)
    state = create_state(model, tx, rng, jnp.asarray(pts0), onehot0,
                         train=False)

    mesh = parallel.make_mesh(n_devices)
    train_step = parallel.data_parallel_jit(
        lambda s, b, r: joint_train_step(
            s, b, r, bn_schedule=bn, seg_weight=seg_weight,
            reg_weight=reg_weight, cat_num=cat_num),
        mesh, batch_argnums=(1,), donate_argnums=(0,),
    )
    eval_step = parallel.data_parallel_jit(
        lambda s, b: joint_eval_step(s, b, cat_num=cat_num),
        mesh, batch_argnums=(1,), donate_argnums=(),
    )
    logger = MetricLogger(log_dir, "v1_part_seg")
    best = BestKeeper(os.path.join(log_dir, "checkpoints"))
    dropout_rng = jax.random.fold_in(rng, 11)

    steps = 0
    summary = {}
    for epoch in range(epochs):
        epoch_metrics = []
        for pts, cls, seg in train_ds.batches():
            batch = parallel.shard_batch(
                {"points": jnp.asarray(pts), "cls": jnp.asarray(cls),
                 "labels": jnp.asarray(seg)}, mesh)
            state, m = train_step(state, batch, dropout_rng)
            epoch_metrics.append(m)  # device scalars, fetched at epoch end
            steps += 1
            if max_steps and steps >= max_steps:
                break
        if epoch_metrics:
            fetched = jax.device_get(epoch_metrics)
            logger.log(steps, {
                "train_" + k: float(np.mean([m[k] for m in fetched]))
                for k in fetched[0]})
            summary["last_ortho_loss"] = float(fetched[-1]["ortho_loss"])
        # per-epoch validation (ref eval_one_epoch :282-360)
        vals = []
        for pts, cls, seg in val_ds.batches():
            batch = parallel.shard_batch(
                {"points": jnp.asarray(pts), "cls": jnp.asarray(cls),
                 "labels": jnp.asarray(seg)}, mesh)
            vals.append(eval_step(state, batch))
        if vals:
            fetched = jax.device_get(vals)
            seg_acc = float(np.mean([m["seg_accuracy"] for m in fetched]))
            logger.log(steps, {
                "val_seg_accuracy": seg_acc,
                "val_label_accuracy": float(
                    np.mean([m["label_accuracy"] for m in fetched])),
            })
            if best.maybe_save(state, steps, seg_acc):
                summary["best_seg_accuracy"] = seg_acc
        if max_steps and steps >= max_steps:
            break
    logger.close()
    summary.setdefault("best_seg_accuracy", best.best)
    summary["steps"] = steps
    return summary


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train_list", required=True)
    p.add_argument("--val_list", required=True)
    p.add_argument("--point_num", type=int, default=2048)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--epoch", type=int, default=200)
    p.add_argument("--output_dir", default="logs/v1_part_seg")
    args = p.parse_args(argv)
    print(train_v1_part_segmentation(
        args.train_list, args.val_list, npoints=args.point_num,
        batch_size=args.batch, epochs=args.epoch, log_dir=args.output_dir,
    ))


if __name__ == "__main__":
    main()
