"""ModelNet classification trainer + voting evaluation.

Equivalent of ``pointnet2_tensorflow/train.py`` (argparse single-host trainer,
augmented batches, per-epoch eval) and ``evaluate.py`` (multi-angle voting).
Data-parallel over the device mesh like the ScanNet trainer — this also
subsumes ``train_multi_gpu.py`` (whose only difference was in-graph towers).
"""
from __future__ import annotations

import argparse
import os
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pointcloud_segmentation_attention_tpu import models, parallel
from pointcloud_segmentation_attention_tpu.data.modelnet import (
    ModelNetDataset,
    ModelNetH5Dataset,
)
from pointcloud_segmentation_attention_tpu.eval.voting import evaluate_classification
from pointcloud_segmentation_attention_tpu.train import schedules
from pointcloud_segmentation_attention_tpu.train.checkpoints import BestKeeper
from pointcloud_segmentation_attention_tpu.train.cls_steps import (
    cls_eval_step,
    cls_train_step,
)
from pointcloud_segmentation_attention_tpu.train.train_state import create_state
from pointcloud_segmentation_attention_tpu.utils.logging import MetricLogger


def train_classification(
    data_root: str,
    model_name: str = "cls_ssg",
    h5_list: Optional[str] = None,
    h5_test_list: Optional[str] = None,
    num_classes: int = 40,
    npoints: int = 1024,
    batch_size: int = 16,
    epochs: int = 251,
    base_lr: float = 1e-3,
    decay_step: float = 200000,
    normal_channel: bool = False,
    log_dir: str = "logs/cls",
    num_votes: int = 1,
    n_devices: Optional[int] = None,
    seed: int = 0,
    max_steps: Optional[int] = None,
    reg_weight: Optional[float] = None,
):
    """Returns summary dict with best eval accuracy.

    ``reg_weight`` scales the T-Net orthogonality regularizer; ``None``
    auto-selects 0.001 for T-Net models (``pointnet1_cls``), matching the
    reference's always-applied ``reg_weight=0.001``
    (``pointnet1/models/pointnet_cls.py:77-92``), and 0 otherwise.
    """
    if reg_weight is None:
        reg_weight = 0.001 if model_name == "pointnet1_cls" else 0.0
    if h5_list:
        if h5_test_list is None:
            raise ValueError(
                "h5_test_list is required with h5_list — evaluating on the "
                "train shards would inflate accuracy and best-checkpoint "
                "selection (the reference uses separate train/test file "
                "lists, ref modelnet_h5_dataset.py)"
            )
        train_ds = ModelNetH5Dataset(h5_list, batch_size, npoints, shuffle=True)
        test_ds = ModelNetH5Dataset(h5_test_list, batch_size, npoints,
                                    shuffle=False)
    else:
        train_ds = ModelNetDataset(data_root, batch_size, npoints, "train",
                                   normal_channel=normal_channel, seed=seed)
        test_ds = ModelNetDataset(data_root, batch_size, npoints, "test",
                                  normal_channel=normal_channel, seed=seed)

    model = models.get_model(model_name, num_classes=num_classes)
    lr = lambda step: schedules.upstream_learning_rate(
        step, base_lr, batch_size, decay_step
    )
    bn = lambda step: schedules.upstream_bn_momentum(step, batch_size, decay_step)
    tx = optax.adam(lr)

    first_batch, first_labels, _ = train_ds.next_batch()
    train_ds.reset()
    points0 = jnp.asarray(first_batch)
    xyz0 = points0[..., :3]
    feats0 = points0[..., 3:] if points0.shape[-1] > 3 else None
    rng = jax.random.PRNGKey(seed)
    if feats0 is None:
        state = create_state(model, tx, rng, xyz0, train=False)
    else:
        state = create_state(model, tx, rng, xyz0, feats0, train=False)

    mesh = parallel.make_mesh(n_devices)
    train_step = parallel.data_parallel_jit(
        lambda s, b, r: cls_train_step(s, b, r, bn_schedule=bn,
                                       reg_weight=reg_weight),
        mesh, batch_argnums=(1,), donate_argnums=(0,),
    )
    eval_step = parallel.data_parallel_jit(
        cls_eval_step, mesh, batch_argnums=(1,), donate_argnums=(),
    )
    logger = MetricLogger(log_dir, "cls")
    best = BestKeeper(os.path.join(log_dir, "checkpoints"))
    dropout_rng = jax.random.fold_in(rng, 7)

    steps = 0
    summary = {}
    for epoch in range(epochs):
        train_ds.reset()
        losses, accs, orthos = [], [], []
        while train_ds.has_next_batch():
            pts, labels, _ = train_ds.next_batch(augment_data=True)
            batch = parallel.shard_batch(
                {"points": jnp.asarray(pts), "labels": jnp.asarray(labels)}, mesh
            )
            state, m = train_step(state, batch, dropout_rng)
            # device scalars — fetched at epoch end, not per step
            losses.append(m["loss"])
            accs.append(m["accuracy"])
            orthos.append(m["ortho_loss"])
            steps += 1
            if max_steps and steps >= max_steps:
                break
        logger.log(steps, {"train_loss": np.mean([float(x) for x in losses]),
                           "train_accuracy": np.mean([float(x) for x in accs]),
                           "train_ortho_loss": np.mean([float(x) for x in orthos])})
        if orthos:
            summary["last_ortho_loss"] = float(orthos[-1])
        # per-epoch eval with voting (ref evaluate.py:106-155)
        def predict_fn(points_np):
            n = len(points_np)
            # Pad the remainder batch up to the FIXED train batch size (or a
            # multiple of it): padding only to an n_devices multiple would
            # give the final ragged batch its own XLA compile per distinct
            # size.  batch_size is already a multiple of n_devices.
            target = -(-n // batch_size) * batch_size
            if target != n:
                points_np = np.concatenate(
                    [points_np, np.repeat(points_np[-1:], target - n, axis=0)]
                )
            b = {"points": jnp.asarray(points_np),
                 "labels": jnp.zeros(len(points_np), jnp.int32)}
            logits = np.asarray(
                eval_step(state, parallel.shard_batch(b, mesh))["logits"]
            )
            return logits[:n]

        test_ds.reset()
        batches = []
        while test_ds.has_next_batch():
            pts, labels, bsize = test_ds.next_batch()
            batches.append((pts[:bsize], labels[:bsize]))
        res = evaluate_classification(
            predict_fn, batches, num_votes=num_votes, num_classes=num_classes,
            with_normals=normal_channel,
        )
        logger.log(steps, {"eval_accuracy": res["accuracy"],
                           "eval_avg_class_accuracy": res["avg_class_accuracy"]})
        if best.maybe_save(state, steps, res["accuracy"]):
            summary["best_accuracy"] = res["accuracy"]
        if max_steps and steps >= max_steps:
            break
    logger.close()
    summary.setdefault("best_accuracy", best.best)
    summary["steps"] = steps
    return summary


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--data_root", required=True)
    p.add_argument("--model", default="cls_ssg")
    p.add_argument("--h5_list", default=None)
    p.add_argument("--h5_test_list", default=None)
    p.add_argument("--num_point", type=int, default=1024)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--max_epoch", type=int, default=251)
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--decay_step", type=float, default=200000)
    p.add_argument("--normal", action="store_true")
    p.add_argument("--log_dir", default="logs/cls")
    p.add_argument("--num_votes", type=int, default=1)
    args = p.parse_args(argv)
    print(train_classification(
        args.data_root, args.model, args.h5_list, args.h5_test_list,
        npoints=args.num_point,
        batch_size=args.batch_size, epochs=args.max_epoch,
        base_lr=args.learning_rate, decay_step=args.decay_step,
        normal_channel=args.normal, log_dir=args.log_dir,
        num_votes=args.num_votes,
    ))


if __name__ == "__main__":
    main()
