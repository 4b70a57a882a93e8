"""Jitted train/eval steps for classification and part segmentation.

Equivalents of the upstream trainers' per-batch graphs:
``pointnet2_tensorflow/train.py`` (ModelNet classification, mean CE),
``part_seg/train.py`` (50-part segmentation, mean CE), and the PointNet v1
classifier with the T-Net orthogonality regularizer
(``pointnet1/models/pointnet_cls.py:77-92``).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pointcloud_segmentation_attention_tpu.models import pointnet1 as pn1
from pointcloud_segmentation_attention_tpu.train import losses as losses_lib
from pointcloud_segmentation_attention_tpu.train import schedules
from pointcloud_segmentation_attention_tpu.train.train_state import TrainState


def _split_xyz_features(points: jnp.ndarray):
    """(B,N,3[+k]) -> (xyz, features|None), like the cls models' input split."""
    if points.shape[-1] > 3:
        return points[..., :3], points[..., 3:]
    return points, None


def cls_train_step(
    state: TrainState,
    batch: dict,  # {'points': (B,N,C), 'labels': (B,)}
    dropout_rng,
    *,
    bn_schedule: Callable = schedules.upstream_bn_momentum,
    reg_weight: float = 0.0,
):
    """One classification training step (mean CE, optional T-Net ortho reg)."""
    bn_momentum = bn_schedule(state.step)
    rng = jax.random.fold_in(dropout_rng, state.step)
    xyz, feats = _split_xyz_features(batch["points"])

    # PointNet v1 models take only the point tensor; PointNet++ classifiers
    # take (xyz, features).
    model_args = (xyz,) if feats is None else (xyz, feats)

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        out, mutated = state.apply_fn(
            variables, *model_args, train=True, bn_momentum=bn_momentum,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        if isinstance(out, tuple):  # PointNet v1: (logits, end_points)
            logits, end_points = out
        else:
            logits, end_points = out, {}
        loss = losses_lib.mean_softmax_cross_entropy(logits, batch["labels"])
        ortho = jnp.float32(0.0)
        if reg_weight and "transform" in end_points:
            ortho = pn1.orthogonality_loss(
                end_points["transform"].astype(jnp.float32)
            )
            loss = loss + reg_weight * ortho
        return loss, (logits, ortho, mutated["batch_stats"])

    (loss, (logits, ortho, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
    preds = jnp.argmax(logits, axis=-1)
    acc = jnp.mean((preds == batch["labels"]).astype(jnp.float32))
    return new_state, {"loss": loss, "accuracy": acc, "ortho_loss": ortho}


def cls_eval_step(state: TrainState, batch: dict):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    xyz, feats = _split_xyz_features(batch["points"])
    model_args = (xyz,) if feats is None else (xyz, feats)
    out = state.apply_fn(variables, *model_args, train=False)
    logits = out[0] if isinstance(out, tuple) else out
    preds = jnp.argmax(logits, axis=-1)
    return {
        "logits": logits,
        "predictions": preds,
        "accuracy": jnp.mean((preds == batch["labels"]).astype(jnp.float32)),
    }


def partseg_train_step(
    state: TrainState,
    batch: dict,  # {'points': (B,N,6), 'labels': (B,N), optional 'cls': (B,)}
    dropout_rng,
    *,
    bn_schedule: Callable = schedules.upstream_bn_momentum,
    reg_weight: float = 0.0,
):
    """Part-seg step (mean CE over all points, ref part_seg/train.py).

    Handles both plain-logits models (PointNet++ part-seg) and
    ``(logits, end_points)`` models (PointNet v1 ``PointNetSeg``); with
    ``reg_weight`` the v1 T-Net orthogonality regularizer is applied like
    the reference's v1 part-seg loss (``pointnet1/part_seg/pointnet_part_seg.py``
    ``get_loss``: ``mat_diff_loss * 1e-3``).
    """
    bn_momentum = bn_schedule(state.step)
    rng = jax.random.fold_in(dropout_rng, state.step)
    has_cls = "cls" in batch

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        args = (batch["points"], batch["cls"]) if has_cls else (batch["points"],)
        out, mutated = state.apply_fn(
            variables, *args, train=True, bn_momentum=bn_momentum,
            rngs={"dropout": rng}, mutable=["batch_stats"],
        )
        if isinstance(out, tuple):  # PointNet v1: (logits, end_points)
            logits, end_points = out
        else:
            logits, end_points = out, {}
        loss = losses_lib.mean_softmax_cross_entropy(logits, batch["labels"])
        ortho = jnp.float32(0.0)
        if reg_weight and "transform" in end_points:
            ortho = pn1.orthogonality_loss(
                end_points["transform"].astype(jnp.float32)
            )
            loss = loss + reg_weight * ortho
        return loss, (logits, ortho, mutated["batch_stats"])

    (loss, (logits, ortho, new_stats)), grads = jax.value_and_grad(
        loss_fn, has_aux=True
    )(state.params)
    new_state = state.apply_gradients(grads, new_batch_stats=new_stats)
    preds = jnp.argmax(logits, axis=-1)
    acc = jnp.mean((preds == batch["labels"]).astype(jnp.float32))
    return new_state, {"loss": loss, "accuracy": acc, "ortho_loss": ortho}


def partseg_eval_step(state: TrainState, batch: dict):
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    args = (batch["points"], batch["cls"]) if "cls" in batch else (batch["points"],)
    out = state.apply_fn(variables, *args, train=False)
    logits = out[0] if isinstance(out, tuple) else out
    return {"logits": logits, "predictions": jnp.argmax(logits, axis=-1)}
