"""Jitted train / eval steps for the ScanNet segmentation family.

This is the TPU-native replacement for the reference's session loop
(``attention_points/train.py:288-388``): one fused XLA program per step doing
forward, weighted CE, backward, Adam update, BN-stat EMA, and the confusion-
matrix metric update — no Python<->runtime crossings inside the step, no
device<->host transfers (the reference crossed twice per FP module).

Data parallelism: the functions are pure, so the caller jits them with
``NamedSharding``s over a mesh (see ``parallel/``) — the batch axis shards,
params/state replicate, and XLA inserts the gradient all-reduce.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from pointcloud_segmentation_attention_tpu.train import losses as losses_lib
from pointcloud_segmentation_attention_tpu.train import metrics as metrics_lib
from pointcloud_segmentation_attention_tpu.train import schedules
from pointcloud_segmentation_attention_tpu.train.train_state import TrainState

# ScanNet class weights 1/log(1.2 + freq), class 0 = 0
# (ref attention_points/train.py:20-24 / compute_class_weights.py:41-58).
SCANNET_CLASS_WEIGHTS = (
    0.0, 2.743064592944318, 3.0830506790927132, 4.785754459526457,
    4.9963745147506184, 4.372710774561782, 5.039124880965811, 4.86451825464344,
    4.717751595568025, 4.809412839311939, 5.052097251455304, 5.389129668645318,
    5.390614085649042, 5.127458225110977, 5.086056870814752, 5.3831185190895265,
    5.422684124268539, 5.422955391988761, 5.433705358072363, 5.417426773812747,
    4.870172044153657,
)


def make_sample_weights(labels, inner_mask, class_weights=None):
    """weight = class_weight[label] * mask (ref train.py:106-108)."""
    cw = jnp.asarray(class_weights if class_weights is not None else SCANNET_CLASS_WEIGHTS,
                     jnp.float32)
    return cw[labels] * inner_mask.astype(jnp.float32)


def expand_wire_batch(batch: dict, wire_spec=None) -> dict:
    """Compact-wire batch -> standard batch, ON DEVICE (fused into the step).

    The compact wire format (``pipeline.make_batch(wire='compact')``) halves
    the per-step H2D bytes — the measured bottleneck of the end-to-end
    trainer rate on a remote-tunneled chip (docs/performance.md): labels and
    the inner-box mask travel as uint8, colors as raw uint8, normals as f16;
    the f32 features concat and ``class_weight[label] * mask`` are
    reconstructed here, inside the jitted step.  Points stay f32 (geometry
    parity).  Standard batches pass through untouched.
    """
    packed_keys = sorted(
        (k for k in batch if k == "packed" or k.startswith("packed")),
        key=lambda k: int(k[6:] or 0) if k != "packed" else 0,
    )
    if packed_keys:
        # Single-buffer packed wire (data/wire.py): one u8 array per batch
        # (or K byte-column slices for the 'xK' split-transfer variant,
        # re-concatenated here); bitcast/dequant/concat decode fuses into
        # the step.  ``wire_spec`` (static) describes the record layout.
        from pointcloud_segmentation_attention_tpu.data.wire import (
            unpack_batch,
        )

        if wire_spec is None:
            raise ValueError(
                "batch is in packed wire format but no wire_spec was passed "
                "to the step — close over data.wire.WireSpec when jitting"
            )
        if len(packed_keys) == 1:
            rows = batch[packed_keys[0]]
        else:
            rows = jnp.concatenate([batch[k] for k in packed_keys], axis=1)
        return unpack_batch(rows, wire_spec)
    if "mask" not in batch:
        return batch
    labels = batch["labels"].astype(jnp.int32)
    out = {
        "points": batch["points"],
        "labels": labels,
        "weights": make_sample_weights(labels, batch["mask"] != 0),
    }
    parts = []
    if "colors_u8" in batch:
        parts.append(batch["colors_u8"].astype(jnp.float32) / 255.0)
    if "normals_f16" in batch:
        parts.append(batch["normals_f16"].astype(jnp.float32))
    if parts:
        out["features"] = jnp.concatenate(parts, axis=-1)
    return out


def seg_train_step(
    state: TrainState,
    batch: dict,
    dropout_rng,
    *,
    bn_schedule: Callable = schedules.scannet_bn_momentum,
    lr_schedule: Callable = schedules.scannet_learning_rate,
    num_classes: int = 21,
    remat: str = "none",
    wire_spec=None,
):
    """One training step on a segmentation batch.

    batch: dict with 'points' (B,N,3) f32, 'labels' (B,N) i32,
    'weights' (B,N) f32 (pre-multiplied class weight x mask), and optional
    'features' (B,N,K) f32 — or the compact wire format
    (see ``expand_wire_batch``).

    ``remat`` trades recompute FLOPs for activation HBM (``jax.checkpoint``
    around the loss; the TPU-native lever for growing batch/points past the
    activation footprint — there is no reference counterpart):
    'none' stores all activations; 'dots' keeps matmul outputs and
    recomputes elementwise chains (policy ``dots_saveable``); 'full' stores
    only the inputs and replays the whole forward in the backward pass.
    Gradients are numerically equivalent (same math, re-executed; fusion/
    reassociation differences leave ~1e-6-relative fp noise — see
    ``tests/test_train_components.py::test_remat_train_step_matches_plain``).

    Returns (new_state, metrics) where metrics has scalar 'loss', 'accuracy'
    and the (C, C) 'confusion' update for streaming mIoU.
    """
    batch = expand_wire_batch(batch, wire_spec)
    bn_momentum = bn_schedule(state.step)
    rng = jax.random.fold_in(dropout_rng, state.step)
    features = batch.get("features")

    def loss_fn(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        logits, mutated = state.apply_fn(
            variables,
            batch["points"],
            features,
            train=True,
            bn_momentum=bn_momentum,
            rngs={"dropout": rng},
            mutable=["batch_stats"],
        )
        loss = losses_lib.weighted_softmax_cross_entropy(
            logits, batch["labels"], batch["weights"]
        )
        return loss, (logits, mutated["batch_stats"])

    if remat == "full":
        loss_fn = jax.checkpoint(loss_fn)
    elif remat == "dots":
        loss_fn = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.dots_saveable
        )
    elif remat != "none":
        raise ValueError(f"remat must be 'none'|'dots'|'full', got {remat!r}")
    (loss, (logits, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        state.params
    )
    new_state = state.apply_gradients(grads, new_batch_stats=new_stats)

    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    valid = batch["labels"] > 0
    confusion = metrics_lib.update_confusion(
        jnp.zeros((num_classes, num_classes), jnp.float32),
        batch["labels"], preds, valid,
    )
    metrics = {
        "loss": loss,
        "accuracy": metrics_lib.accuracy(batch["labels"], preds, valid),
        "confusion": confusion,
        # Reported from the SAME schedule the caller built the optimizer with
        # (a default-args recompute here would log a wrong LR for non-default
        # batch size / scene count).
        "learning_rate": lr_schedule(state.step),
    }
    return new_state, metrics


def seg_eval_step(state: TrainState, batch: dict, *, num_classes: int = 21,
                  wire_spec=None):
    """Eval forward pass: loss + confusion update using running BN stats."""
    batch = expand_wire_batch(batch, wire_spec)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    logits = state.apply_fn(
        variables, batch["points"], batch.get("features"), train=False
    )
    loss = losses_lib.weighted_softmax_cross_entropy(
        logits, batch["labels"], batch["weights"]
    )
    preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    valid = batch["labels"] > 0
    confusion = metrics_lib.update_confusion(
        jnp.zeros((num_classes, num_classes), jnp.float32),
        batch["labels"], preds, valid,
    )
    return {
        "loss": loss,
        "accuracy": metrics_lib.accuracy(batch["labels"], preds, valid),
        "confusion": confusion,
        "predictions": preds,
    }


def seg_predict_step(state: TrainState, points, features=None):
    """Logits for full-scene inference (ref generate_predictions.py:114-141)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return state.apply_fn(variables, points, features, train=False)


def seg_predict_step_packed(state: TrainState, packed, *, wire_spec):
    """Packed-wire inference: one u8 buffer in (14 B/point on the q16
    layout), logits out — the serving-path twin of the packed train step,
    for host-link-bound deployments (the chunk's label/mask bytes ride
    along unused)."""
    batch = expand_wire_batch({"packed": packed}, wire_spec)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return state.apply_fn(
        variables, batch["points"], batch.get("features"), train=False)
