"""Streaming metrics as device arrays.

The reference uses ``tf.metrics.mean_iou`` with explicit reset ops
(``attention_points/train.py:146-161``): a (21, 21) confusion matrix is
accumulated over points whose ground-truth label > 0, and mIoU is the mean of
``tp / (tp + fp + fn)`` over classes whose denominator is non-zero — class 0
remains one of the 21 rows even though unlabeled points are filtered.

Here the confusion matrix is a plain ``(C, C)`` f64 device array, so metric
accumulation is a pure jittable function — under data parallelism the partial
matrices are combined with a ``psum`` (replacing TF's local-variable update
ops).  The same matrix also backs the offline benchmark evaluator
(``attention_points/benchmark/evaluate.py:58-108``).
"""
from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
import numpy as np


def init_confusion(num_classes: int = 21) -> jnp.ndarray:
    return jnp.zeros((num_classes, num_classes), jnp.float64 if jnp.zeros(0).dtype == jnp.float64 else jnp.float32)


def update_confusion(
    confusion: jnp.ndarray,
    labels: jnp.ndarray,
    predictions: jnp.ndarray,
    valid_mask: jnp.ndarray,
) -> jnp.ndarray:
    """Accumulate confusion[label, pred] over valid points (any shape).

    Uses a one-hot matmul (MXU-friendly) instead of scatter: for C=21 the
    (P, C) one-hots are tiny relative to the model activations.
    """
    c = confusion.shape[0]
    labels = labels.reshape(-1)
    predictions = predictions.reshape(-1)
    valid = valid_mask.reshape(-1).astype(confusion.dtype)
    lab_oh = (labels[:, None] == jnp.arange(c)[None, :]).astype(confusion.dtype)
    pred_oh = (predictions[:, None] == jnp.arange(c)[None, :]).astype(confusion.dtype)
    lab_oh = lab_oh * valid[:, None]
    return confusion + lab_oh.T @ pred_oh


def miou_from_confusion(confusion) -> Tuple[float, np.ndarray]:
    """(mean IoU, per-class IoU) with tf.metrics.mean_iou semantics:
    classes with tp+fp+fn == 0 are excluded from the mean (their IoU is
    reported as 0)."""
    cm = np.asarray(confusion, np.float64)
    tp = np.diag(cm)
    denom = cm.sum(0) + cm.sum(1) - tp
    valid = denom > 0
    iou = np.where(valid, tp / np.maximum(denom, 1e-12), 0.0)
    mean = iou[valid].mean() if valid.any() else 0.0
    return float(mean), iou


def accuracy(labels, predictions, valid_mask) -> jnp.ndarray:
    """Fraction of correct predictions over valid points (ref train.py:162-163)."""
    correct = (labels == predictions) & valid_mask
    n = jnp.maximum(jnp.sum(valid_mask.astype(jnp.float32)), 1.0)
    return jnp.sum(correct.astype(jnp.float32)) / n


class StreamingMeanIoU:
    """Host-side convenience wrapper with reset(), like the reference's
    named reset op (``train.py:158-161``)."""

    def __init__(self, num_classes: int = 21):
        self.num_classes = num_classes
        self.reset()

    def reset(self):
        self._cm = np.zeros((self.num_classes, self.num_classes), np.float64)

    def update(self, labels, predictions, valid_mask=None):
        labels = np.asarray(labels).reshape(-1)
        predictions = np.asarray(predictions).reshape(-1)
        if valid_mask is None:
            valid_mask = np.ones_like(labels, bool)
        valid_mask = np.asarray(valid_mask).reshape(-1).astype(bool)
        l, p = labels[valid_mask], predictions[valid_mask]
        cm = np.bincount(
            l * self.num_classes + p, minlength=self.num_classes ** 2
        ).reshape(self.num_classes, self.num_classes)
        self._cm += cm

    def update_confusion(self, partial_cm):
        self._cm += np.asarray(partial_cm, np.float64)

    def result(self):
        return miou_from_confusion(self._cm)

    @property
    def confusion(self):
        return self._cm
