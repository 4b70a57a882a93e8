"""Loss functions.

``weighted_softmax_cross_entropy`` reproduces
``tf.losses.sparse_softmax_cross_entropy(labels, logits, weights)`` with the
default ``Reduction.SUM_BY_NONZERO_WEIGHTS`` — sum of weighted per-point CE
divided by the NUMBER of non-zero weights (not the weight sum).  That exact
normalization is what the reference trains with
(``attention_points/train.py:143``), with per-point weight =
class_weight[label] * in-inner-cuboid mask (``train.py:106-108``).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Per-element sparse softmax CE.  logits (..., C), labels (...) int.

    The label logit is picked with a one-hot reduction, not take_along_axis:
    on TPU a take_along_axis over the class axis lowers to a per-row gather
    (descriptor-bound, ~1.7 ms/step at B16xN8192) while the one-hot multiply
    fuses into the surrounding elementwise code (~0.03 ms).
    """
    logz = jax.nn.logsumexp(logits, axis=-1)
    onehot = labels[..., None] == jnp.arange(logits.shape[-1], dtype=labels.dtype)
    label_logit = jnp.sum(logits * onehot, axis=-1)
    return logz - label_logit


def weighted_softmax_cross_entropy(
    logits: jnp.ndarray, labels: jnp.ndarray, weights: jnp.ndarray
) -> jnp.ndarray:
    """sum(w * ce) / count(w != 0), matching tf.losses default reduction."""
    ce = softmax_cross_entropy(logits.astype(jnp.float32), labels)
    num_nonzero = jnp.sum((weights != 0).astype(jnp.float32))
    total = jnp.sum(ce * weights)
    return total / jnp.maximum(num_nonzero, 1.0)


def mean_softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Unweighted mean CE (classification/part-seg losses, e.g.
    ``pointnet2_cls_ssg.get_loss``)."""
    return jnp.mean(softmax_cross_entropy(logits.astype(jnp.float32), labels))
