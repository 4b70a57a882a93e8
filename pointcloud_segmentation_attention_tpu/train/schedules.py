"""Training schedules — exact parity with the reference trainer.

Reference: ``attention_points/train.py:27-58`` (staircase exponential decay for
both learning rate and BN momentum), and the upstream
``pointnet2_tensorflow/train.py:85-106`` variants with argparse'd decay knobs.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp


@dataclass(frozen=True)
class ExpDecaySchedule:
    """tf.train.exponential_decay(staircase=True) with an optional floor/cap.

    value(step) = base * rate ** floor(step * batch_size / decay_step)
    """

    base: float
    decay_rate: float
    decay_step: float
    batch_size: int = 1
    staircase: bool = True

    def __call__(self, step) -> jnp.ndarray:
        step = jnp.asarray(step, jnp.float32)
        exponent = step * self.batch_size / self.decay_step
        if self.staircase:
            exponent = jnp.floor(exponent)
        return self.base * jnp.power(self.decay_rate, exponent)


def scannet_learning_rate(step, batch_size: int = 16, n_train_scenes: int = 1201):
    """LR 1e-3 x 0.7 every 80 'epochs worth' of samples, floored at 1e-5
    (ref attention_points/train.py:27-41)."""
    lr = ExpDecaySchedule(1e-3, 0.7, n_train_scenes * 80, batch_size)(step)
    return jnp.maximum(lr, 1e-5)


def scannet_bn_momentum(step, batch_size: int = 16, n_train_scenes: int = 1201):
    """BN EMA decay: 1 - 0.5 * 0.5^k, capped at 0.99
    (ref attention_points/train.py:44-58)."""
    bn_momentum = ExpDecaySchedule(0.5, 0.5, n_train_scenes * 80, batch_size)(step)
    return jnp.minimum(0.99, 1.0 - bn_momentum)


def upstream_learning_rate(
    step,
    base_lr: float = 1e-3,
    batch_size: int = 16,
    decay_step: float = 200000,
    decay_rate: float = 0.7,
):
    """Upstream classification trainer LR (ref pointnet2_tensorflow/train.py:85-93)."""
    lr = ExpDecaySchedule(base_lr, decay_rate, decay_step, batch_size)(step)
    return jnp.maximum(lr, 1e-5)


def upstream_bn_momentum(
    step,
    batch_size: int = 16,
    decay_step: float = 200000,
    bn_init_decay: float = 0.5,
    bn_decay_rate: float = 0.5,
    bn_decay_clip: float = 0.99,
):
    """Upstream BN decay (ref pointnet2_tensorflow/train.py:96-106; the decay
    step there is BN_DECAY_DECAY_STEP = float(DECAY_STEP))."""
    m = ExpDecaySchedule(bn_init_decay, bn_decay_rate, decay_step, batch_size)(step)
    return jnp.minimum(bn_decay_clip, 1.0 - m)
