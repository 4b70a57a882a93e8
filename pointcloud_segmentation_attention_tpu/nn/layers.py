"""Core NN layers: pointwise convolutions, scheduled-momentum BatchNorm, dropout.

TPU-native replacements for the reference's TF layer wrappers
(``pointnet2_tensorflow/utils/tf_util.py``).  The reference's ``conv2d`` with a
``[1,1]`` kernel over (B, npoint, nsample, C) is just a dense projection of the
channel axis — here it is a single einsum that XLA maps straight onto the MXU,
with the bias/BN/ReLU fused in.

BatchNorm parity note: the reference schedules the EMA decay over training
(``tf_util.batch_norm_template:512-531`` + ``attention_points/train.py:44-58``),
so ``momentum`` must be a *traced* per-step value — Flax's stock BatchNorm
takes it as a static attribute, hence the custom module below.
"""
from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from pointcloud_segmentation_attention_tpu.parallel.act_sharding import (
    constrain_channels,
)


class ScheduledBatchNorm(nn.Module):
    """BatchNorm whose EMA decay is passed per call (traced), like the
    reference's bn_decay schedule.

    Normalizes over all axes except the last (channel) axis.  In training mode
    uses batch statistics and updates the running stats with
    ``ema = decay * ema + (1 - decay) * batch_stat``; in eval mode uses the
    running stats.  Reference: ``tf_util.batch_norm_template`` (which wraps
    ``tf.contrib.layers.batch_norm`` with ``decay=bn_decay``).
    """

    epsilon: float = 1e-3  # tf.contrib.layers.batch_norm default
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool, momentum=0.9):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((c,), jnp.float32))

        if train:
            axes = tuple(range(x.ndim - 1))
            x32 = x.astype(jnp.float32)
            mean = jnp.mean(x32, axis=axes)
            var = jnp.var(x32, axis=axes)
            if not self.is_initializing():
                m = jnp.asarray(momentum, jnp.float32)
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mean, var = ra_mean.value, ra_var.value

        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(x.dtype)


class PointConv(nn.Module):
    """Pointwise (1x1) conv over the channel axis with optional BN + activation.

    Works on any (..., C) tensor; equivalent to the reference's
    ``tf_util.conv2d(..., kernel=[1,1])`` / ``conv1d(kernel=1)`` /
    ``fully_connected`` (``tf_util.py:52-365``) — all of which reduce to a dense
    channel projection.  Weights are stored f32; the matmul runs in
    ``compute_dtype`` (bf16 on TPU by default via model config).
    """

    features: int
    bn: bool = True
    activation: Optional[Callable] = nn.relu
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.float32
    # xavier_uniform matches tf.contrib.layers.xavier_initializer used by tf_util
    kernel_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, x, *, train: bool = True, bn_momentum=0.9):
        c_in = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (c_in, self.features), jnp.float32)
        y = jnp.einsum(
            "...i,io->...o",
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
            y = y + bias
        # Under a TP trace (parallel.model_parallel_jit), anchor the output
        # layout to (data, ..., model) so the partitioner keeps the matmul
        # split over `model` instead of all-gathering kernels; no-op
        # otherwise (parallel/act_sharding.py).
        y = constrain_channels(y)
        if self.bn:
            y = ScheduledBatchNorm(name="bn")(y, train=train, momentum=bn_momentum)
        if self.activation is not None:
            y = self.activation(y)
        return y


class SharedMLP(nn.Module):
    """Stack of PointConv layers — the reference's per-point "shared MLP"
    conv2d stacks inside SA/FP modules (``pointnet_util.py:120-127``)."""

    features: Sequence[int]
    bn: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, train: bool = True, bn_momentum=0.9):
        for i, f in enumerate(self.features):
            x = PointConv(
                f, bn=self.bn, compute_dtype=self.compute_dtype, name=f"conv{i}"
            )(x, train=train, bn_momentum=bn_momentum)
        return x


class Dense(nn.Module):
    """Plain dense layer (tf.layers.Dense parity: glorot_uniform, zero bias)."""

    features: int
    use_bias: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c_in = x.shape[-1]
        kernel = self.param(
            "kernel", nn.initializers.xavier_uniform(), (c_in, self.features), jnp.float32
        )
        y = jnp.einsum(
            "...i,io->...o",
            x.astype(self.compute_dtype),
            kernel.astype(self.compute_dtype),
            preferred_element_type=jnp.float32,
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return y


def dropout(x, rate: float, *, deterministic: bool, rng=None):
    """Inverted dropout (tf_util.dropout keep_prob semantics)."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


class Dropout(nn.Module):
    """Module wrapper so dropout draws from the 'dropout' rng collection."""

    rate: float = 0.5

    @nn.compact
    def __call__(self, x, *, deterministic: bool):
        if deterministic or self.rate == 0.0:
            return x
        return dropout(
            x, self.rate, deterministic=False, rng=self.make_rng("dropout")
        )
