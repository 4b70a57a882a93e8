"""Fold frozen BatchNorm into convolution weights for the serving path.

At inference the BN statistics are frozen (``ScheduledBatchNorm`` eval mode
uses the running mean/var), so every ``PointConv`` + BN pair

    y = relu(((x @ K + b) - mean) * rsqrt(var + eps) * scale + beta)

collapses to a single affine epilogue that can live INSIDE the kernel:

    K' = K * inv            (per output channel, inv = rsqrt(var+eps)*scale)
    b' = (b - mean) * inv + beta

This is a PURE parameter transform — no model change: the BN module is
neutralized by setting scale=1, beta=0, mean=0, var=1-eps so its eval-mode
output is exactly the identity (``rsqrt(1-eps+eps) == 1``).  Standalone BN
layers without a paired kernel (e.g. the attention-pooling ``attention_bn``,
``nn/modules.py:177``) are left untouched.

The reference has no counterpart (its serving path re-runs full BN per
layer, ``tf_util.batch_norm_template``); this is the VERDICT r3 #8
experiment: measure whether removing the BN epilogue moves the
at-HBM-bandwidth inference step (XLA already fuses eval-BN into the matmul
epilogue, so the expected delta is ~zero — the measurement settles it
either way; see docs/performance.md).
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np

_BN_EPS = 1e-3   # ScheduledBatchNorm.epsilon default (tf.contrib parity)


def _fold_tree(params: Dict[str, Any], stats: Dict[str, Any],
               eps: float) -> Tuple[Dict[str, Any], Dict[str, Any], int]:
    """Recursively fold every {kernel[, bias], bn{scale,bias}} node whose
    batch_stats sibling carries {bn{mean,var}}; returns (params', stats',
    n_folded)."""
    import jax.numpy as jnp

    folded = 0
    new_p: Dict[str, Any] = {}
    new_s: Dict[str, Any] = dict(stats) if isinstance(stats, dict) else stats
    for k, v in params.items():
        sub_stats = stats.get(k, {}) if isinstance(stats, dict) else {}
        if isinstance(v, dict):
            if ("kernel" in v and "bn" in v and isinstance(v["bn"], dict)
                    and isinstance(sub_stats.get("bn"), dict)
                    and "mean" in sub_stats["bn"]):
                bn_p, bn_s = v["bn"], sub_stats["bn"]
                inv = jax.lax.rsqrt(bn_s["var"] + eps) * bn_p["scale"]
                node = dict(v)
                node["kernel"] = v["kernel"] * inv[None, :]
                bias = v.get("bias", jnp.zeros_like(inv))
                node["bias"] = (bias - bn_s["mean"]) * inv + bn_p["bias"]
                node["bn"] = {"scale": jnp.ones_like(inv),
                              "bias": jnp.zeros_like(inv)}
                new_p[k] = node
                new_s[k] = dict(sub_stats)
                new_s[k]["bn"] = {
                    "mean": jnp.zeros_like(inv),
                    # rsqrt((1-eps) + eps) == 1: eval BN becomes identity.
                    "var": jnp.full_like(inv, 1.0 - eps),
                }
                folded += 1
                continue
            sp, ss, f = _fold_tree(
                v, sub_stats if isinstance(sub_stats, dict) else {}, eps)
            new_p[k] = sp
            if isinstance(stats, dict) and k in stats:
                new_s[k] = ss
            folded += f
        else:
            new_p[k] = v
    return new_p, new_s, folded


def fold_batchnorm_for_inference(state, eps: float = _BN_EPS):
    """TrainState -> TrainState with every PointConv's frozen BN folded into
    its kernel/bias; eval outputs are numerically equivalent (same math,
    reassociated — fp noise ~1e-6 relative).  Train mode on the folded
    state is MEANINGLESS (batch stats were neutralized); serving only."""
    params = jax.device_get(state.params)
    stats = jax.device_get(state.batch_stats)
    new_p, new_s, folded = _fold_tree(params, stats, eps)
    if folded == 0:
        raise ValueError("no foldable kernel+bn pairs found in the state")
    return state.replace(params=new_p, batch_stats=new_s), folded
