"""Group-attention layers — the reference project's novel components.

TPU-native re-implementations of
``attention_points/attention_scannet/attention_layer.py``.  The math —
including its quirks — is reproduced exactly, because the reference's trained
variants depend on them:

- ``AttentionPool`` (ref ``AttentionLayer:10-45``): pools a
  (B, npoint, nsample, C) group down to (B, npoint, heads*key_dim) with a
  single query vector per group.  The head split is a raw row-major reshape of
  the projected activations (NOT a transpose-correct split) and there is no
  output projection (commented out in the reference, :27/:43).  The final
  concat uses ``heads * key_dim`` (not ``output_dim``) exactly as :41.
- ``InnerAttention`` (ref ``InnerAttentionLayer:48-78``): because the reference
  reshapes its rank-5 input to (..., nsample, heads, key_dim) and then matmuls
  over the LAST TWO axes, the softmax attention actually mixes *heads within
  each point*, not points within the group.  Deterministic, reproduced as-is.
- ``FeedForward`` / ``InnerAttentionBlock`` (ref :81-125): 4-layer ReLU MLP and
  the pre-FF -> inner-attention -> FF(+residual) block (no BN/skip, per the
  reference's TODOs).

All dense projections run through a single einsum per layer so XLA batches
them onto the MXU across (B * npoint) groups.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from pointcloud_segmentation_attention_tpu.nn.layers import Dense, Dropout


class AttentionPool(nn.Module):
    """Multi-head scaled dot-product attention pooling of a point group.

    Query: one vector per group (e.g. the group's first element or centroid).
    Returns (B, npoint, num_heads * key_dim).
    """

    output_dim: int
    key_dim: int
    num_heads: int = 16
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, group_feats: jnp.ndarray, query: jnp.ndarray) -> jnp.ndarray:
        b, npoint, nsample, _ = group_feats.shape
        h, kd, od = self.num_heads, self.key_dim, self.output_dim
        dd = self.compute_dtype

        q = Dense(kd * h, compute_dtype=dd, name="query_net")(query)  # (B, np, 1, h*kd)
        k = Dense(kd * h, compute_dtype=dd, name="key_net")(group_feats)
        v = Dense(od * h, compute_dtype=dd, name="value_net")(group_feats)

        # Raw row-major head split, mirroring the reference's reshape
        # (B, np, S, h*kd) -> (B, np, h, S, kd).  Note: value_net projects to
        # od*h but is reshaped with key_dim, exactly like the reference (:35),
        # which only round-trips when od == kd — the configuration every
        # caller in the reference uses.
        q = q.reshape(b, npoint, h, 1, kd)
        k = k.reshape(b, npoint, h, nsample, kd)
        v = v.reshape(b, npoint, h, nsample, kd)

        logits = jnp.einsum(
            "bphqd,bphsd->bphqs", q.astype(dd), k.astype(dd),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(kd))
        weights = nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bphqs,bphsd->bphqd", weights.astype(dd), v.astype(dd),
            preferred_element_type=jnp.float32,
        )
        return out.reshape(b, npoint, h * kd)


class InnerAttention(nn.Module):
    """Self-attention "within" each group — reproduces the reference's
    head-mixing matmul semantics (see module docstring).  5 heads fixed."""

    output_dim: int
    key_dim: int
    num_heads: int = 5
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # x: (B, npoint, nsample, C)
        b, npoint, nsample, _ = x.shape
        h, kd = self.num_heads, self.key_dim
        dd = self.compute_dtype

        q = Dense(kd * h, compute_dtype=dd, name="query_net")(x)
        k = Dense(kd * h, compute_dtype=dd, name="key_net")(x)
        v = Dense(kd * h, compute_dtype=dd, name="value_net")(x)
        # (B, np, S, h*kd) -> (B, np, S, h, kd); attention contracts kd and
        # normalizes over the *head* axis, as in the reference (:70-74).
        q = q.reshape(b, npoint, nsample, h, kd)
        k = k.reshape(b, npoint, nsample, h, kd)
        v = v.reshape(b, npoint, nsample, h, kd)
        logits = jnp.einsum(
            "bpshd,bpsgd->bpshg", q.astype(dd), k.astype(dd),
            preferred_element_type=jnp.float32,
        ) / jnp.sqrt(jnp.float32(kd))
        weights = nn.softmax(logits, axis=-1)
        out = jnp.einsum(
            "bpshg,bpsgd->bpshd", weights.astype(dd), v.astype(dd),
            preferred_element_type=jnp.float32,
        )
        out = out.reshape(b, npoint, nsample, h * kd)
        return Dense(self.output_dim, compute_dtype=dd, name="out_net")(out)


class FeedForward(nn.Module):
    """4-layer Dense + ReLU (+ dropout) MLP (ref ``FeedForwardLayer:81-105``)."""

    input_and_output_dim: int
    inner_dim: int
    dropout: float = 0.0
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dd = self.compute_dtype
        for i in range(3):
            x = Dense(self.inner_dim, compute_dtype=dd, name=f"layer_{i + 1}")(x)
            x = nn.relu(x)
            x = Dropout(self.dropout, name=f"drop_{i + 1}")(x, deterministic=deterministic)
        return Dense(self.input_and_output_dim, compute_dtype=dd, name="layer_4")(x)


class InnerAttentionBlock(nn.Module):
    """pre-FF -> inner attention -> FF with residual (ref :108-125)."""

    out_dim: int
    key_dim: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, deterministic: bool = True) -> jnp.ndarray:
        dd = self.compute_dtype
        x = FeedForward(self.out_dim, self.out_dim, compute_dtype=dd,
                        name="pre_feed_forward")(x, deterministic=deterministic)
        x = InnerAttention(self.out_dim, self.key_dim, compute_dtype=dd,
                           name="attention")(x)
        x = FeedForward(self.out_dim, self.out_dim, compute_dtype=dd,
                        name="feed_forward")(x, deterministic=deterministic) + x
        return x
