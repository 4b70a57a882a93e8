"""PointNet++ set-abstraction / feature-propagation modules.

TPU-native equivalents of ``pointnet2_tensorflow/utils/pointnet_util.py`` plus
the attention-pooled SA variants of
``attention_points/attention_scannet/attention_layer.py:213-337`` and
``pooling_attention_layer.py``.  One configurable ``SetAbstraction`` module
covers all the reference's SA flavors via its ``pooling`` field:

  'max' | 'avg' | 'weighted_avg' | 'max_and_avg'   (ref pointnet_util.py:130-146)
  'attention'            — AttentionPool(4, 4, C//4) queried by the group's
                           first element, + BN     (ref attention_layer.py:213-278)
  'attention_and_pool'   — attention output + max-pool output
                                                   (ref attention_layer.py:281-337)
  'attention_centroid'   — attention queried by the group centroid coordinates
                                                   (ref pooling_attention_layer.py:6-46)

Everything is fixed-shape: FPS / ball-query produce (B, npoint, nsample) index
tensors, grouping is gathers, the shared MLP is a fused channel einsum on the
MXU.  No host round trips anywhere (the reference ran three_nn/interpolate on
CPU — here FP is pure device code).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from pointcloud_segmentation_attention_tpu import ops
from pointcloud_segmentation_attention_tpu.nn.attention import AttentionPool
from pointcloud_segmentation_attention_tpu.nn.layers import ScheduledBatchNorm, SharedMLP


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jnp.ndarray,
    points: Optional[jnp.ndarray],
    knn: bool = False,
    use_xyz: bool = True,
):
    """FPS -> (ball query | kNN) -> group -> center-relative xyz -> concat feats.

    Reference: ``pointnet_util.sample_and_group`` (:16-58).

    Returns (new_xyz (B,np,3), new_points (B,np,ns,3+C), idx (B,np,ns),
    grouped_xyz (B,np,ns,3) centered).
    """
    fps_idx = ops.farthest_point_sample(xyz, npoint)
    new_xyz = ops.gather_point(xyz, fps_idx)
    if knn:
        _, idx = ops.knn_point(nsample, xyz, new_xyz)
        cnt = None
    else:
        idx, cnt = ops.ball_query(xyz, new_xyz, radius, nsample)
    # One combined gather for xyz+features: the gather's cost on TPU is per
    # slice (row count), not per byte — two separate group_points cost ~2x one
    # wide one (measured 7.5 ms vs 4.0 ms at the L1 shapes, B16).  With ball
    # counts the Pallas count-aware gather halves it again (4.4 -> 2.2 ms).
    if points is not None:
        grouped = ops.group_point_with_counts(
            jnp.concatenate([xyz, points.astype(xyz.dtype)], axis=-1), idx, cnt
        )
        grouped_xyz = grouped[..., :3] - new_xyz[:, :, None, :]
        grouped_points = grouped[..., 3:].astype(points.dtype)
        if use_xyz:
            new_points = jnp.concatenate([grouped_xyz, grouped_points], axis=-1)
        else:
            new_points = grouped_points
    else:
        grouped_xyz = (ops.group_point_with_counts(xyz, idx, cnt)
                       - new_xyz[:, :, None, :])
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


def sample_and_group_all(xyz: jnp.ndarray, points: Optional[jnp.ndarray], use_xyz: bool = True):
    """Group the whole cloud into one region with centroid (0,0,0).

    Reference: ``pointnet_util.sample_and_group_all`` (:61-87).
    """
    b, n, _ = xyz.shape
    new_xyz = jnp.zeros((b, 1, 3), xyz.dtype)
    idx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, None], (b, 1, n))
    grouped_xyz = xyz[:, None]  # (B, 1, N, 3)
    if points is not None:
        if use_xyz:
            new_points = jnp.concatenate([xyz, points], axis=-1)[:, None]
        else:
            new_points = points[:, None]
    else:
        new_points = grouped_xyz
    return new_xyz, new_points, idx, grouped_xyz


class SetAbstraction(nn.Module):
    """PointNet++ SA module with all the reference's pooling flavors."""

    npoint: Optional[int]
    radius: Optional[float]
    nsample: Optional[int]
    mlp: Sequence[int]
    mlp2: Optional[Sequence[int]] = None
    group_all: bool = False
    pooling: str = "max"
    knn: bool = False
    use_xyz: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        points: Optional[jnp.ndarray],
        *,
        train: bool = True,
        bn_momentum=0.9,
    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        if self.group_all:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group_all(
                xyz, points, self.use_xyz
            )
        else:
            new_xyz, new_points, idx, grouped_xyz = sample_and_group(
                self.npoint, self.radius, self.nsample, xyz, points, self.knn, self.use_xyz
            )

        # Shared MLP over group members (the FLOPs hot loop).  Keep the
        # rank-4 (B, np, ns, C) view: XLA picks a {1,3,2,0} layout for the
        # grouped conv/BN fusions and pays a relayout copy of the gather
        # output (0.93 ms/step at SA1+SA2) — but a rank-3 (B, np*ns, C)
        # view that avoids the copy makes the fusions themselves slower
        # (measured 21.6 -> 25.9 ms full step, round 3; the layout is the
        # fusions' win, the copy is its price).
        new_points = SharedMLP(self.mlp, compute_dtype=self.compute_dtype, name="mlp")(
            new_points, train=train, bn_momentum=bn_momentum
        )

        pooling = self.pooling
        if pooling == "max":
            new_points = jnp.max(new_points, axis=2, keepdims=True)
        elif pooling == "avg":
            new_points = jnp.mean(new_points, axis=2, keepdims=True)
        elif pooling == "weighted_avg":
            # exp(-5 * |dxyz|) softmin over the group (ref pointnet_util.py:134-141)
            dists = jnp.linalg.norm(grouped_xyz, axis=-1, keepdims=True)
            exp_dists = jnp.exp(-dists * 5.0)
            w = exp_dists / jnp.sum(exp_dists, axis=2, keepdims=True)
            new_points = jnp.sum(new_points * w, axis=2, keepdims=True)
        elif pooling == "max_and_avg":
            mx = jnp.max(new_points, axis=2, keepdims=True)
            av = jnp.mean(new_points, axis=2, keepdims=True)
            new_points = jnp.concatenate([av, mx], axis=-1)
        elif pooling in ("attention", "attention_and_pool", "attention_centroid"):
            out_dim = self.mlp[-1]
            if out_dim % 4 != 0:
                raise ValueError(
                    f"attention pooling needs mlp[-1] divisible by 4 "
                    f"(heads = C/4 x key_dim 4, ref attention_layer.py:256-258); "
                    f"got {out_dim}"
                )
            heads = out_dim // 4
            if pooling == "attention_centroid":
                # Query = group centroid coordinates (ref pooling_attention_layer.py:41)
                query = new_xyz[:, :, None, :]
            else:
                # Query = the group's first element (ref attention_layer.py:259)
                query = new_points[:, :, :1, :]
            att = AttentionPool(
                output_dim=4, key_dim=4, num_heads=heads,
                compute_dtype=self.compute_dtype, name="attention_pool",
            )(new_points, query)  # (B, np, heads*4) == (B, np, out_dim)
            if pooling == "attention_and_pool":
                pool = jnp.max(new_points, axis=2, keepdims=True)
            att = att[:, :, None, :]  # (B, np, 1, C)
            att = ScheduledBatchNorm(name="attention_bn")(
                att, train=train, momentum=bn_momentum
            )
            new_points = att + pool if pooling == "attention_and_pool" else att
        else:
            raise ValueError(f"unknown pooling: {pooling}")

        if self.mlp2:
            new_points = SharedMLP(
                self.mlp2, compute_dtype=self.compute_dtype, name="mlp2"
            )(new_points, train=train, bn_momentum=bn_momentum)

        new_points = jnp.squeeze(new_points, axis=2)  # (B, npoint, C)
        return new_xyz, new_points, idx


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping SA (ref ``pointnet_sa_module_msg`` :162-203).

    Note the reference concatenates [features, centered_xyz] (xyz LAST) in MSG,
    opposite of the SSG order — reproduced here.
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    use_xyz: bool = True
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz: jnp.ndarray,
        points: Optional[jnp.ndarray],
        *,
        train: bool = True,
        bn_momentum=0.9,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        fps_idx = ops.farthest_point_sample(xyz, self.npoint)
        new_xyz = ops.gather_point(xyz, fps_idx)
        outs = []
        for i, (radius, nsample) in enumerate(zip(self.radius_list, self.nsample_list)):
            idx, cnt = ops.ball_query(xyz, new_xyz, radius, nsample)
            if points is not None:
                # Single combined gather (see sample_and_group); xyz LAST here.
                both = ops.group_point_with_counts(
                    jnp.concatenate([points.astype(xyz.dtype), xyz], axis=-1),
                    idx, cnt,
                )
                grouped_xyz = both[..., -3:] - new_xyz[:, :, None, :]
                if self.use_xyz:
                    grouped = jnp.concatenate(
                        [both[..., :-3].astype(points.dtype), grouped_xyz],
                        axis=-1,
                    )
                else:
                    grouped = both[..., :-3].astype(points.dtype)
            else:
                grouped = (ops.group_point_with_counts(xyz, idx, cnt)
                           - new_xyz[:, :, None, :])
            grouped = SharedMLP(
                self.mlp_list[i], compute_dtype=self.compute_dtype, name=f"branch{i}"
            )(grouped, train=train, bn_momentum=bn_momentum)
            outs.append(jnp.max(grouped, axis=2))
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """FP module: 3-NN inverse-distance interpolation + skip concat + MLP.

    Reference: ``pointnet_fp_module`` (:206-236).  Unlike the reference (whose
    three_nn/three_interpolate ops were CPU-only, forcing a device->host->device
    round trip at every FP level), this runs entirely on device.
    """

    mlp: Sequence[int]
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        xyz1: jnp.ndarray,
        xyz2: jnp.ndarray,
        points1: Optional[jnp.ndarray],
        points2: jnp.ndarray,
        *,
        train: bool = True,
        bn_momentum=0.9,
    ) -> jnp.ndarray:
        dist, idx = ops.three_nn(xyz1, xyz2)
        weight = ops.interpolation_weights(dist)
        interpolated = ops.three_interpolate(points2, idx, weight)
        if points1 is not None:
            interpolated = jnp.concatenate([interpolated, points1], axis=-1)
        return SharedMLP(self.mlp, compute_dtype=self.compute_dtype, name="mlp")(
            interpolated, train=train, bn_momentum=bn_momentum
        )
