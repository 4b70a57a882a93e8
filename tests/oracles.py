"""Slow numpy oracles reproducing the reference CUDA/C++ op semantics exactly.

Each mirrors the corresponding kernel loop structure (tf_sampling_g.cu,
tf_grouping_g.cu, tf_interpolate.cpp) so the JAX/Pallas implementations can be
golden-tested against independent code.
"""
import numpy as np


def fps_oracle(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """farthestpointsamplingKernel (tf_sampling_g.cu:105-170)."""
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), np.int32)
    for bi in range(b):
        mind = np.full(n, 1e38, np.float32)
        old = 0
        out[bi, 0] = 0
        for j in range(1, npoint):
            d = np.sum((xyz[bi] - xyz[bi, old]) ** 2, axis=-1).astype(np.float32)
            mind = np.minimum(mind, d)
            old = int(np.argmax(mind))
            out[bi, j] = old
    return out


def ball_query_oracle(xyz, new_xyz, radius, nsample):
    """query_ball_point_gpu (tf_grouping_g.cu:3-36)."""
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    idx = np.zeros((b, m, nsample), np.int32)
    cnt_out = np.zeros((b, m), np.int32)
    for bi in range(b):
        for j in range(m):
            cnt = 0
            for k in range(n):
                if cnt == nsample:
                    break
                d = max(np.sqrt(np.sum((new_xyz[bi, j] - xyz[bi, k]) ** 2)), 1e-20)
                if d < radius:
                    if cnt == 0:
                        idx[bi, j, :] = k
                    idx[bi, j, cnt] = k
                    cnt += 1
            cnt_out[bi, j] = cnt
    return idx, cnt_out


def three_nn_oracle(xyz1, xyz2):
    """threenn_cpu (tf_interpolate.cpp:60-103): squared dists, ascending."""
    b, n, _ = xyz1.shape
    dists = np.zeros((b, n, 3), np.float64)
    idx = np.zeros((b, n, 3), np.int32)
    for bi in range(b):
        d2 = np.sum(
            (xyz1[bi][:, None, :].astype(np.float64) - xyz2[bi][None].astype(np.float64)) ** 2,
            axis=-1,
        )
        order = np.argsort(d2, axis=-1, kind="stable")[:, :3]
        idx[bi] = order
        dists[bi] = np.take_along_axis(d2, order, axis=-1)
    return dists.astype(np.float32), idx


def three_interpolate_oracle(points, idx, weight):
    """threeinterpolate_cpu (tf_interpolate.cpp:107-153)."""
    b, n, _ = idx.shape
    c = points.shape[-1]
    out = np.zeros((b, n, c), np.float32)
    for bi in range(b):
        for i in range(n):
            for k in range(3):
                out[bi, i] += weight[bi, i, k] * points[bi, idx[bi, i, k]]
    return out


def _softmax(x, axis=-1):
    e = np.exp(x - x.max(axis=axis, keepdims=True))
    return e / e.sum(axis=axis, keepdims=True)


def attention_pool_oracle(inp, query, wq, bq, wk, bk, wv, bv, num_heads, key_dim):
    """Literal numpy port of the reference AttentionLayer.call
    (attention_layer.py:29-45), quirks and all: the raw row-major head-split
    reshape (:34-35), V reshaped with key_dim although projected to
    output_dim*heads (:35), softmax over the group axis (:38-39), and the
    heads*key_dim concat with NO output projection (:41-44).

    inp: (B, np, S, C); query: (B, np, 1, C).  Weights are (in, out) mats.
    """
    b, npt, s, _ = inp.shape
    h, kd = num_heads, key_dim
    q = query @ wq + bq                       # (B, np, 1, h*kd)
    q = q[:, :, None]                          # expand_dims axis=2 (:32)
    k = inp @ wk + bk                          # (B, np, S, h*kd)
    v = inp @ wv + bv                          # (B, np, S, od*h)
    # reshape to (B, shape1, heads, shape2, key_dim) (:34-35)
    q = q.reshape(b, npt, h, 1, kd)
    k = k.reshape(b, npt, h, s, kd)
    v = v.reshape(b, npt, h, s, kd)
    w = (q @ np.swapaxes(k, -1, -2)) / np.sqrt(np.float32(kd))
    w = _softmax(w, -1)
    out = w @ v                                # (B, np, h, 1, kd)
    return out.reshape(b, npt, h * kd)         # concat heads (:41)


def inner_attention_oracle(x, wq, bq, wk, bk, wv, bv, wo, bo, num_heads, key_dim):
    """Literal numpy port of the reference InnerAttentionLayer.call
    (attention_layer.py:62-78) INCLUDING the call-convention artifact: the
    layer receives a one-element LIST, which TF stacks into a rank-5
    (1, B, np, S, C) tensor, so the (:67-68) reshape splits heads off the
    channel axis and the matmul/softmax mix the 5 HEADS within each point,
    not the points within the group.

    x: (B, np, S, C) as the user sees it; the leading stack axis is applied
    here, as TF's convert_to_tensor([x]) did.
    """
    b, npt, s, _ = x.shape
    h, kd = num_heads, key_dim
    x5 = x[None]                               # list -> stacked rank 5
    q = x5 @ wq + bq                           # (1, B, np, S, h*kd)
    k = x5 @ wk + bk
    v = x5 @ wv + bv
    # (1, shape1, shape2, shape3, heads, key_dim) (:67-68)
    q = q.reshape(1, b, npt, s, h, kd)
    k = k.reshape(1, b, npt, s, h, kd)
    v = v.reshape(1, b, npt, s, h, kd)
    w = (q @ np.swapaxes(k, -1, -2)) / np.sqrt(np.float32(kd))  # (1,B,np,S,h,h)
    w = _softmax(w, -1)                        # normalises over HEADS (:74)
    out = w @ v                                # (1, B, np, S, h, kd)
    cat = out.reshape(b, npt, s, h * kd)       # drops the stack axis (:76-77)
    return cat @ wo + bo                       # out_net (:78)


def feed_forward_oracle(x, weights):
    """Reference FeedForwardLayer.call (attention_layer.py:95-105), eval mode
    (tf.layers.dropout is identity when not training).  weights: list of four
    (w, b) pairs."""
    for i, (w, b) in enumerate(weights):
        x = x @ w + b
        if i < 3:
            x = np.maximum(x, 0.0)
    return x
