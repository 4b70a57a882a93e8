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
