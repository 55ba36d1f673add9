"""Pure-numpy golden reference implementations of the geometry primitives.

Written from the behavioural spec of the reference CUDA kernels
(`/root/reference/modules/pointnet2/pointnet2/src/`, see SURVEY.md 2.1) as
naive sequential scans. Used only by the test-suite.
"""

import numpy as np


def fps_ref(xyz: np.ndarray, npoint: int) -> np.ndarray:
    """Sequential FPS: start at 0, running min-distance, argmax each step."""
    B, N, _ = xyz.shape
    out = np.zeros((B, npoint), dtype=np.int32)
    for b in range(B):
        temp = np.full(N, 1e10, dtype=np.float64)
        last = 0
        for j in range(1, npoint):
            d2 = np.sum((xyz[b] - xyz[b, last]) ** 2, axis=-1)
            temp = np.minimum(temp, d2)
            last = int(np.argmax(temp))
            out[b, j] = last
    return out


def ball_query_ref(radius: float, nsample: int, xyz: np.ndarray,
                   new_xyz: np.ndarray) -> np.ndarray:
    """Sequential scan with first-hit slot filling (ball_query_gpu.cu:29-44)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    idx = np.zeros((B, M, nsample), dtype=np.int32)
    r2 = radius * radius
    for b in range(B):
        for m in range(M):
            cnt = 0
            for k in range(N):
                d2 = np.sum((new_xyz[b, m] - xyz[b, k]) ** 2)
                if d2 < r2:
                    if cnt == 0:
                        idx[b, m, :] = k
                    idx[b, m, cnt] = k
                    cnt += 1
                    if cnt >= nsample:
                        break
    return idx


def three_nn_ref(unknown: np.ndarray, known: np.ndarray):
    """Sequential best-3 scan (interpolate_gpu.cu:30-51); ties -> lower index."""
    B, N, _ = unknown.shape
    M = known.shape[1]
    dist = np.zeros((B, N, 3), dtype=np.float64)
    idx = np.zeros((B, N, 3), dtype=np.int32)
    for b in range(B):
        d2 = np.sum((unknown[b][:, None, :] - known[b][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d2, axis=-1, kind="stable")[:, :3]
        idx[b] = order
        dist[b] = np.take_along_axis(d2, order, axis=-1)
    return np.sqrt(dist), idx


def knn_ref(query: np.ndarray, points: np.ndarray, K: int):
    """K-NN returning SQUARED distances (chamferdist convention)."""
    B, M, _ = query.shape
    dists = np.zeros((B, M, K), dtype=np.float64)
    idx = np.zeros((B, M, K), dtype=np.int32)
    for b in range(B):
        d2 = np.sum((query[b][:, None, :] - points[b][None, :, :]) ** 2, axis=-1)
        order = np.argsort(d2, axis=-1, kind="stable")[:, :K]
        idx[b] = order
        dists[b] = np.take_along_axis(d2, order, axis=-1)
    return dists, idx
