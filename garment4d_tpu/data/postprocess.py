"""Post-processing: Laplacian smoothing + body-garment interpenetration removal.

Parity with reference `utils/post_processing.py`:

  * `laplacian_smooth`: 100 alternating diffusion steps (+0.05 / -0.052) with
    the row-normalised adjacency (`post_processing.py:300-309`) - on device,
    expressed as two precomputed dense operators applied 50x (or step-wise).
  * `remove_interpenetration`: nearest body point + normal, detect inside
    vertices (signed distance <= -1e-6), push out by eps=0.008 along the
    normal, then solve the sparse least-squares system
    (L | w I) x = (L v | w targets) (`post_processing.py:145-228`), iterated
    until no penetration (<= 5 rounds). The detection/targets run in JAX; the
    sparse solve stays on scipy (offline path, matching the reference).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from garment4d_tpu import ops

Array = jax.Array


def laplacian_smooth(verts: Array, norm_adj: Array, iters: int = 100,
                     lam: float = 0.05, mu: float = -0.052) -> Array:
    """Taubin-style alternating smoothing (reference `post_processing.py:300-309`).

    verts: (..., V, 3); norm_adj: (V, V) row-normalised adjacency.
    Odd steps move towards the neighbourhood mean by `lam`, even steps away
    by `mu` (shrink compensation).
    """
    def step(v, coeff):
        delta = ops.graph_matmul(norm_adj, v) - v
        return v + coeff * delta

    v = verts
    for i in range(iters):
        v = step(v, lam if i % 2 == 0 else mu)
    return v


def detect_penetration(garment_v: Array, body_v: Array, body_vn: Array,
                       threshold: float = -1e-6):
    """Nearest body point + inside test.

    Returns (inside_mask (B, Vg), nearest body point, nearest normal).
    Reference uses an AABB tree (`post_processing.py:166-175`); the 1-NN over
    6890 body vertices is a single fused distance matrix on TPU.
    """
    nn = ops.knn_points(garment_v, body_v, K=1)
    nearest = ops.group_points(body_v, nn.idx)[:, :, 0, :]
    normal = ops.group_points(body_vn, nn.idx)[:, :, 0, :]
    direction = jnp.sum(normal * (garment_v - nearest), axis=-1)
    return direction <= threshold, nearest, normal


def push_out_targets(garment_v: Array, inside: Array, nearest: Array,
                     normal: Array, eps: float = 0.008) -> Array:
    """Target positions: inside vertices projected to nearest + eps * normal
    (reference `post_processing.py:176-184`)."""
    pushed = nearest + eps * normal
    return jnp.where(inside[..., None], pushed, garment_v)


def _uniform_laplacian_csr(adj: np.ndarray):
    import scipy.sparse as sp

    deg = adj.sum(axis=1)
    L = sp.csr_matrix(np.diag(deg) - adj)
    return L


def remove_interpenetration(garment_v: np.ndarray, body_v: np.ndarray,
                            body_faces: np.ndarray, adj: np.ndarray,
                            eps: float = 0.008, weight: float = 1.0,
                            max_iters: int = 5, return_rounds: bool = False):
    """Iterative push-out with Laplacian-regularised least squares.

    garment_v: (Vg, 3), body_v: (Vb, 3), body_faces: (F, 3), adj: (Vg, Vg)
    binary garment adjacency. Solves (A^T A) x = A^T b with
    A = [L ; w * I_rows(inside)], b = [L v ; w * targets] per round
    (reference `remove_interpenetration_fast`, `post_processing.py:185-228`),
    up to `max_iters` rounds or until nothing is inside. With
    `return_rounds` also returns the number of solve rounds executed.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    v = np.asarray(garment_v, np.float64)
    body = jnp.asarray(body_v[None], jnp.float32)
    body_vn = ops.vertex_normals(body, np.asarray(body_faces, np.int32))
    L = _uniform_laplacian_csr(np.asarray(adj, np.float64))
    Vg = v.shape[0]

    rounds = 0
    for _ in range(max_iters):
        inside, nearest, normal = detect_penetration(
            jnp.asarray(v[None], jnp.float32), body, body_vn)
        inside_np = np.asarray(inside[0])
        if not inside_np.any():
            break
        targets = np.asarray(push_out_targets(
            jnp.asarray(v[None], jnp.float32), inside,
            nearest, normal, eps)[0], np.float64)

        rows = np.where(inside_np)[0]
        I = sp.csr_matrix(
            (np.full(len(rows), weight), (np.arange(len(rows)), rows)),
            shape=(len(rows), Vg))
        A = sp.vstack([L, I]).tocsr()
        b = np.vstack([L @ v, weight * targets[rows]])
        AtA = (A.T @ A).tocsr()
        Atb = A.T @ b
        v = np.column_stack([
            spla.spsolve(AtA, Atb[:, c]) for c in range(3)])
        rounds += 1
    if return_rounds:
        return v.astype(np.float32), rounds
    return v.astype(np.float32)


def process_frame(garment_v: np.ndarray, body_v: np.ndarray,
                  body_faces: np.ndarray, adj: np.ndarray,
                  norm_adj: np.ndarray, smooth_iters: int = 100) -> np.ndarray:
    """Full per-frame post-process: smooth then de-penetrate
    (reference `process_single_frame` path, `post_processing.py:300-317`)."""
    smoothed = np.asarray(laplacian_smooth(
        jnp.asarray(garment_v[None], jnp.float32), jnp.asarray(norm_adj),
        iters=smooth_iters))[0]
    return remove_interpenetration(smoothed, body_v, body_faces, adj)
