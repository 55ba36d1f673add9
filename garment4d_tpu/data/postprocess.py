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
    """Nearest body VERTEX + inside test — the fast on-device screen.

    Returns (inside_mask (B, Vg), nearest body vertex, its normal). The
    offline parity path (`remove_interpenetration`) uses the exact nearest
    SURFACE point instead (`nearest_surface_points`, reference
    `post_processing.py:145-177`); this vertex form is the cheap device-side
    approximation used for quick penetration statistics.
    """
    nn = ops.knn_points(garment_v, body_v, K=1)
    nearest = ops.group_points(body_v, nn.idx)[:, :, 0, :]
    normal = ops.group_points(body_vn, nn.idx)[:, :, 0, :]
    direction = jnp.sum(normal * (garment_v - nearest), axis=-1)
    return direction <= threshold, nearest, normal


def push_out_targets(garment_v: Array, inside: Array, nearest: Array,
                     normal: Array, eps: float = 0.008) -> Array:
    """Target positions: inside vertices projected to nearest + eps * normal
    (simplified on-device form of reference `post_processing.py:176-184`)."""
    pushed = nearest + eps * normal
    return jnp.where(inside[..., None], pushed, garment_v)


def nearest_surface_points(points: np.ndarray, body_v: np.ndarray,
                           body_faces: np.ndarray):
    """Exact nearest point ON the body surface + region-interpolated normal.

    Replaces the reference's AABB-tree query (`get_nearest_points_and_normals`,
    `post_processing.py:145-177`) with the same semantics: the closest point
    of each query to the triangle soup (exact point-to-triangle projection,
    `tools/transfer.py`), and a normal chosen by which region of the winning
    triangle the projection landed in — face normal for the interior, vertex
    normal at a vertex, sum of the two endpoint vertex normals on an edge,
    all normalised with the reference's +1e-10 guard.

    points: (P, 3), body_v: (Vb, 3), body_faces: (F, 3)
    -> (nearest (P, 3), normals (P, 3)).
    """
    from garment4d_tpu.tools.transfer import surface_correspondence

    faces = np.asarray(body_faces, np.int64)
    face_idx, bary, vidx = surface_correspondence(body_v, faces, points)
    tri = np.asarray(body_v, np.float64)[vidx]         # (P, 3, 3)
    nearest = np.einsum("pk,pkd->pd", bary.astype(np.float64), tri)

    from garment4d_tpu.ops.meshmath import face_normals

    body = jnp.asarray(np.asarray(body_v, np.float32)[None])
    fn = np.asarray(face_normals(body, faces)[0], np.float64)
    vn = np.asarray(ops.vertex_normals(body, faces)[0], np.float64)

    # region classification from the clamped barycentrics: the projection
    # writes EXACT zeros for clamped coordinates, so the number of zero
    # entries identifies interior (0) / edge (1) / vertex (2)
    zero = bary <= 0.0
    nz = zero.sum(axis=1)
    normals = fn[face_idx].copy()                      # interior default
    vert_rows = np.where(nz == 2)[0]
    if len(vert_rows):
        which = np.argmin(zero[vert_rows], axis=1)     # the single nonzero
        normals[vert_rows] = vn[vidx[vert_rows, which]]
    edge_rows = np.where(nz == 1)[0]
    if len(edge_rows):
        nz_mask = ~zero[edge_rows]                     # two nonzero entries
        ends = vidx[edge_rows][nz_mask].reshape(len(edge_rows), 2)
        normals[edge_rows] = vn[ends[:, 0]] + vn[ends[:, 1]]
    normals = normals / (np.linalg.norm(normals, axis=-1, keepdims=True)
                         + 1e-10)
    return nearest, normals


def _lsq_laplacian_csr(adj: np.ndarray):
    """L = I - rownorm(clip(adj, 0, 1)) — the reference's least-squares
    regulariser (`post_processing.py:131-142`), NOT the unnormalised degree
    Laplacian."""
    import scipy.sparse as sp

    a = np.clip(np.asarray(adj, np.float64), 0.0, 1.0)
    rowsum = a.sum(axis=1)
    rowsum[rowsum == 0] = 1.0
    return sp.csr_matrix(np.eye(a.shape[0]) - a / rowsum[:, None])


def remove_interpenetration(garment_v: np.ndarray, body_v: np.ndarray,
                            body_faces: np.ndarray, adj: np.ndarray,
                            garment_faces: Optional[np.ndarray] = None,
                            eps: float = 0.008, weight: float = 2.0,
                            max_iters: int = 5, return_rounds: bool = False):
    """Iterative push-out with Laplacian-regularised least squares.

    Full parity with reference `remove_interpenetration_fast`
    (`post_processing.py:179-228`) iterated by the caller's <=5-round loop
    (`post_processing.py:314-317`): exact nearest-SURFACE-point + region
    normal per garment vertex, inside test sign(<v - nearest, n>) <= -1e-6,
    push-out direction (nearest - v) flipped by the sign of <garment vertex
    normal, body normal> (when `garment_faces` is given; the reference
    always has the mesh), target = nearest + eps * unit(dir) with the
    0.0001 norm guard, full-size identity data term with weight `ww`=2 on
    inside rows and 1 elsewhere, L = I - rownorm(adj), and the normal
    equations solve (A^T A) x = A^T b with A = [L ; I].

    garment_v: (Vg, 3), body_v: (Vb, 3), body_faces: (F, 3), adj: (Vg, Vg)
    garment adjacency. With `return_rounds` also returns the number of
    solve rounds executed.
    """
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    v = np.asarray(garment_v, np.float64)
    L = _lsq_laplacian_csr(adj)
    Vg = v.shape[0]

    rounds = 0
    for _ in range(max_iters):
        nearest, normals = nearest_surface_points(v, body_v, body_faces)
        direction = np.sign(np.sum((v - nearest) * normals, axis=-1))
        indices = np.where(direction <= -1e-6)[0]
        if len(indices) < 1:
            break

        if garment_faces is not None:
            gvn = np.asarray(ops.vertex_normals(
                jnp.asarray(v[None], jnp.float32),
                np.asarray(garment_faces, np.int32))[0], np.float64)
            nds = np.sign(np.sum(gvn * normals, axis=-1))[:, None]
        else:
            nds = np.ones((Vg, 1))
        pent = (nearest[indices] - v[indices]) * nds[indices]
        pent = nearest[indices] + eps * pent / np.expand_dims(
            0.0001 + np.linalg.norm(pent, axis=1), 1)
        tgt = v.copy()
        tgt[indices] = weight * pent

        data = np.ones(Vg)
        data[indices] *= weight
        rc = np.arange(Vg)
        I = sp.csr_matrix((data, (rc, rc)), shape=(Vg, Vg))
        A = sp.vstack([L, I]).tocsr()
        b = np.vstack([L @ v, tgt])
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
                  norm_adj: np.ndarray, smooth_iters: int = 100,
                  garment_faces: Optional[np.ndarray] = None) -> np.ndarray:
    """Full per-frame post-process: smooth then de-penetrate
    (reference `process_single_frame` path, `post_processing.py:300-317`)."""
    smoothed = np.asarray(laplacian_smooth(
        jnp.asarray(garment_v[None], jnp.float32), jnp.asarray(norm_adj),
        iters=smooth_iters))[0]
    return remove_interpenetration(smoothed, body_v, body_faces, adj,
                                   garment_faces=garment_faces)
