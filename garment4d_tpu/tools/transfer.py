"""Deformation transfer between body-model topologies.

Covers the reference's `smplx/transfer_model` setup half (SURVEY.md 2.3,
`transfer_model/__main__.py:36-100`, `transfer_model/transfer_model.py:257+`):
the reference APPLIES a precomputed deformation-transfer matrix
(`def_matrix` pickle) mapping source-topology vertices onto the target
topology, then runs masked, staged LBFGS fitting. Here both halves exist:

* `surface_correspondence` BUILDS the transfer matrix from scratch: every
  target vertex is projected onto its nearest point of the source surface
  (exact point-to-triangle projection, not nearest-vertex) and encoded as
  barycentric weights of that face - the construction behind the shipped
  def_matrix files.
* `apply_deformation_transfer` applies a (Vd, Vs) matrix (dense or the
  (idx, w) barycentric form) to source vertices.
* `fit_smpl_staged` mirrors the reference's optimisation schedule
  (`transfer_model.py:257+`): stage 1 fits global orientation+translation
  on an edge-preserving loss, stage 2 frees the body pose, stage 3 frees
  shape - each a jitted LBFGS loop.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from garment4d_tpu.smpl import SmplModel
from garment4d_tpu.tools.fit_body import FitResult, fit_smpl_to_vertices

Array = jax.Array


def _project_points_to_triangles(points: np.ndarray, tri_v: np.ndarray):
    """Exact closest point of each point to each triangle.

    points: (P, 3), tri_v: (F, 3, 3) -> (dist2 (P, F), bary (P, F, 3)).
    Standard region-based point-triangle projection (clamped barycentric).
    """
    a, b, c = tri_v[:, 0], tri_v[:, 1], tri_v[:, 2]  # (F, 3)
    ab = b - a
    ac = c - a
    p = points[:, None, :]  # (P, 1, 3)
    ap = p - a[None]
    d1 = np.einsum("fk,pfk->pf", ab, ap)
    d2 = np.einsum("fk,pfk->pf", ac, ap)
    bp = p - b[None]
    d3 = np.einsum("fk,pfk->pf", ab, bp)
    d4 = np.einsum("fk,pfk->pf", ac, bp)
    cp = p - c[None]
    d5 = np.einsum("fk,pfk->pf", ab, cp)
    d6 = np.einsum("fk,pfk->pf", ac, cp)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = np.maximum(va + vb + vc, 1e-20)
    v = vb / denom
    w = vc / denom

    # interior case first, then clamp to edges/vertices region by region
    u_ = 1.0 - v - w
    bary = np.stack([u_, v, w], axis=-1)

    # vertex regions
    vert_a = (d1 <= 0) & (d2 <= 0)
    vert_b = (d3 >= 0) & (d4 <= d3)
    vert_c = (d6 >= 0) & (d5 <= d6)
    # edge regions
    t_ab = np.divide(d1, np.maximum(d1 - d3, 1e-20))
    edge_ab = (~vert_a) & (~vert_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    t_ac = np.divide(d2, np.maximum(d2 - d6, 1e-20))
    edge_ac = (~vert_a) & (~vert_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    t_bc = np.divide(d4 - d3, np.maximum((d4 - d3) + (d5 - d6), 1e-20))
    edge_bc = (~vert_b) & (~vert_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)

    bary = np.where(edge_bc[..., None],
                    np.stack([np.zeros_like(t_bc), 1 - t_bc, t_bc], -1), bary)
    bary = np.where(edge_ac[..., None],
                    np.stack([1 - t_ac, np.zeros_like(t_ac), t_ac], -1), bary)
    bary = np.where(edge_ab[..., None],
                    np.stack([1 - t_ab, t_ab, np.zeros_like(t_ab)], -1), bary)
    bary = np.where(vert_c[..., None],
                    np.array([0.0, 0.0, 1.0])[None, None], bary)
    bary = np.where(vert_b[..., None],
                    np.array([0.0, 1.0, 0.0])[None, None], bary)
    bary = np.where(vert_a[..., None],
                    np.array([1.0, 0.0, 0.0])[None, None], bary)
    bary = np.clip(bary, 0.0, 1.0)
    bary = bary / np.maximum(bary.sum(-1, keepdims=True), 1e-20)

    closest = np.einsum("pfk,fkd->pfd",
                        bary, tri_v)  # (P, F, 3)
    dist2 = np.sum((points[:, None, :] - closest) ** 2, axis=-1)
    return dist2, bary


def surface_correspondence(src_verts: np.ndarray, src_faces: np.ndarray,
                           dst_verts: np.ndarray, chunk: int = 512):
    """Nearest-point-on-surface barycentric correspondence.

    Returns (face_idx (Vd,), bary (Vd, 3) float64, vert_idx (Vd, 3)) such
    that dst[i] ~= sum_k bary[i, k] * src[vert_idx[i, k]]. This is the
    construction of the reference's shipped def_matrix files (which the
    repo only applies; the build lived offline). `bary` stays float64:
    the de-penetration path (data/postprocess.py) classifies boundary
    vertices at ~1e-6 tolerances against an f64 AABB-tree reference, and
    an f32 round-trip here perturbs the nearest point by ~1e-7 * scale -
    enough to flip sub-tolerance inside/outside calls. Consumers that
    want f32 (the def-matrix fill) cast at assignment."""
    faces = np.asarray(src_faces, np.int64)
    tri_v = np.asarray(src_verts, np.float64)[faces]  # (F, 3, 3)
    dst = np.asarray(dst_verts, np.float64)
    face_idx = np.empty(len(dst), np.int64)
    bary = np.empty((len(dst), 3), np.float64)
    for i in range(0, len(dst), chunk):
        d2, b = _project_points_to_triangles(dst[i:i + chunk], tri_v)
        fi = np.argmin(d2, axis=1)
        face_idx[i:i + chunk] = fi
        bary[i:i + chunk] = b[np.arange(len(fi)), fi]
    return face_idx, bary, faces[face_idx]


def deformation_transfer_matrix(src_verts: np.ndarray, src_faces: np.ndarray,
                                dst_verts: np.ndarray) -> np.ndarray:
    """Dense (Vd, Vs) transfer matrix M with dst ~= M @ src (the reference's
    def_matrix form, applied at `transfer_model.py:
    apply_deformation_transfer`)."""
    _, bary, vidx = surface_correspondence(src_verts, src_faces, dst_verts)
    Vd, Vs = len(dst_verts), len(src_verts)
    M = np.zeros((Vd, Vs), np.float32)
    rows = np.repeat(np.arange(Vd), 3)
    M[rows, vidx.reshape(-1)] += bary.reshape(-1)
    return M


def apply_deformation_transfer(def_matrix: np.ndarray,
                               src_verts: Array) -> Array:
    """def_matrix (Vd, Vs), src_verts (B, Vs, 3) -> (B, Vd, 3)."""
    return jnp.einsum("dv,bvk->bdk", jnp.asarray(def_matrix),
                      jnp.asarray(src_verts))


def fit_smpl_staged(
    model: SmplModel,
    target_verts: Array,                      # (B, V, 3) in model topology
    vertex_mask: Optional[np.ndarray] = None,
    iters: Tuple[int, int, int] = (60, 120, 120),
    init: Optional[Dict[str, Array]] = None,
) -> FitResult:
    """The reference's staged schedule (`transfer_model.py:257+`): global
    orientation+translation first, then pose, then shape. Each stage reuses
    the jitted LBFGS fit with the not-yet-freed parameter groups pinned via
    zero iterations of their gradient (implemented by passing the previous
    stage's result as init and masking regs)."""
    B = target_verts.shape[0]
    stage1 = fit_smpl_to_vertices(
        model, target_verts, vertex_mask=vertex_mask, iters=iters[0],
        pose_reg=1e6,   # huge regulariser pins body pose at zero: only the
        shape_reg=1e6,  # root orient (unregularised, pose[:3]) + transl move
        init=init)
    stage2 = fit_smpl_to_vertices(
        model, target_verts, vertex_mask=vertex_mask, iters=iters[1],
        pose_reg=1e-3, shape_reg=1e6,
        init={"betas": stage1.betas, "pose": stage1.pose,
              "transl": stage1.transl})
    stage3 = fit_smpl_to_vertices(
        model, target_verts, vertex_mask=vertex_mask, iters=iters[2],
        pose_reg=1e-3, shape_reg=1e-3,
        init={"betas": stage2.betas, "pose": stage2.pose,
              "transl": stage2.transl})
    return stage3
