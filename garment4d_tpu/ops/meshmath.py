"""Mesh differential operators: normals and cotangent Laplacian.

Replaces the reference's CPU-library mix (openmesh vertex-face incidence +
torch_scatter, `utils/mesh_utils.py:86-134`; scipy-CSR cotangent Laplacian
rebuilt on every call, `smplx/loss/laplacian.py:199-305`) with fully
on-device segment-sum formulations over static topology.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array


def face_normals(verts: Array, faces: np.ndarray) -> Array:
    """verts: (..., V, 3), faces: (F, 3) static -> (..., F, 3) unit normals.

    Parity with reference `mesh_utils.compute_fnorms` (cross(e01, e02),
    norm clamped at 1e-6).
    """
    v0 = verts[..., faces[:, 0], :]
    v1 = verts[..., faces[:, 1], :]
    v2 = verts[..., faces[:, 2], :]
    fn = jnp.cross(v1 - v0, v2 - v0)
    norm = jnp.clip(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-6, None)
    return fn / norm


def vertex_normals(verts: Array, faces: np.ndarray) -> Array:
    """Area-agnostic vertex normals: sum of incident face normals, normalised.

    Parity with reference `mesh_utils.compute_vnorms` (openmesh incidence +
    torch_scatter -> deterministic scatter-add here). XLA's scatter handles
    this well (few updates per batch row, fused); routing it through the
    one-hot MXU scatter kernel was measured ~15 ms SLOWER per forward at
    SMPL scale - the kernel only wins on the huge grouping gradients.
    """
    V = verts.shape[-2]
    fn = face_normals(verts, faces)  # (..., F, 3)
    vn = jnp.zeros_like(verts)
    for k in range(3):
        vn = vn.at[..., faces[:, k], :].add(fn)
    norm = jnp.clip(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-6, None)
    return vn / norm


def cotangent_weights(verts: Array, faces: np.ndarray) -> Array:
    """Per-face cotangent weights for edges (23, 31, 12).

    verts: (B, V, 3), faces: (F, 3) -> (B, F, 3). Heron-area + Al-Kashi
    formulation, NaN/Inf zeroed (parity with reference
    `laplacian.py:267-305`, including the factor C = cot / (4 * A_heron2)).
    """
    v1 = verts[:, faces[:, 0], :]
    v2 = verts[:, faces[:, 1], :]
    v3 = verts[:, faces[:, 2], :]
    l1 = jnp.linalg.norm(v2 - v3, axis=-1)
    l2 = jnp.linalg.norm(v3 - v1, axis=-1)
    l3 = jnp.linalg.norm(v1 - v2, axis=-1)
    sp = (l1 + l2 + l3) * 0.5
    area2 = 2.0 * jnp.sqrt(jnp.clip(sp * (sp - l1) * (sp - l2) * (sp - l3), 0.0, None))
    cot23 = l2 ** 2 + l3 ** 2 - l1 ** 2
    cot31 = l1 ** 2 + l3 ** 2 - l2 ** 2
    cot12 = l1 ** 2 + l2 ** 2 - l3 ** 2
    C = jnp.stack([cot23, cot31, cot12], axis=-1) / area2[..., None] / 4.0
    C = jnp.where(jnp.isfinite(C), C, 0.0)
    return C


def cot_laplacian_apply(verts_for_weights: Array, x: Array,
                        faces: np.ndarray) -> Array:
    """Apply the cotangent Laplacian L(verts_for_weights) to x.

    verts_for_weights, x: (B, V, 3) -> (B, V, 3).

    L = (A + A^T) - diag(rowsum) with A[f1,f2] = cot23 etc. (reference
    `laplacian.py:199-249`); evaluated matrix-free with two scatter-adds per
    face edge. The weights are treated as constants w.r.t. autodiff (the
    reference's custom backward applies only L^T g).
    """
    C = jax.lax.stop_gradient(cotangent_weights(verts_for_weights, faces))
    rows = faces[:, [1, 2, 0]]  # (F, 3)
    cols = faces[:, [2, 0, 1]]

    def apply_one(cb, xb):
        # y = A x  (A[r,c] = w) plus transpose part, minus diagonal
        y = jnp.zeros_like(xb)
        w = cb.reshape(-1)[:, None]  # (3F, 1)
        r = rows.reshape(-1)
        c = cols.reshape(-1)
        y = y.at[r].add(w * xb[c])
        y = y.at[c].add(w * xb[r])
        diag = jnp.zeros((xb.shape[0],), xb.dtype)
        diag = diag.at[r].add(cb.reshape(-1))
        diag = diag.at[c].add(cb.reshape(-1))
        return y - diag[:, None] * xb

    return jax.vmap(apply_one)(C, x)
