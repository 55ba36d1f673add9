"""Mesh-graph operators: adjacency construction, normalisation, dense apply.

The reference keeps the garment mesh graph as a scipy/torch sparse matrix and
multiplies via `torch.spmm` (`modules/pygcn/layers.py:44-46`,
`modules/mesh_encoder.py:288-307,384-391`). Garment templates have a few
thousand vertices, so on TPU a dense V x V matrix is both simpler and faster:
every graph multiply becomes one MXU matmul.

The 100-step skinning-weight diffusion loop of the reference
(`mesh_encoder.py:384-391`, `W += 0.1 * (norm_adj - I) @ W` repeated 100x) is
a *fixed linear operator* per template: it equals `M^100 @ W` with
`M = I + 0.1 * (norm_adj - I)`. We precompute `M^100` once (7 squarings) and
apply a single matmul per batch - identical semantics, ~100x fewer FLOPs on
the hot path.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def build_mesh_adjacency(faces, num_vertices: int) -> np.ndarray:
    """Symmetric adjacency from (quad or tri) faces, as dense float32.

    Replicates the reference construction bit-for-bit
    (`mesh_encoder.py:288-305`): the edge buffer has 4 slots per face and is
    zero-initialised, so (a) duplicate directed edges SUM when the coo matrix
    is built (entries can exceed 1 on non-manifold/inconsistently-wound
    meshes), and (b) a triangle face leaves slot `i*4+2` untouched, inserting
    a spurious (0, 0) entry. Both quirks shift the row normalisation of the
    GCN propagation matrix on real templates, so they are reproduced here
    rather than cleaned up; on the quad-only, consistently-wound CLOTH3D
    templates the result is the clean binary matrix. Symmetrisation is
    elementwise max(A, A^T) (the reference's add/multiply dance,
    `mesh_encoder.py:305`, equals max for non-negative matrices).
    """
    adj = np.zeros((num_vertices, num_vertices), dtype=np.float32)
    for f in faces:
        f = list(f)
        if len(f) == 4:
            pairs = [(f[0], f[1]), (f[1], f[2]), (f[2], f[3]), (f[3], f[0])]
        elif len(f) == 3:
            # slot i*4+2 keeps its [0, 0] zero-initialisation in the reference
            pairs = [(f[0], f[1]), (f[1], f[2]), (0, 0), (f[2], f[0])]
        else:
            raise NotImplementedError(f"face of degree {len(f)}")
        for a, b in pairs:
            adj[a, b] += 1.0  # coo_matrix sums duplicates
    return np.maximum(adj, adj.T)


def row_normalize(adj: np.ndarray) -> np.ndarray:
    """D^-1 A row normalisation (reference `modules/pygcn/utils.py:57-64`)."""
    rowsum = adj.sum(axis=1)
    inv = np.where(rowsum > 0, 1.0 / np.where(rowsum > 0, rowsum, 1.0), 0.0)
    return (adj * inv[:, None]).astype(np.float32)


def gcn_adjacency(adj: np.ndarray) -> np.ndarray:
    """Row-normalised (A + I), the GCN propagation matrix
    (reference `mesh_encoder.py:306`)."""
    return row_normalize(adj + np.eye(adj.shape[0], dtype=np.float32))


def laplacian_adjacency(adj: np.ndarray) -> np.ndarray:
    """I - D^-1 A, the uniform graph Laplacian used by the posed-stage
    regulariser (reference `mesh_encoder.py:418-419`)."""
    return (np.eye(adj.shape[0], dtype=np.float32) - row_normalize(adj)).astype(np.float32)


def smoothing_operator(adj: np.ndarray, coeff: float = 0.1, iters: int = 100) -> np.ndarray:
    """(I + coeff * (D^-1 A - I))^iters as a dense matrix.

    Equivalent (same linear map) to the reference's 100-iteration sparse-mm
    loop (`mesh_encoder.py:384-391`); computed once per template via repeated
    squaring in float64 for accuracy, returned as float32.
    """
    n = adj.shape[0]
    m = np.eye(n, dtype=np.float64) + coeff * (row_normalize(adj).astype(np.float64) - np.eye(n))
    result = np.eye(n, dtype=np.float64)
    base = m
    k = iters
    while k > 0:
        if k & 1:
            result = result @ base
        base = base @ base
        k >>= 1
    return result.astype(np.float32)


def graph_matmul(adj: jax.Array, x: jax.Array) -> jax.Array:
    """adj: (V, V), x: (..., V, C) -> (..., V, C); one MXU matmul."""
    return jnp.einsum("vw,...wc->...vc", adj, x,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
