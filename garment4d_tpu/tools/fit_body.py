"""Body-model fitting: recover SMPL parameters for a target mesh / scan.

TPU-native equivalent of the reference's vendored `smplx/transfer_model`
tool (SURVEY.md 2.3: deformation transfer + LBFGS fitting,
`transfer_model/__main__.py:36-100`, `transfer_model.py:257+`): given target
vertices (e.g. an SMPL-X export, a registered scan, or another body model's
output mapped through a vertex correspondence), optimize (betas, pose,
translation) of our SMPL model to fit them.

Differences from the reference: the whole optimization is one jitted
optax.lbfgs (fallback adam) loop with `lax.while_loop`-free static iteration
count - no per-step host round-trips; correspondences between different
topologies come from `nearest_vertex_correspondence` (K-NN barycentric).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from garment4d_tpu import ops
from garment4d_tpu.smpl import SmplModel

Array = jax.Array


@dataclasses.dataclass
class FitResult:
    betas: np.ndarray      # (B, 10)
    pose: np.ndarray       # (B, 72) axis-angle
    transl: np.ndarray     # (B, 3)
    vertices: np.ndarray   # (B, V, 3) fitted model vertices
    final_loss: float


def nearest_vertex_correspondence(src_verts: np.ndarray, dst_verts: np.ndarray,
                                  K: int = 3):
    """K-NN inverse-distance barycentric map from dst topology to src.

    Returns (idx (Vd, K), weights (Vd, K)) such that
    dst ~= sum_k w[:, k] * src[idx[:, k]] - the correspondence the fitting
    objective uses when source and target topologies differ (stands in for
    the reference's deformation-transfer setup).
    """
    res = ops.knn_points(jnp.asarray(dst_verts[None], jnp.float32),
                         jnp.asarray(src_verts[None], jnp.float32), K=K)
    d = np.asarray(res.dists[0])
    idx = np.asarray(res.idx[0])
    w = 1.0 / np.maximum(d, 1e-9)
    w = w / w.sum(axis=1, keepdims=True)
    return idx, w.astype(np.float32)


def fit_smpl_to_vertices(
    model: SmplModel,
    target_verts: Array,               # (B, Vt, 3)
    correspondence: Optional[Tuple[np.ndarray, np.ndarray]] = None,
    vertex_mask: Optional[np.ndarray] = None,  # (Vt,) weight per target vert
    iters: int = 200,
    lr: float = 0.05,
    shape_reg: float = 1e-3,
    pose_reg: float = 1e-3,
    use_lbfgs: bool = True,
    init: Optional[Dict[str, Array]] = None,
) -> FitResult:
    """Optimize (betas, pose, transl) so the model matches `target_verts`."""
    target = jnp.asarray(target_verts, jnp.float32)
    B, Vt, _ = target.shape
    mask = (jnp.ones((Vt,)) if vertex_mask is None
            else jnp.asarray(vertex_mask, jnp.float32))

    if correspondence is not None:
        corr_idx = jnp.asarray(correspondence[0])
        corr_w = jnp.asarray(correspondence[1])
    else:
        corr_idx = corr_w = None

    params = {
        "betas": jnp.zeros((B, 10)),
        "pose": jnp.zeros((B, 72)),
        "transl": jnp.zeros((B, 3)),
    }
    if init:
        params.update({k: jnp.asarray(v) for k, v in init.items()})

    def model_verts(p):
        v, _ = model.forward_axis_angle(p["betas"], p["pose"])
        v = v + p["transl"][:, None, :]
        if corr_idx is not None:
            picked = v[:, corr_idx.reshape(-1), :].reshape(B, Vt, -1, 3)
            v = jnp.sum(picked * corr_w[None, :, :, None], axis=2)
        return v

    def loss_fn(p):
        v = model_verts(p)
        data = jnp.mean(mask[None, :, None] * (v - target) ** 2)
        reg = (shape_reg * jnp.mean(p["betas"] ** 2)
               + pose_reg * jnp.mean(p["pose"][:, 3:] ** 2))
        return data + reg

    if use_lbfgs:
        tx = optax.lbfgs()

        @jax.jit
        def run(p):
            state = tx.init(p)

            def body(_, carry):
                p, state = carry
                loss, grads = jax.value_and_grad(loss_fn)(p)
                updates, state = tx.update(
                    grads, state, p, value=loss, grad=grads,
                    value_fn=loss_fn)
                return optax.apply_updates(p, updates), state

            p, _ = jax.lax.fori_loop(0, iters, body, (p, state))
            return p, loss_fn(p)
    else:
        tx = optax.adam(lr)

        @jax.jit
        def run(p):
            state = tx.init(p)

            def body(_, carry):
                p, state = carry
                grads = jax.grad(loss_fn)(p)
                updates, state = tx.update(grads, state, p)
                return optax.apply_updates(p, updates), state

            p, _ = jax.lax.fori_loop(0, iters, body, (p, state))
            return p, loss_fn(p)

    fitted, final_loss = run(params)
    verts, _ = model.forward_axis_angle(fitted["betas"], fitted["pose"])
    verts = verts + fitted["transl"][:, None, :]
    return FitResult(
        betas=np.asarray(fitted["betas"]),
        pose=np.asarray(fitted["pose"]),
        transl=np.asarray(fitted["transl"]),
        vertices=np.asarray(verts),
        final_loss=float(final_loss),
    )
