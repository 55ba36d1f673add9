"""Synthetic mini-CLOTH3D batches for tests and benchmarks.

Produces the same 16-key batch the real data pipeline yields (reference
`utils/dataloader.py:262-294`, SURVEY.md 2.5) from a synthetic SMPL body and
a synthetic garment template, with the three per-frame SMPL forwards (posed /
"T-pose" / zero-pose) run vectorised on device.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

import jax
import jax.numpy as jnp

from garment4d_tpu.models.assets import GarmentAssets
from garment4d_tpu.smpl import SmplModel, batch_rodrigues
from garment4d_tpu.utils.relay import call_with_retry

Array = jax.Array

# the fixed "template pose" of the dataset (reference `dataloader.py:193-197`):
# root x-rot +pi/2, hips z +/-0.15
def template_pose(batch: int) -> Array:
    pose = jnp.zeros((batch, 24, 3))
    pose = pose.at[:, 0, 0].set(np.pi / 2)
    pose = pose.at[:, 1, 2].set(0.15)
    pose = pose.at[:, 2, 2].set(-0.15)
    return pose.reshape(batch, 72)


@jax.jit
def smpl_triple_forward(model: SmplModel, pose: Array, betas: Array):
    """Run the 3 SMPL forwards of the data pipeline (posed / T-pose / zero)
    batched on device (replaces the per-item CPU calls of reference
    `dataloader.py:186-214`).

    pose: (B, T, 72), betas: (B, T, 10) ->
    dict with posed vertices/joints (B,T,V,3)/(B,T,3), tpose & zeropose
    vertices (B,V,3)/(B,T,V,3) and tpose root joints (B,3).
    """
    B, T, _ = pose.shape
    flat_pose = pose.reshape(B * T, 72)
    flat_betas = betas.reshape(B * T, -1)

    posed_v, posed_j = model.forward_axis_angle(flat_betas, flat_pose)
    tpose_v, tpose_j = model.forward_axis_angle(betas[:, 0], template_pose(B))
    zero_v, _ = model.forward_axis_angle(flat_betas, jnp.zeros((B * T, 72)))

    V = posed_v.shape[1]
    return dict(
        smpl_vertices=posed_v.reshape(B, T, V, 3),
        smpl_root_joints=posed_j[:, 0, :].reshape(B, T, 3),
        tpose_smpl_vertices=tpose_v,
        tpose_smpl_root_joints=tpose_j[:, 0, :],
        zeropose_smpl_vertices=zero_v.reshape(B, T, V, 3),
    )


def make_batch(assets: GarmentAssets, model: SmplModel, *, batch_size: int = 1,
               T: int = 3, npoints: int = 2048, seed: int = 0) -> Dict[str, Array]:
    """A full synthetic training batch with the data-pipeline keys."""
    rng = np.random.RandomState(seed)
    B = batch_size
    Vg = assets.num_verts
    Vb = model.num_verts

    pose = jnp.asarray(rng.randn(B, T, 72).astype(np.float32) * 0.1)
    betas = jnp.asarray(
        np.broadcast_to(rng.randn(B, 1, 10).astype(np.float32) * 0.5, (B, T, 10)).copy())

    # dispatch + host-fetch the SMPL forwards under retry: a transient relay
    # failure here killed the round-2 driver bench (BENCH_r02.json); the
    # thunk re-dispatches from host inputs so a poisoned buffer is replaced
    def _body_and_host():
        out = smpl_triple_forward(model, pose, betas)
        return (out, np.asarray(out["smpl_vertices"]),
                np.asarray(out["smpl_root_joints"]))

    body, body_v, root = call_with_retry(
        _body_and_host, label="synthetic SMPL forwards")

    # garment GT: template + per-frame smooth noise, root-relative
    template = assets.template_v  # (Vg, 3)
    garment = template[None, None] + rng.randn(B, T, Vg, 3).astype(np.float32) * 0.01

    # point cloud: body verts + garment points near the posed body
    n_body = npoints - npoints // 2
    n_gar = npoints // 2
    pcd = np.zeros((B, T, npoints, 3), np.float32)
    labels = np.zeros((B, T, npoints), np.int32)
    for b in range(B):
        for t in range(T):
            bsel = rng.randint(0, Vb, size=n_body)
            gsel = rng.randint(0, Vg, size=n_gar)
            pts_b = body_v[b, t, bsel]
            pts_g = garment[b, t, gsel] + root[b, t]
            pts = np.concatenate([pts_b, pts_g], 0)
            lab = np.concatenate([
                np.zeros(n_body, np.int32),               # Body -> 0
                np.full(n_gar, assets.label, np.int32)])  # garment class
            perm = rng.permutation(npoints)
            pcd[b, t] = pts[perm]
            labels[b, t] = lab[perm]

    J = model.J_regressor.shape[0]
    return dict(
        pose=pose,
        beta=betas,
        pcd=jnp.asarray(pcd),
        pcd_label=jnp.asarray(labels),
        garment=jnp.asarray(garment),
        garment_template_vertices=jnp.asarray(
            np.broadcast_to(template[None], (B, Vg, 3)).copy()),
        pca_coeff=jnp.asarray(rng.randn(B, assets.pca_dim).astype(np.float32)),
        J_regressor=jnp.broadcast_to(
            jnp.asarray(model.J_regressor)[None, None], (B, T, J, Vb)),
        lbs_weights=jnp.broadcast_to(
            jnp.asarray(model.lbs_weights)[None, None], (B, T, Vb, J)),
        **body,
    )
