"""Parity test: lbs_garment_interpolation vs a literal numpy oracle.

The oracle implements the reference equations exactly as written
(`modules/mesh_encoder.py:312-410`): per-frame weight gathers, the literal
100-iteration sparse smoothing loop, inverse-then-forward skinning. Our
implementation replaces the loop with a precomputed matrix power and hoists
the frame-constant gathers to per-sequence - this test proves those refactors
are numerically equivalent.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from garment4d_tpu import smpl
from garment4d_tpu.models import GarmentAssets
from garment4d_tpu.models.skinning import lbs_garment_interpolation
from garment4d_tpu.ops import build_mesh_adjacency, row_normalize

from test_smpl import np_forward_kinematics


def np_rodrigues(rv):
    return Rotation.from_rotvec(rv + 1e-8 * 0).as_matrix()  # rv != 0 in test


def oracle(pred_garment, tpose_v, tpose_root, zeropose_v, pose, J_reg, W_lbs,
           parents, adj, K):
    """Literal reference math (float64)."""
    B, Vg, _ = pred_garment.shape
    T = pose.shape[1]
    J = 24
    norm_adj = row_normalize(adj).astype(np.float64)

    root_garment = pred_garment + tpose_root[:, None, :]
    posed_out = np.zeros((B, T, Vg, 3))
    unposed_out = np.zeros((B, Vg, 3))

    for b in range(B):
        d2 = ((root_garment[b][:, None] - tpose_v[b][None]) ** 2).sum(-1)
        order = np.argsort(d2, axis=1, kind="stable")
        K64 = min(64, K)
        idxk, dk = order[:, :K], np.take_along_axis(d2, order[:, :K], 1)
        idx64, d64 = order[:, :K64], np.take_along_axis(d2, order[:, :K64], 1)

        # ---- un-pose with the fixed template pose ----
        inv_pose = np.zeros((J, 3))
        inv_pose[0, 0] = -np.pi / 2
        inv_pose[1, 1] = 0.15
        inv_pose[2, 1] = -0.15
        inv_rots = np_rodrigues(inv_pose)
        inv_J = J_reg[b, 0] @ tpose_v[b]  # (J, 3)
        _, inv_A = np_forward_kinematics(inv_rots, inv_J, parents)

        def interp_w(d):
            w = 1.0 / d
            w[np.isinf(w)] = 0
            w = w / w.sum(1, keepdims=True)
            w[np.isinf(w)] = 0
            return w

        w64 = interp_w(d64)[:, :, None]
        inv_nn_W = (W_lbs[b, 0][idx64] * w64).sum(1)  # (Vg, J)
        inv_T = np.einsum("vj,jpq->vpq", inv_nn_W, inv_A)
        unposed = np.einsum("vpq,vq->vp", inv_T[:, :3, :3], root_garment[b]) \
            + inv_T[:, :3, 3]
        unposed_out[b] = unposed

        wk = interp_w(dk)[:, :, None]
        for t in range(T):
            rots = np_rodrigues(pose[b, t].reshape(J, 3))
            Jpos = J_reg[b, t] @ zeropose_v[b, t]
            _, A = np_forward_kinematics(rots, Jpos, parents)
            nn_W = (W_lbs[b, t][idxk] * wk).sum(1)  # (Vg, J)
            if K > 1:
                m = norm_adj - np.eye(Vg)
                for _ in range(100):  # literal reference loop
                    nn_W = nn_W + 0.1 * (m @ nn_W)
            T_mat = np.einsum("vj,jpq->vpq", nn_W, A)
            posed_out[b, t] = np.einsum(
                "vpq,vq->vp", T_mat[:, :3, :3], unposed) + T_mat[:, :3, 3]
    return posed_out, unposed_out


class TestLbsInterpolationParity:
    @pytest.mark.parametrize("K", [4, 1])
    def test_matches_reference_oracle(self, rng, K):
        assets = GarmentAssets.synthetic(num_rings=4, ring_size=6)  # Vg=24
        Vg = assets.num_verts
        body = smpl.synthetic_smpl(num_verts=60)
        B, T, Vb, J = 1, 2, 60, 24

        pred_garment = (assets.template_v[None]
                        + rng.randn(B, Vg, 3) * 0.01).astype(np.float32)
        tpose_v = rng.randn(B, Vb, 3).astype(np.float32)
        tpose_root = rng.randn(B, 3).astype(np.float32) * 0.1
        zeropose_v = rng.randn(B, T, Vb, 3).astype(np.float32)
        pose = (rng.randn(B, T, 72) * 0.2).astype(np.float32)
        J_reg = np.broadcast_to(
            np.asarray(body.J_regressor)[None, None], (B, T, J, Vb)).copy()
        W_lbs = np.broadcast_to(
            np.asarray(body.lbs_weights)[None, None], (B, T, Vb, J)).copy()

        adj = build_mesh_adjacency(assets.faces, Vg)
        want_posed, want_unposed = oracle(
            pred_garment.astype(np.float64), tpose_v.astype(np.float64),
            tpose_root.astype(np.float64), zeropose_v.astype(np.float64),
            pose.astype(np.float64), J_reg.astype(np.float64),
            W_lbs.astype(np.float64), body.parents, adj, K)

        got = lbs_garment_interpolation(
            jnp.asarray(pred_garment), jnp.asarray(tpose_v),
            jnp.asarray(tpose_root), jnp.asarray(zeropose_v),
            jnp.asarray(pose), jnp.asarray(J_reg), jnp.asarray(W_lbs),
            parents=body.parents,
            smooth_op=jnp.asarray(assets.smooth_op), K=K)

        np.testing.assert_allclose(
            np.asarray(got.unposed_garment[:, 0]), want_unposed,
            rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(got.posed_garment), want_posed, rtol=1e-3, atol=2e-4)
