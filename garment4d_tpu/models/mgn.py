"""MGN baseline variant of the posed stage.

Parity with reference `modules/mesh_encoder.py:489-614`
(PCALBSGarmentUseSegEncoderSegMGN): frozen canonical encoder, a per-frame
displacement MLP (512 -> 1024 -> 2048 -> Vg*3, scaled by 0.05) applied to the
canonical garment, then single-nearest-neighbour LBS (K=1, no interpolation,
no smoothing, no GCN refinement). Selected by the `--MGN` flag.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from garment4d_tpu.models.assets import GarmentAssets
from garment4d_tpu.models.canonical import CanonicalGarmentModel
from garment4d_tpu.models.posed import BodyInputs, PosedOutput, _SMPL_PARENTS
from garment4d_tpu.models.skinning import lbs_garment_single_nn
from garment4d_tpu.nn import MLP

Array = jax.Array


class MgnGarmentModel(nn.Module):
    """MGN baseline: displacement MLP + K=1 LBS, no refinement."""

    assets: GarmentAssets
    body_faces: object = None  # accepted for API symmetry; unused in forward
    bn_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: Array, body: BodyInputs, train: bool = False) -> PosedOutput:
        B, T, N, _ = x.shape
        Vg = self.assets.num_verts

        canonical = CanonicalGarmentModel(
            assets=self.assets, bn_axis_name=self.bn_axis_name,
            name="canonical")(x, train=False)
        canonical = jax.tree_util.tree_map(
            lambda a: jax.lax.stop_gradient(a) if isinstance(a, jax.Array) else a,
            canonical)

        # per-frame displacements from the garment summary
        # (reference `mesh_encoder.py:521-527,597-602`)
        disp = MLP((1024, 2048, Vg * 3), name="displacement")(
            canonical.garment_summary)  # (B, T, Vg*3)
        disp = disp.reshape(B, T, Vg, 3) * 0.05
        disp = jnp.where(jnp.isnan(disp), 0.0, disp)
        per_frame_garment = canonical.tpose_garment[:, None] + disp  # (B,T,Vg,3)

        lbs = lbs_garment_single_nn(
            per_frame_garment,
            body.tpose_vertices,
            body.tpose_root_joints,
            body.zeropose_vertices,
            body.pose,
            body.J_regressor,
            body.lbs_weights,
            parents=_SMPL_PARENTS,
        )

        return PosedOutput(
            canonical=canonical,
            lbs=lbs,
            iter_garment_v=(lbs.posed_garment,),
        )
