"""SMPL body model library (reference `smplx/smplx/`, SURVEY.md 2.3)."""

from garment4d_tpu.smpl.lbs import (
    batch_rigid_transform,
    batch_rodrigues,
    blend_shapes,
    lbs,
    skin_vertices,
    transform_mat,
    vertices2joints,
    vertices2joints_b,
)
from garment4d_tpu.smpl.model import (
    NUM_BETAS,
    NUM_BODY_VERTS,
    NUM_JOINTS,
    SmplModel,
    load_smpl,
    load_smpl_npz,
    load_smpl_pickle,
    synthetic_smpl,
)

__all__ = [
    "batch_rigid_transform",
    "batch_rodrigues",
    "blend_shapes",
    "lbs",
    "skin_vertices",
    "transform_mat",
    "vertices2joints",
    "vertices2joints_b",
    "NUM_BETAS",
    "NUM_BODY_VERTS",
    "NUM_JOINTS",
    "SmplModel",
    "load_smpl",
    "load_smpl_npz",
    "load_smpl_pickle",
    "synthetic_smpl",
]
