"""SMPL joint metadata + extra-joint selection.

Equivalent of the reference's `smplx/smplx/joint_names.py` /
`vertex_joint_selector.py` / `vertex_ids.py` (SURVEY.md 2.3): joint-name
constants for the 24 SMPL joints and the vertex-id based extra-joint picker
(face/hand/feet keypoints appended from mesh vertices).
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax
import jax.numpy as jnp

SMPL_JOINT_NAMES = (
    "pelvis", "left_hip", "right_hip", "spine1", "left_knee", "right_knee",
    "spine2", "left_ankle", "right_ankle", "spine3", "left_foot",
    "right_foot", "neck", "left_collar", "right_collar", "head",
    "left_shoulder", "right_shoulder", "left_elbow", "right_elbow",
    "left_wrist", "right_wrist", "left_hand", "right_hand",
)

# standard SMPL-topology keypoint vertex ids (public smplx vertex_ids table)
SMPL_VERTEX_IDS: Dict[str, int] = {
    "nose": 332,
    "reye": 6260,
    "leye": 2800,
    "rear": 4071,
    "lear": 583,
    "rthumb": 6191,
    "rindex": 5782,
    "rmiddle": 5905,
    "rring": 6016,
    "rpinky": 6133,
    "lthumb": 2746,
    "lindex": 2319,
    "lmiddle": 2445,
    "lring": 2556,
    "lpinky": 2673,
    "LBigToe": 3216,
    "LSmallToe": 3226,
    "LHeel": 3387,
    "RBigToe": 6617,
    "RSmallToe": 6624,
    "RHeel": 6787,
}


def joint_index(name: str) -> int:
    return SMPL_JOINT_NAMES.index(name)


def select_extra_joints(vertices: jax.Array,
                        vertex_ids: Sequence[int]) -> jax.Array:
    """Pick keypoint 'joints' from mesh vertices (reference
    `vertex_joint_selector.py`): vertices (B, V, 3) -> (B, len(ids), 3)."""
    ids = jnp.asarray(list(vertex_ids), jnp.int32)
    return vertices[:, ids, :]


def joints_with_extras(joints: jax.Array, vertices: jax.Array,
                       vertex_ids: Dict[str, int] = SMPL_VERTEX_IDS) -> jax.Array:
    """Append vertex-derived keypoints to the regressed joints, matching the
    reference's joint layout (joints then extra keypoints)."""
    extra = select_extra_joints(vertices, list(vertex_ids.values()))
    return jnp.concatenate([joints, extra], axis=1)
