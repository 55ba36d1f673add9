"""Linear blend skinning math as batched einsums.

Functional JAX re-derivation of the SMPL LBS pipeline (behavioural parity with
reference `smplx/smplx/lbs.py:152-419`): blend shapes, joint regression,
Rodrigues rotations, kinematic-chain rigid transforms and per-vertex skinning.
The 24-joint kinematic chain is a static unrolled matmul chain (the tree depth
is tiny and fully known at trace time - no scan bookkeeping needed).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

import jax
import jax.numpy as jnp

Array = jax.Array

_MM = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


def batch_rodrigues(rot_vecs: Array, epsilon: float = 1e-8) -> Array:
    """Axis-angle (..., 3) -> rotation matrices (..., 3, 3).

    Parity with reference `lbs.py:312-346` including the `+1e-8` inside the
    norm (guards the zero-pose singularity).
    """
    shape = rot_vecs.shape[:-1]
    rv = rot_vecs.reshape(-1, 3)
    angle = jnp.linalg.norm(rv + epsilon, axis=1, keepdims=True)  # (N, 1)
    rot_dir = rv / angle
    cos = jnp.cos(angle)[:, :, None]  # (N, 1, 1)
    sin = jnp.sin(angle)[:, :, None]
    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)
    ident = jnp.eye(3, dtype=rv.dtype)
    rot = ident + sin * K + (1.0 - cos) * jnp.einsum("nij,njk->nik", K, K, **_MM)
    return rot.reshape(*shape, 3, 3)


def transform_mat(R: Array, t: Array) -> Array:
    """R: (..., 3, 3), t: (..., 3) -> homogeneous (..., 4, 4)."""
    shape = R.shape[:-2]
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], R.dtype), (*shape, 1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def batch_rigid_transform(rot_mats: Array, joints: Array,
                          parents: np.ndarray) -> Tuple[Array, Array]:
    """Forward kinematics over the joint tree.

    rot_mats: (B, J, 3, 3), joints: (B, J, 3), parents: static (J,) int array
    -> (posed_joints (B, J, 3), rel_transforms (B, J, 4, 4)).

    Parity with reference `lbs.py:362-419`; the python loop over the chain is
    unrolled at trace time into J-1 batched 4x4 matmuls.
    """
    parents = np.asarray(parents)
    J = parents.shape[0]
    rel_joints = joints.at[:, 1:].add(-joints[:, parents[1:]])
    transforms_mat = transform_mat(rot_mats, rel_joints)  # (B, J, 4, 4)

    chain = [transforms_mat[:, 0]]
    for i in range(1, J):
        chain.append(jnp.einsum("bij,bjk->bik", chain[parents[i]],
                                transforms_mat[:, i], **_MM))
    transforms = jnp.stack(chain, axis=1)  # (B, J, 4, 4)

    posed_joints = transforms[:, :, :3, 3]
    # rel = T - [0 | T @ [j;0]] : subtract the rest-pose joint location.
    # T[..., :3] @ j = [R@j ; 0] since the bottom row of T is (0,0,0,1).
    tj = jnp.einsum("bjik,bjk->bji", transforms[:, :, :, :3], joints, **_MM)
    correction = jnp.zeros_like(transforms).at[:, :, :, 3].set(tj)
    rel_transforms = transforms - correction
    return posed_joints, rel_transforms


def vertices2joints(J_regressor: Array, vertices: Array) -> Array:
    """J_regressor: (J, V), vertices: (B, V, 3) -> (B, J, 3)
    (reference `lbs.py:251-268`)."""
    return jnp.einsum("bvc,jv->bjc", vertices, J_regressor, **_MM)


def vertices2joints_b(J_regressor_b: Array, vertices: Array) -> Array:
    """Batched-regressor variant (B, J, V) x (B, V, 3) -> (B, J, 3)
    (reference `lbs.py:270-286`, added by Garment4D)."""
    return jnp.einsum("bvc,bjv->bjc", vertices, J_regressor_b, **_MM)


def blend_shapes(betas: Array, shape_disps: Array) -> Array:
    """betas: (B, nb), shape_disps: (V, 3, nb) -> (B, V, 3)
    (reference `lbs.py:288-309`)."""
    return jnp.einsum("bl,mkl->bmk", betas, shape_disps, **_MM)


def skin_vertices(W: Array, A: Array, v_posed: Array) -> Array:
    """Apply weighted joint transforms to vertices.

    W: (B, V, J) skinning weights, A: (B, J, 4, 4) relative transforms,
    v_posed: (B, V, 3) -> (B, V, 3). Reference `lbs.py:233-246`.
    """
    B, V, J = W.shape
    T = jnp.einsum("bvj,bjpq->bvpq", W, A, **_MM)  # (B, V, 4, 4)
    v = jnp.einsum("bvpq,bvq->bvp", T[:, :, :3, :3], v_posed, **_MM) + T[:, :, :3, 3]
    return v


def lbs(betas: Array, pose: Array, v_template: Array, shapedirs: Array,
        posedirs: Array, J_regressor: Array, parents: np.ndarray,
        lbs_weights: Array, pose2rot: bool = True) -> Tuple[Array, Array]:
    """Full SMPL linear blend skinning (reference `lbs.py:152-248`).

    betas: (B, 10); pose: (B, J*3) axis-angle or (B, J, 3, 3) rotmats;
    returns (vertices (B, V, 3), joints (B, J, 3)).
    """
    B = max(betas.shape[0], pose.shape[0])
    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    J = vertices2joints(J_regressor, v_shaped)

    if pose2rot:
        rot_mats = batch_rodrigues(pose.reshape(B, -1, 3))
    else:
        rot_mats = pose.reshape(B, -1, 3, 3)

    ident = jnp.eye(3, dtype=v_shaped.dtype)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)  # (B, (J-1)*9)
    pose_offsets = jnp.einsum("bp,pv->bv", pose_feature, posedirs,
                              **_MM).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    J_transformed, A = batch_rigid_transform(rot_mats, J, parents)
    W = jnp.broadcast_to(lbs_weights[None], (B, *lbs_weights.shape))
    verts = skin_vertices(W, A, v_posed)
    return verts, J_transformed
