"""Tests for the SMPL body model math."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation

from garment4d_tpu import smpl


def np_forward_kinematics(rot_mats, joints, parents):
    """Numpy oracle for batch_rigid_transform (single batch element)."""
    J = len(parents)
    rel = joints.copy()
    rel[1:] -= joints[parents[1:]]
    local = np.zeros((J, 4, 4))
    for j in range(J):
        local[j, :3, :3] = rot_mats[j]
        local[j, :3, 3] = rel[j]
        local[j, 3, 3] = 1.0
    world = np.zeros_like(local)
    world[0] = local[0]
    for j in range(1, J):
        world[j] = world[parents[j]] @ local[j]
    posed = world[:, :3, 3].copy()
    relt = world.copy()
    for j in range(J):
        tj = world[j, :3, :3] @ joints[j]
        relt[j, :3, 3] -= tj
    return posed, relt


class TestRodrigues:
    def test_matches_scipy(self, rng):
        rv = rng.randn(50, 3).astype(np.float32)
        got = np.asarray(smpl.batch_rodrigues(jnp.asarray(rv)))
        want = Rotation.from_rotvec(rv).as_matrix()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_zero_pose_near_identity(self):
        rv = np.zeros((4, 3), np.float32)
        got = np.asarray(smpl.batch_rodrigues(jnp.asarray(rv)))
        np.testing.assert_allclose(got, np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)

    def test_batch_shape_preserved(self, rng):
        rv = rng.randn(2, 24, 3).astype(np.float32)
        got = smpl.batch_rodrigues(jnp.asarray(rv))
        assert got.shape == (2, 24, 3, 3)


class TestRigidTransform:
    def test_matches_numpy_oracle(self, rng):
        model = smpl.synthetic_smpl(num_verts=100)
        J = 24
        rv = rng.randn(2, J, 3).astype(np.float32) * 0.3
        rots = np.asarray(smpl.batch_rodrigues(jnp.asarray(rv)))
        joints = rng.randn(2, J, 3).astype(np.float32)
        posed, rel = smpl.batch_rigid_transform(jnp.asarray(rots), jnp.asarray(joints), model.parents)
        for b in range(2):
            want_posed, want_rel = np_forward_kinematics(rots[b], joints[b].astype(np.float64), model.parents)
            np.testing.assert_allclose(np.asarray(posed)[b], want_posed, rtol=1e-4, atol=1e-5)
            np.testing.assert_allclose(np.asarray(rel)[b], want_rel, rtol=1e-4, atol=1e-4)


class TestLbs:
    def test_zero_pose_is_shaped_template(self, rng):
        model = smpl.synthetic_smpl(num_verts=120)
        betas = jnp.asarray(rng.randn(2, 10).astype(np.float32))
        pose = jnp.zeros((2, 72))
        verts, joints = model.forward_axis_angle(betas, pose)
        v_shaped = np.asarray(model.v_template)[None] + np.einsum(
            "bl,mkl->bmk", np.asarray(betas), np.asarray(model.shapedirs))
        np.testing.assert_allclose(np.asarray(verts), v_shaped, rtol=1e-3, atol=1e-4)

    def test_root_rotation_rotates_about_root_joint(self, rng):
        model = smpl.synthetic_smpl(num_verts=150)
        betas = jnp.zeros((1, 10))
        pose = np.zeros((1, 72), np.float32)
        angle = 0.7
        pose[0, :3] = [0, 0, angle]
        v0, j0 = model.forward_axis_angle(betas, jnp.zeros((1, 72)))
        v1, _ = model.forward_axis_angle(betas, jnp.asarray(pose))
        R = Rotation.from_rotvec([0, 0, angle]).as_matrix()
        root = np.asarray(j0)[0, 0]
        want = (np.asarray(v0)[0] - root) @ R.T + root
        np.testing.assert_allclose(np.asarray(v1)[0], want, rtol=1e-3, atol=2e-4)

    def test_rotmat_and_axis_angle_agree(self, rng):
        model = smpl.synthetic_smpl(num_verts=80)
        betas = jnp.asarray(rng.randn(2, 10).astype(np.float32) * 0.5)
        pose = rng.randn(2, 72).astype(np.float32) * 0.2
        va, ja = model.forward_axis_angle(betas, jnp.asarray(pose))
        rots = smpl.batch_rodrigues(jnp.asarray(pose.reshape(2, 24, 3)))
        vb, jb = model.forward_rotmats(betas, rots)
        np.testing.assert_allclose(np.asarray(va), np.asarray(vb), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ja), np.asarray(jb), rtol=1e-4, atol=1e-5)


class TestLoader:
    def test_npz_roundtrip(self, tmp_path, rng):
        model = smpl.synthetic_smpl(num_verts=60)
        path = str(tmp_path / "model.npz")
        np.savez(path,
                 v_template=np.asarray(model.v_template),
                 shapedirs=np.asarray(model.shapedirs),
                 posedirs=np.asarray(model.posedirs),
                 J_regressor=np.asarray(model.J_regressor),
                 lbs_weights=np.asarray(model.lbs_weights),
                 parents=model.parents, faces=model.faces)
        loaded = smpl.load_smpl(path)
        np.testing.assert_array_equal(np.asarray(loaded.v_template), np.asarray(model.v_template))
        np.testing.assert_array_equal(loaded.parents, model.parents)

    def test_pickle_with_fake_chumpy(self, tmp_path, rng):
        # emulate the released SMPL pkl structure: chumpy arrays + sparse J_regressor
        import pickle
        import scipy.sparse as sp

        model = smpl.synthetic_smpl(num_verts=60)
        V = 60

        class FakeCh:
            def __init__(self, x):
                self.x = x
            def __reduce__(self):
                return (_make_fake_ch, (self.x,))

        data = {
            "v_template": np.asarray(model.v_template, np.float64),
            "shapedirs": np.asarray(model.shapedirs, np.float64),
            "posedirs": np.asarray(model.posedirs).T.reshape(V, 3, -1).astype(np.float64),
            "J_regressor": sp.csc_matrix(np.asarray(model.J_regressor, np.float64)),
            "weights": np.asarray(model.lbs_weights, np.float64),
            "kintree_table": np.stack([model.parents, np.arange(24)]),
            "f": model.faces,
        }
        path = str(tmp_path / "SMPL_TEST.pkl")
        with open(path, "wb") as f:
            pickle.dump(data, f, protocol=2)
        loaded = smpl.load_smpl_pickle(path)
        np.testing.assert_allclose(np.asarray(loaded.v_template), np.asarray(model.v_template), atol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded.posedirs), np.asarray(model.posedirs), atol=1e-6)
        np.testing.assert_allclose(np.asarray(loaded.J_regressor), np.asarray(model.J_regressor), atol=1e-6)


def _make_fake_ch(x):
    return x
