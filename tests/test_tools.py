"""Tests for the body-fitting tool (transfer_model equivalent)."""

import numpy as np
import jax.numpy as jnp
import pytest

from garment4d_tpu import smpl
from garment4d_tpu.tools.fit_body import (
    fit_smpl_to_vertices,
    nearest_vertex_correspondence,
)


@pytest.fixture(scope="module")
def body_model():
    return smpl.synthetic_smpl(num_verts=250)


class TestFitBody:
    def test_recovers_known_parameters(self, body_model, rng):
        true_betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.5)
        true_pose = jnp.asarray(rng.randn(1, 72).astype(np.float32) * 0.1)
        target, _ = body_model.forward_axis_angle(true_betas, true_pose)

        res = fit_smpl_to_vertices(body_model, target, iters=150,
                                   use_lbfgs=False, lr=0.05,
                                   shape_reg=1e-5, pose_reg=1e-5)
        err = np.sqrt(((res.vertices - np.asarray(target)) ** 2).sum(-1)).mean()
        assert err < 0.02, f"fit error {err}"
        assert res.final_loss < 1e-3

    def test_lbfgs_path(self, body_model, rng):
        true_betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
        target, _ = body_model.forward_axis_angle(true_betas, jnp.zeros((1, 72)))
        res = fit_smpl_to_vertices(body_model, target, iters=50, use_lbfgs=True,
                                   shape_reg=1e-6, pose_reg=1e-6)
        err = np.sqrt(((res.vertices - np.asarray(target)) ** 2).sum(-1)).mean()
        assert err < 0.05, f"lbfgs fit error {err}"

    def test_correspondence_fit_different_topology(self, body_model, rng):
        # target mesh = subset of model vertices in a different order
        true_betas = jnp.asarray(rng.randn(1, 10).astype(np.float32) * 0.3)
        full, _ = body_model.forward_axis_angle(true_betas, jnp.zeros((1, 72)))
        sel = rng.permutation(250)[:120]
        target = np.asarray(full)[:, sel]

        rest, _ = body_model.forward_axis_angle(jnp.zeros((1, 10)), jnp.zeros((1, 72)))
        idx, w = nearest_vertex_correspondence(
            np.asarray(rest)[0], np.asarray(rest)[0][sel], K=1)
        np.testing.assert_array_equal(idx[:, 0], sel)  # exact match at K=1

        res = fit_smpl_to_vertices(body_model, jnp.asarray(target),
                                   correspondence=(idx, w), iters=150,
                                   use_lbfgs=False, lr=0.05,
                                   shape_reg=1e-6, pose_reg=1e-6)
        fitted_sel = res.vertices[:, sel]
        err = np.sqrt(((fitted_sel - target) ** 2).sum(-1)).mean()
        assert err < 0.05, f"correspondence fit error {err}"


class TestFitPca:
    def test_roundtrip_and_format(self, rng):
        from garment4d_tpu.models import GarmentAssets
        from garment4d_tpu.tools.fit_pca import (
            fit_pca_basis, inverse_transform, save_basis, transform)

        assets = GarmentAssets.synthetic(num_rings=6, ring_size=8)
        V = assets.num_verts
        S, k = 40, 16
        coeffs_true = rng.randn(S, k).astype(np.float32)
        basis_dirs = rng.randn(k, V * 3).astype(np.float32) * 0.05
        verts = (assets.template_v.reshape(-1)[None]
                 + coeffs_true @ basis_dirs).reshape(S, V, 3)

        basis = fit_pca_basis(verts, n_components=k)
        assert basis["components"].shape == (k, V * 3)
        assert basis["ss_scale"].shape == (V * 3,)

        coeff = transform(basis, verts)
        recon = inverse_transform(basis, coeff)
        err = np.abs(recon - verts).max()
        assert err < 1e-3, f"pca roundtrip err {err}"

    def test_loadable_by_assets(self, tmp_path, rng):
        from garment4d_tpu.models import GarmentAssets
        from garment4d_tpu.data.obj_io import write_obj
        from garment4d_tpu.tools.fit_pca import fit_pca_basis, save_basis

        assets = GarmentAssets.synthetic(num_rings=6, ring_size=8)
        V = assets.num_verts
        verts = assets.template_v[None] + rng.randn(30, V, 3).astype(np.float32) * 0.02
        basis = fit_pca_basis(verts, n_components=8)
        pkl = str(tmp_path / "PCABase_SS.pkl")
        save_basis(pkl, basis)
        obj = str(tmp_path / "T.obj")
        write_obj(obj, assets.template_v, assets.faces)
        loaded = GarmentAssets.from_files("Skirt", obj, pkl, pca_dim=8)
        assert loaded.pca_dim == 8
        assert loaded.num_verts == V


class TestDeformationTransfer:
    def test_point_triangle_projection_exact(self):
        """Interior, edge and vertex regions of the point-triangle
        projection against brute-force sampled minima."""
        from garment4d_tpu.tools.transfer import _project_points_to_triangles

        tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float64)
        pts = np.array([
            [0.25, 0.25, 1.0],   # above interior -> bary of foot point
            [2.0, -1.0, 0.0],    # vertex b region
            [-1.0, -1.0, 0.5],   # vertex a region
            [0.5, -2.0, 0.0],    # edge ab region
            [2.0, 2.0, 0.0],     # edge bc region
        ], np.float64)
        d2, bary = _project_points_to_triangles(pts, tri)
        # brute force over a dense barycentric grid
        u = np.linspace(0, 1, 201)
        g1, g2 = np.meshgrid(u, u)
        keep = (g1 + g2) <= 1.0
        bcs = np.stack([1 - g1[keep] - g2[keep], g1[keep], g2[keep]], -1)
        surf = bcs @ tri[0]
        brute = ((pts[:, None, :] - surf[None]) ** 2).sum(-1).min(1)
        np.testing.assert_allclose(d2[:, 0], brute, atol=1e-3)
        np.testing.assert_allclose(bary.sum(-1), 1.0, atol=1e-9)

    def test_surface_correspondence_reconstructs(self, rng=None):
        """Target = points sampled ON the source surface must reconstruct
        exactly through the transfer matrix."""
        from garment4d_tpu.tools.transfer import (
            apply_deformation_transfer,
            deformation_transfer_matrix,
        )

        rng = np.random.RandomState(0)
        src = rng.randn(40, 3).astype(np.float32)
        faces = np.array([[i, (i + 7) % 40, (i + 19) % 40]
                          for i in range(0, 38, 2)], np.int64)
        # sample targets on faces with random barycentrics
        fsel = rng.randint(0, len(faces), 25)
        b = rng.rand(25, 3); b = b / b.sum(1, keepdims=True)
        dst = np.einsum("pk,pkd->pd", b, src[faces[fsel]])
        M = deformation_transfer_matrix(src, faces, dst)
        rec = np.asarray(apply_deformation_transfer(M, src[None]))[0]
        np.testing.assert_allclose(rec, dst, atol=1e-5)
        # rows are convex combinations
        np.testing.assert_allclose(M.sum(1), 1.0, atol=1e-5)

    def test_staged_fit_recovers_pose(self):
        from garment4d_tpu import smpl
        from garment4d_tpu.tools.transfer import fit_smpl_staged

        model = smpl.synthetic_smpl(num_verts=250)
        rng = np.random.RandomState(1)
        true_pose = np.zeros((1, 72), np.float32)
        true_pose[:, :3] = 0.4          # global orient
        true_pose[:, 3:9] = 0.2         # some body pose
        true_betas = (rng.randn(1, 10) * 0.3).astype(np.float32)
        target, _ = model.forward_axis_angle(jnp.asarray(true_betas),
                                             jnp.asarray(true_pose))
        target = target + jnp.asarray([[0.1, -0.05, 0.2]])[:, None, :]
        res = fit_smpl_staged(model, target, iters=(40, 80, 80))
        fitted, _ = model.forward_axis_angle(jnp.asarray(res.betas),
                                             jnp.asarray(res.pose))
        fitted = np.asarray(fitted) + res.transl[:, None, :]
        err = np.sqrt(((fitted - np.asarray(target)) ** 2).sum(-1)).mean()
        assert err < 0.02, f"staged fit error {err}"


class TestModelPklTools:
    """SMPL-only equivalents of the smplx maintenance scripts
    (`smplx/tools/clean_ch.py`, `smplx/tools/merge_smplh_mano.py`)."""

    @staticmethod
    def _chumpy_pickle(path, arrays, plain=None):
        """Write a pickle whose array values are tagged as chumpy.ch.Ch
        objects (the released model files' format) without chumpy installed:
        a stand-in class registered under the chumpy module path."""
        import pickle
        import sys
        import types

        class Ch:
            def __init__(self, x):
                self.x = x

        Ch.__module__ = "chumpy.ch"
        Ch.__qualname__ = "Ch"
        mod = types.ModuleType("chumpy")
        chmod = types.ModuleType("chumpy.ch")
        chmod.Ch = Ch
        sys.modules["chumpy"] = mod
        sys.modules["chumpy.ch"] = chmod
        try:
            payload = {k: Ch(v) for k, v in arrays.items()}
            payload.update(plain or {})
            with open(path, "wb") as f:
                pickle.dump(payload, f, protocol=2)
        finally:
            del sys.modules["chumpy"], sys.modules["chumpy.ch"]

    def test_clean_strips_chumpy(self, tmp_path, rng):
        import pickle

        from garment4d_tpu.tools.model_pkl import clean_model_pkl

        arrays = {"v_template": rng.randn(10, 3).astype(np.float64),
                  "weights": rng.rand(10, 24)}
        plain = {"f": np.arange(12).reshape(4, 3), "bs_style": "lbs"}
        src = tmp_path / "SMPL_TEST.pkl"
        self._chumpy_pickle(str(src), arrays, plain)

        out = clean_model_pkl(str(src), str(tmp_path / "out"))
        # reloadable with PLAIN pickle (no chumpy shims left)
        with open(out, "rb") as f:
            got = pickle.load(f)
        for k, v in arrays.items():
            assert isinstance(got[k], np.ndarray)
            np.testing.assert_array_equal(got[k], v)
        np.testing.assert_array_equal(got["f"], plain["f"])
        assert got["bs_style"] == "lbs"

    def test_merge_hand_models(self, tmp_path, rng):
        import pickle

        from garment4d_tpu.tools.model_pkl import merge_hand_models

        body = {"v_template": rng.randn(20, 3)}
        lh = {"hands_components": rng.randn(6, 45),
              "hands_coeffs": rng.randn(100, 6),
              "hands_mean": rng.randn(45)}
        rh = {"hands_components": rng.randn(6, 45),
              "hands_coeffs": rng.randn(100, 6),
              "hands_mean": rng.randn(45)}
        paths = {}
        for name, data in (("SMPLH_TEST.pkl", body), ("L.pkl", lh),
                           ("R.pkl", rh)):
            p = tmp_path / name
            self._chumpy_pickle(str(p), data)
            paths[name] = str(p)

        out = merge_hand_models(paths["SMPLH_TEST.pkl"], paths["L.pkl"],
                                paths["R.pkl"], str(tmp_path / "out"))
        with open(out, "rb") as f:
            got = pickle.load(f)
        np.testing.assert_array_equal(got["v_template"], body["v_template"])
        np.testing.assert_array_equal(got["hands_componentsl"],
                                      lh["hands_components"])
        np.testing.assert_array_equal(got["hands_componentsr"],
                                      rh["hands_components"])
        np.testing.assert_array_equal(got["hands_meanl"], lh["hands_mean"])
        np.testing.assert_array_equal(got["hands_coeffsr"],
                                      rh["hands_coeffs"])
