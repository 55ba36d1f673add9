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
