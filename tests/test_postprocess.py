"""Tests for post-processing and export."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from garment4d_tpu import ops, smpl
from garment4d_tpu.data.export import render_mesh, write_ply_pointcloud, export_frame
from garment4d_tpu.data.postprocess import (
    detect_penetration,
    laplacian_smooth,
    push_out_targets,
    remove_interpenetration,
)
from garment4d_tpu.models import GarmentAssets


@pytest.fixture(scope="module")
def assets():
    return GarmentAssets.synthetic(num_rings=8, ring_size=12)


class TestLaplacianSmooth:
    def test_matches_stepwise_reference(self, assets, rng):
        from garment4d_tpu.ops import row_normalize, build_mesh_adjacency

        adj = build_mesh_adjacency(assets.faces, assets.num_verts)
        norm = row_normalize(adj)
        v = rng.randn(1, assets.num_verts, 3).astype(np.float32)
        got = np.asarray(laplacian_smooth(jnp.asarray(v), jnp.asarray(norm), iters=10))
        want = v[0].astype(np.float64)
        for i in range(10):
            coeff = 0.05 if i % 2 == 0 else -0.052
            want = want + coeff * (norm @ want - want)
        np.testing.assert_allclose(got[0], want, rtol=1e-4, atol=1e-5)

    def test_smoothing_reduces_roughness(self, assets, rng):
        from garment4d_tpu.ops import row_normalize, build_mesh_adjacency

        adj = build_mesh_adjacency(assets.faces, assets.num_verts)
        norm = row_normalize(adj)
        v = assets.template_v + rng.randn(assets.num_verts, 3).astype(np.float32) * 0.02
        sm = np.asarray(laplacian_smooth(jnp.asarray(v[None]), jnp.asarray(norm)))[0]

        def roughness(x):
            return np.linalg.norm(norm @ x - x, axis=-1).mean()

        assert roughness(sm) < roughness(v)


class TestInterpenetration:
    def test_detect_and_push(self, rng):
        body_model = smpl.synthetic_smpl(num_verts=300)
        body_v = np.asarray(body_model.v_template)
        body = jnp.asarray(body_v[None])
        body_vn = ops.vertex_normals(body, body_model.faces)
        # garment points: copies of body verts nudged inward along -normal
        vn0 = np.asarray(body_vn[0])
        garment = body_v[:50] - 0.01 * vn0[:50]
        inside, nearest, normal = detect_penetration(
            jnp.asarray(garment[None], jnp.float32), body, body_vn)
        assert np.asarray(inside).mean() > 0.5
        pushed = push_out_targets(
            jnp.asarray(garment[None], jnp.float32), inside, nearest, normal)
        # pushed points must now be outside w.r.t. the matched normal
        d = np.sum(np.asarray(normal)[0] * (np.asarray(pushed)[0] - np.asarray(nearest)[0]), -1)
        assert (d[np.asarray(inside)[0]] > 0).all()

    def test_remove_interpenetration_converges(self, assets, rng):
        from garment4d_tpu.ops import build_mesh_adjacency

        body_model = smpl.synthetic_smpl(num_verts=300)
        body_v = np.asarray(body_model.v_template)
        garment = assets.template_v * 0.05  # deep inside the body blob
        adj = build_mesh_adjacency(assets.faces, assets.num_verts)
        out = remove_interpenetration(garment, body_v, body_model.faces, adj,
                                      max_iters=5)
        assert out.shape == garment.shape
        assert np.isfinite(out).all()
        body = jnp.asarray(body_v[None])
        body_vn = ops.vertex_normals(body, body_model.faces)
        inside_before, _, _ = detect_penetration(
            jnp.asarray(garment[None], jnp.float32), body, body_vn)
        inside_after, _, _ = detect_penetration(
            jnp.asarray(out[None], jnp.float32), body, body_vn)
        assert np.asarray(inside_after).sum() <= np.asarray(inside_before).sum()


class TestExport:
    def test_ply_and_obj(self, tmp_path, assets, rng):
        pcd = rng.randn(100, 3).astype(np.float32)
        labels = rng.randint(0, 7, 100)
        export_frame(str(tmp_path), "f0",
                     {"pcd": pcd, "pcd_labels": labels,
                      "pred_garment": assets.template_v},
                     garment_faces=assets.faces_tri)
        ply = (tmp_path / "f0_pcd.ply").read_text()
        assert ply.startswith("ply") and "element vertex 100" in ply
        obj = (tmp_path / "f0_pred_garment.obj").read_text()
        assert obj.count("v ") >= assets.num_verts

    def test_render_mesh(self, assets):
        img = render_mesh(assets.template_v, assets.faces_tri, size=64)
        assert img.shape == (64, 64)
        assert img.max() > 0  # something was rasterised

    def test_save_image(self, tmp_path, assets):
        from garment4d_tpu.data.export import save_image

        img = render_mesh(assets.template_v, assets.faces_tri, size=64)
        p = str(tmp_path / "r.png")
        save_image(p, img)
        assert os.path.getsize(p) > 100


class TestMultiRoundConvergence:
    def test_needs_and_survives_multiple_rounds(self, assets, rng):
        """A garment deep inside the body whose Laplacian regulariser drags
        pushed vertices back in: the 5-round loop must actually iterate
        (round 1 insufficient) and monotonically clear the penetrations
        (reference loop `post_processing.py:314-317`)."""
        from garment4d_tpu.data.postprocess import (
            detect_penetration,
            remove_interpenetration,
        )
        from garment4d_tpu.ops import build_mesh_adjacency

        from garment4d_tpu.data.postprocess import nearest_surface_points

        body_model = smpl.synthetic_smpl(num_verts=300)
        body_v = np.asarray(body_model.v_template)
        # start every garment vertex well inside the blob: the Laplacian +
        # outside-anchor terms drag pushed vertices back, forcing several
        # solve rounds
        garment = assets.template_v * 0.02
        adj = build_mesh_adjacency(assets.faces, assets.num_verts)
        out, rounds = remove_interpenetration(
            garment, body_v, body_model.faces, adj,
            garment_faces=assets.faces_tri, max_iters=5, return_rounds=True)
        assert rounds >= 2, f"expected a multi-round case, got {rounds}"

        def inside_count(v):
            # the removal loop's own criterion: nearest SURFACE point +
            # region normal (reference `post_processing.py:198-203`)
            near, nrm = nearest_surface_points(
                np.asarray(v, np.float64), body_v, body_model.faces)
            return int((np.sign(
                np.sum((v - near) * nrm, -1)) <= -1e-6).sum())

        assert inside_count(out) < inside_count(garment.astype(np.float64))
        assert np.isfinite(out).all()


class TestNearestSurfacePoint:
    """VERDICT r04 #5: exact point-to-triangle projection in interpenetration
    removal (reference `post_processing.py:145-177`)."""

    def test_disagrees_with_nearest_vertex(self):
        """A point above a large triangle's interior: the nearest SURFACE
        point is the interior projection, far from every vertex - the case
        the old 1-NN-vertex stand-in got wrong."""
        from garment4d_tpu.data.postprocess import nearest_surface_points

        body_v = np.array([[0, 0, 0], [4, 0, 0], [0, 4, 0]], np.float64)
        faces = np.array([[0, 1, 2]], np.int32)
        p = np.array([[1.0, 1.0, 0.5]])
        nearest, normals = nearest_surface_points(p, body_v, faces)
        np.testing.assert_allclose(nearest[0], [1.0, 1.0, 0.0], atol=1e-9)
        np.testing.assert_allclose(np.abs(normals[0]), [0, 0, 1], atol=1e-9)
        # every vertex is strictly farther than the surface point
        vert_d = np.linalg.norm(body_v - p[0], axis=1).min()
        surf_d = np.linalg.norm(nearest[0] - p[0])
        assert surf_d < vert_d - 0.5

    def test_region_normals(self):
        """Vertex region -> vertex normal; edge region -> sum of the two
        endpoint vertex normals (reference `post_processing.py:158-176`)."""
        from garment4d_tpu.data.postprocess import nearest_surface_points
        from garment4d_tpu import ops

        # a bent two-triangle strip so vertex/edge normals differ from the
        # face normals
        body_v = np.array([[0, 0, 0], [2, 0, 0], [1, 2, 0], [3, 2, 1.0]],
                          np.float64)
        faces = np.array([[0, 1, 2], [1, 3, 2]], np.int32)
        vn = np.asarray(ops.vertex_normals(
            jnp.asarray(body_v[None], jnp.float32), faces)[0], np.float64)

        # beyond vertex 0 -> vertex region of v0
        p_vert = np.array([[-1.0, -1.0, 0.3]])
        _, n_vert = nearest_surface_points(p_vert, body_v, faces)
        want = vn[0] / (np.linalg.norm(vn[0]) + 1e-10)
        np.testing.assert_allclose(n_vert[0], want, atol=1e-6)

        # off the shared edge (1,2), outside both triangles' interiors is
        # impossible for an interior edge - use boundary edge (0,1) instead
        p_edge = np.array([[1.0, -1.0, 0.2]])
        _, n_edge = nearest_surface_points(p_edge, body_v, faces)
        want = vn[0] + vn[1]
        want = want / (np.linalg.norm(want) + 1e-10)
        np.testing.assert_allclose(n_edge[0], want, atol=1e-6)

    def test_matches_bruteforce_oracle(self, rng):
        """Projection distance == dense-barycentric-sampling oracle."""
        from garment4d_tpu.data.postprocess import nearest_surface_points
        from garment4d_tpu import smpl

        body_model = smpl.synthetic_smpl(num_verts=60)
        body_v = np.asarray(body_model.v_template, np.float64)
        faces = np.asarray(body_model.faces, np.int64)
        pts = rng.randn(12, 3) * 0.4
        nearest, _ = nearest_surface_points(pts, body_v, faces)
        got_d = np.linalg.norm(pts - nearest, axis=1)

        # oracle: fine barycentric grid over every triangle
        grid = []
        n = 60
        for i in range(n + 1):
            for j in range(n + 1 - i):
                grid.append([i / n, j / n, (n - i - j) / n])
        grid = np.asarray(grid)  # (G, 3)
        tri = body_v[faces]  # (F, 3, 3)
        samples = np.einsum("gk,fkd->fgd", grid, tri).reshape(-1, 3)
        for p, d in zip(pts, got_d):
            oracle = np.linalg.norm(samples - p, axis=1).min()
            assert d <= oracle + 1e-9
            assert d >= oracle - 0.05  # grid resolution slack
