"""Golden tests for the loss/metric suite."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment4d_tpu import losses, ops
from garment4d_tpu.models import GarmentAssets


class TestBasicLosses:
    def test_sem_seg_matches_manual_ce(self, rng):
        logits = jnp.asarray(rng.randn(2, 10, 7).astype(np.float32))
        labels = jnp.asarray(rng.randint(0, 7, (2, 10)))
        got = float(losses.sem_seg_loss(logits, labels))
        l = np.asarray(logits)
        p = np.exp(l) / np.exp(l).sum(-1, keepdims=True)
        want = -np.log(np.take_along_axis(p, np.asarray(labels)[..., None], -1)).mean()
        assert abs(got - want) < 1e-5

    def test_vertex_l2_and_msre(self, rng):
        a = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
        b = jnp.asarray(rng.randn(2, 5, 3).astype(np.float32))
        d = np.asarray(a) - np.asarray(b)
        assert abs(float(losses.vertex_l2_loss(a, b)) - (d ** 2).sum(-1).mean()) < 1e-5
        assert abs(float(losses.vertex_msre(a, b))
                   - np.sqrt((d ** 2).sum(-1)).mean()) < 1e-5

    def test_temporal_constraint(self, rng):
        v = jnp.asarray(rng.randn(2, 4, 6, 3).astype(np.float32))
        vv = np.asarray(v)
        want = np.sqrt(((vv[:, :-1] - vv[:, 1:]) ** 2).sum(-1)).mean()
        assert abs(float(losses.temporal_constraint_loss(v)) - want) < 1e-5

    def test_acceleration_error_zero_for_equal(self, rng):
        v = jnp.asarray(rng.randn(1, 5, 4, 3).astype(np.float32))
        assert float(losses.acceleration_error(v, v)) == 0.0

    def test_acceleration_error_finite_difference(self, rng):
        # constant acceleration: pred has accel a, gt zero accel
        t = np.arange(6, dtype=np.float32)
        pred = np.zeros((1, 6, 1, 3), np.float32)
        pred[0, :, 0, 0] = 0.5 * 2.0 * (t / 30.0) ** 2  # a = 2
        gt = np.zeros_like(pred)
        gt[0, :, 0, 0] = t / 30.0  # constant velocity
        err = float(losses.acceleration_error(jnp.asarray(pred), jnp.asarray(gt)))
        assert abs(err - 2.0) < 1e-3


class TestCotLaplacian:
    def test_matrix_free_matches_dense(self, rng):
        assets = GarmentAssets.synthetic(num_rings=5, ring_size=8)
        V = assets.num_verts
        faces = assets.faces_tri
        verts = jnp.asarray(
            (assets.template_v + rng.randn(V, 3) * 0.01)[None].astype(np.float32))
        x = jnp.asarray(rng.randn(1, V, 3).astype(np.float32))

        got = np.asarray(ops.cot_laplacian_apply(verts, x, faces))[0]

        # dense reference construction (reference laplacian.py:199-249)
        C = np.asarray(ops.cotangent_weights(verts, faces))[0]
        L = np.zeros((V, V))
        rows = faces[:, [1, 2, 0]].reshape(-1)
        cols = faces[:, [2, 0, 1]].reshape(-1)
        np.add.at(L, (rows, cols), C.reshape(-1))
        L = L + L.T
        L = L - np.diag(L.sum(1))
        want = L @ np.asarray(x)[0]
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)

    def test_loss_zero_for_identical(self, rng):
        assets = GarmentAssets.synthetic(num_rings=5, ring_size=8)
        v = jnp.asarray(assets.template_v[None])
        assert float(losses.cot_laplacian_loss(v, v, assets.faces_tri)) < 1e-6

    def test_weights_are_stopgrad(self, rng):
        assets = GarmentAssets.synthetic(num_rings=5, ring_size=8)
        gt = jnp.asarray(assets.template_v[None])

        def f(v):
            return losses.cot_laplacian_loss(v, gt, assets.faces_tri)

        g = jax.grad(f)(gt + 0.01)
        assert np.isfinite(np.asarray(g)).all()


def _plane_body():
    """A z=0 grid mesh whose vertex normals all point +z."""
    n = 10
    xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
    verts = np.stack([xs.ravel(), ys.ravel(), np.zeros(n * n)], -1).astype(np.float32)
    faces = []
    for i in range(n - 1):
        for j in range(n - 1):
            a = i * n + j
            faces.append([a, a + 1, a + n])       # ccw -> +z normal
            faces.append([a + 1, a + n + 1, a + n])
    faces = np.asarray(faces, np.int32)
    bv = jnp.asarray(verts[None])
    bvn = ops.vertex_normals(bv, faces)
    return bv, bvn


class TestInterpenetrationLoss:
    def test_above_plane_zero(self, rng):
        bv, bvn = _plane_body()
        above = np.asarray(bv)[:, :40].copy()
        above[..., 2] += 0.1
        val = float(losses.interpenetration_loss(jnp.asarray(above), bv, bvn,
                                                 reduce="mean"))
        assert val == 0.0

    def test_below_plane_positive(self, rng):
        bv, bvn = _plane_body()
        below = np.asarray(bv)[:, :40].copy()
        below[..., 2] -= 0.05
        val = float(losses.interpenetration_loss(jnp.asarray(below), bv, bvn,
                                                 reduce="mean"))
        assert abs(val - 0.05) < 1e-3  # relu(-n.(g-b)) = depth below plane

    def test_sum_vs_mean_reduction(self, rng):
        bv, bvn = _plane_body()
        g = np.asarray(bv)[:, :40].copy()
        g[..., 2] -= 0.05
        s = float(losses.interpenetration_loss(jnp.asarray(g), bv, bvn, reduce="sum"))
        m = float(losses.interpenetration_loss(jnp.asarray(g), bv, bvn, reduce="mean"))
        assert abs(s - m * 40) < 1e-3  # sum over verts then batch-mean


class TestInterpWeights:
    def test_zero_distance_handling(self):
        # reference `mesh_encoder.py:341-345`: 1/0 -> inf -> zeroed before and
        # after normalisation
        from garment4d_tpu.models.skinning import _interp_weights

        d = jnp.asarray([[[0.0, 1.0, 4.0]]])
        w = np.asarray(_interp_weights(d))[0, 0]
        assert w[0] == 0.0
        np.testing.assert_allclose(w[1] / w[2], 4.0, rtol=1e-5)
        np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)


class TestLapBandRecovery:
    """The posed Laplacian regulariser under a band-recovering vertex
    relabeling (losses.posed_stage_loss `lap_perm` / train.step wiring):
    mean ||P L P^T (P x)|| must equal the dense mean ||L x|| exactly, and
    make_posed_steps must discover the permutation for shuffled templates."""

    def test_permuted_banded_equals_dense(self):
        from garment4d_tpu.ops import graph

        assets = GarmentAssets.synthetic(num_rings=10, ring_size=16)
        rng = np.random.RandomState(5)
        perm0 = rng.permutation(assets.num_verts)
        lap = np.asarray(assets.lap_adj)[perm0][:, perm0]  # shuffled order
        assert graph.cyclic_diagonals(lap) is None
        perm, offs = graph.bandwidth_permutation(lap)
        assert offs is not None  # RCM recovers the ring band

        x = jnp.asarray(rng.randn(3, lap.shape[0], 3).astype(np.float32))
        dense = jnp.mean(losses.uniform_laplacian_norms(x, jnp.asarray(lap)))
        la = jnp.asarray(lap[perm][:, perm])
        banded = jnp.mean(losses.uniform_laplacian_norms(
            jnp.take(x, jnp.asarray(perm), axis=-2), la, offs))
        np.testing.assert_allclose(np.asarray(banded), np.asarray(dense),
                                   rtol=1e-6, atol=1e-7)

    def test_make_posed_steps_recovers_band(self):
        from garment4d_tpu.train import step as train_step_mod

        assets = GarmentAssets.synthetic(num_rings=10, ring_size=16)
        rng = np.random.RandomState(6)
        shuffled = assets.permuted(rng.permutation(assets.num_verts))
        from garment4d_tpu.ops import graph

        assert graph.cyclic_diagonals(np.asarray(shuffled.lap_adj)) is None
        # the step factory must fall through to bandwidth_permutation
        perm, offs = graph.bandwidth_permutation(
            np.asarray(shuffled.lap_adj))
        assert offs is not None and perm is not None
