"""Interpret-mode tests for the Pallas kernels (runs on CPU CI).

The TPU-compiled kernels are additionally validated against the XLA paths on
real hardware (see README perf notes); these tests pin the kernel semantics.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.experimental.pallas import tpu as pltpu

from golden import ball_query_ref, fps_ref, three_nn_ref


class TestBallQueryKernel:
    def test_matches_golden(self, rng):
        from garment4d_tpu.ops.pallas.ball_query import ball_query_pallas

        xyz = rng.randn(2, 150, 3).astype(np.float32)
        centers = xyz[:, :40]
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(ball_query_pallas(0.5, 8, jnp.asarray(xyz),
                                               jnp.asarray(centers)))
        want = ball_query_ref(0.5, 8, xyz, centers)
        np.testing.assert_array_equal(got, want)

    def test_no_hits_zero(self, rng):
        from garment4d_tpu.ops.pallas.ball_query import ball_query_pallas

        xyz = np.ones((1, 20, 3), np.float32) * 50
        centers = np.zeros((1, 5, 3), np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(ball_query_pallas(0.1, 4, jnp.asarray(xyz),
                                               jnp.asarray(centers)))
        np.testing.assert_array_equal(got, np.zeros((1, 5, 4), np.int32))


class TestThreeNNKernel:
    def test_matches_golden(self, rng):
        from garment4d_tpu.ops.pallas.three_nn import three_nn_pallas

        unknown = rng.randn(2, 100, 3).astype(np.float32)
        known = rng.randn(2, 37, 3).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            d2, idx = three_nn_pallas(jnp.asarray(unknown), jnp.asarray(known))
        want_d, want_i = three_nn_ref(unknown, known)
        np.testing.assert_array_equal(np.asarray(idx), want_i)
        np.testing.assert_allclose(np.sqrt(np.asarray(d2)), want_d,
                                   rtol=1e-4, atol=1e-5)


class TestPrefixScan:
    def test_prefix_matches_full(self, rng):
        """The prefix early-exit is a pure perf hint: results must be
        identical for any prefix, including straggler centers whose quota
        needs points beyond the prefix."""
        from garment4d_tpu.ops.pallas.ball_query import ball_query_pallas

        xyz = rng.randn(2, 400, 3).astype(np.float32)
        centers = xyz[:, ::5][:, :64]
        with pltpu.force_tpu_interpret_mode():
            full = np.asarray(ball_query_pallas(0.4, 8, jnp.asarray(xyz),
                                                jnp.asarray(centers)))
            pre = np.asarray(ball_query_pallas(0.4, 8, jnp.asarray(xyz),
                                               jnp.asarray(centers), 128))
        np.testing.assert_array_equal(pre, full)

    def test_prefix_multi_matches_full(self, rng):
        from garment4d_tpu.ops.pallas.ball_query import ball_query_multi_pallas

        xyz = rng.randn(1, 300, 3).astype(np.float32)
        centers = xyz[:, :40]
        with pltpu.force_tpu_interpret_mode():
            full = ball_query_multi_pallas((0.3, 0.8), (4, 8),
                                           jnp.asarray(xyz),
                                           jnp.asarray(centers))
            pre = ball_query_multi_pallas((0.3, 0.8), (4, 8),
                                          jnp.asarray(xyz),
                                          jnp.asarray(centers), 128)
        for f, p in zip(full, pre):
            np.testing.assert_array_equal(np.asarray(p), np.asarray(f))


class TestMultiRadiusKernel:
    def test_matches_singles(self, rng):
        from garment4d_tpu.ops.pallas.ball_query import (
            ball_query_multi_pallas,
            ball_query_pallas,
        )

        xyz = rng.randn(1, 130, 3).astype(np.float32)
        centers = xyz[:, :32]
        with pltpu.force_tpu_interpret_mode():
            multi = ball_query_multi_pallas(
                (0.2, 0.5), (4, 8), jnp.asarray(xyz), jnp.asarray(centers))
            singles = [
                np.asarray(ball_query_pallas(r, s, jnp.asarray(xyz),
                                             jnp.asarray(centers)))
                for r, s in ((0.2, 4), (0.5, 8))]
        for m, s in zip(multi, singles):
            np.testing.assert_array_equal(np.asarray(m), s)


class TestGatherKernel:
    def test_matches_xla_gather(self, rng):
        from garment4d_tpu.ops.pallas.gather import gather_rows_pallas

        table = rng.randn(3, 700, 6).astype(np.float32)
        idx = rng.randint(0, 700, (3, 1000)).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(gather_rows_pallas(jnp.asarray(table),
                                                jnp.asarray(idx)))
        want = np.take_along_axis(table, idx[..., None], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_wide_channels(self, rng):
        from garment4d_tpu.ops.pallas.gather import gather_rows_pallas

        table = rng.randn(2, 300, 35).astype(np.float32)
        idx = rng.randint(0, 300, (2, 257)).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(gather_rows_pallas(jnp.asarray(table),
                                                jnp.asarray(idx)))
        want = np.take_along_axis(table, idx[..., None], axis=1)
        np.testing.assert_array_equal(got, want)

    def test_group_points_grad_unchanged(self, rng):
        """The custom_vjp backward must equal take_along_axis autodiff
        (deterministic scatter-add)."""
        from garment4d_tpu import ops

        pts = jnp.asarray(rng.randn(2, 50, 4).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 50, (2, 8, 3)).astype(np.int32))
        cot = jnp.asarray(rng.randn(2, 8, 3, 4).astype(np.float32))

        def via_ops(p):
            return jnp.vdot(ops.group_points(p, idx), cot)

        def via_tala(p):
            flat = jnp.take_along_axis(p, idx.reshape(2, 24, 1), axis=1)
            return jnp.vdot(flat.reshape(2, 8, 3, 4), cot)

        g1 = jax.grad(via_ops)(pts)
        g2 = jax.grad(via_tala)(pts)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)


class TestKnnTransferKernel:
    def _xla(self, g, b, w0, k, k64):
        from garment4d_tpu.models.skinning import _knn_transfer_xla
        return _knn_transfer_xla(jnp.asarray(g), jnp.asarray(b),
                                 jnp.asarray(w0), k, k64)

    def test_matches_xla_formulation(self, rng):
        from garment4d_tpu.ops.pallas.knn_transfer import (
            knn_weight_transfer_pallas)

        B, Vg, N, J = 2, 40, 300, 24
        g = rng.randn(B, Vg, 3).astype(np.float32)
        b = rng.randn(B, N, 3).astype(np.float32)
        w0 = rng.rand(B, N, J).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = knn_weight_transfer_pallas(
                jnp.asarray(g), jnp.asarray(b), jnp.asarray(w0), 16, 8)
        want = self._xla(g, b, w0, 16, 8)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))

    def test_boundary_ties_lower_index(self, rng):
        """Duplicate body points create exact distance ties at the k-th
        boundary; both paths must pick the lower-index copies (chamferdist
        tie order)."""
        from garment4d_tpu.ops.pallas.knn_transfer import (
            knn_weight_transfer_pallas)

        B, Vg, N, J = 1, 8, 64, 4
        b = rng.randn(B, N // 4, 3).astype(np.float32)
        b = np.tile(b, (1, 4, 1))  # every point 4x duplicated
        g = b[:, :Vg] + 0.01
        w0 = rng.rand(B, N, J).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = knn_weight_transfer_pallas(
                jnp.asarray(g), jnp.asarray(b), jnp.asarray(w0), 6, 3)
        want = self._xla(g, b, w0, 6, 3)
        np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(got[1]), np.asarray(want[1]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))

    def test_k64_equals_k(self, rng):
        from garment4d_tpu.ops.pallas.knn_transfer import (
            knn_weight_transfer_pallas)

        g = rng.randn(1, 10, 3).astype(np.float32)
        b = rng.randn(1, 100, 3).astype(np.float32)
        w0 = rng.rand(1, 100, 5).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = knn_weight_transfer_pallas(
                jnp.asarray(g), jnp.asarray(b), jnp.asarray(w0), 12, 12)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(got[1]))


class TestCoverageAndPruning:
    def test_coverage_mask(self, rng):
        from garment4d_tpu.ops.pallas.coverage import covered_mask_pallas

        xyz = rng.randn(2, 600, 3).astype(np.float32)
        centers = rng.randn(2, 40, 3).astype(np.float32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(covered_mask_pallas(jnp.asarray(xyz),
                                                 jnp.asarray(centers), 0.5))
        d2 = ((xyz[:, :, None, :] - centers[:, None, :, :]) ** 2).sum(-1)
        want = (d2.min(-1) < 0.25).astype(np.int32)
        np.testing.assert_array_equal(got, want)

    @pytest.mark.parametrize("cap_frac", [0.5, 0.05])
    def test_pruned_query_group_exact(self, rng, cap_frac):
        """The compaction path (and, at cap_frac=0.05, the overflow
        fallback cond branch) must reproduce the plain query+group exactly,
        including no-hit centers and first-hit-at-row-0 centers."""
        from garment4d_tpu import ops

        B, N, M = 2, 1536, 64
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.5
        new_xyz = rng.randn(B, M, 3).astype(np.float32) * 0.5
        new_xyz[:, 0] = xyz[:, 0]
        new_xyz[:, -1] = 50.0
        feats = rng.randn(B, N, 5).astype(np.float32)
        radii, ns = (0.2, 0.4), (4, 8)
        idxs = ops.ball_query_multi(radii, ns, jnp.asarray(xyz),
                                    jnp.asarray(new_xyz), use_pallas=False)
        want = [np.asarray(ops.group_points(jnp.asarray(feats), i))
                for i in idxs]
        with pltpu.force_tpu_interpret_mode():
            got = ops.query_group_pruned_multi(
                radii, ns, jnp.asarray(xyz), jnp.asarray(new_xyz),
                jnp.asarray(feats), cap_frac=cap_frac, use_pallas=True)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6)


class TestScatterKernel:
    def test_matches_at_add(self, rng):
        from garment4d_tpu.ops.pallas.scatter import scatter_add_rows_pallas

        B, R, N, C = 2, 1500, 300, 6
        g = rng.randn(B, R, C).astype(np.float32)
        idx = rng.randint(0, N, (B, R)).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(scatter_add_rows_pallas(jnp.asarray(g),
                                                     jnp.asarray(idx), N))
        want = np.zeros((B, N, C), np.float32)
        for b in range(B):
            np.add.at(want[b], idx[b], g[b])
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_collision_heavy(self, rng):
        """Everything scatters into a handful of rows - the accumulation
        path across j-groups and r-tiles must sum all of it."""
        from garment4d_tpu.ops.pallas.scatter import scatter_add_rows_pallas

        B, R, N, C = 1, 4000, 130, 3
        g = np.ones((B, R, C), np.float32)
        idx = (np.arange(R) % 5).astype(np.int32)[None]
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(scatter_add_rows_pallas(jnp.asarray(g),
                                                     jnp.asarray(idx), N))
        want = np.zeros((B, N, C), np.float32)
        np.add.at(want[0], idx[0], g[0])
        np.testing.assert_allclose(got, want, rtol=1e-6)


class TestVertexNormalsKernelPath:
    def test_matches_xla_path(self, rng):
        """The MXU-scatter vertex-normal path (TPU) must match the XLA
        .at[].add path (CPU fallback) to roundoff."""
        from garment4d_tpu.ops import meshmath

        B, V = 2, 200
        verts = rng.randn(B, V, 3).astype(np.float32)
        faces = rng.randint(0, V, (300, 3)).astype(np.int32)
        want = np.asarray(meshmath.vertex_normals(jnp.asarray(verts), faces))
        from garment4d_tpu.ops.pallas.scatter import scatter_add_rows_pallas

        fn = np.asarray(meshmath.face_normals(jnp.asarray(verts), faces))
        idx = np.broadcast_to(faces.T.reshape(1, -1), (B, 900)).copy()
        fn3 = np.broadcast_to(fn[:, None], (B, 3, 300, 3)).reshape(B, 900, 3)
        with pltpu.force_tpu_interpret_mode():
            vn = np.asarray(scatter_add_rows_pallas(
                jnp.asarray(fn3.copy()), jnp.asarray(idx), V))
        vn = vn / np.clip(np.linalg.norm(vn, axis=-1, keepdims=True),
                          1e-6, None)
        np.testing.assert_allclose(vn, want, rtol=1e-4, atol=1e-5)


class TestGroupedBallQueryKernel:
    def test_matches_golden(self, rng):
        """The group-bounded kernel must equal the golden oracle exactly
        (same first-hit replication / no-hit-zero semantics) across several
        512-lane groups, including centers whose hits are exhausted early
        and centers with zero hits."""
        from garment4d_tpu.ops.pallas.ball_query import (
            _ball_query_multi_grouped,
        )

        xyz = rng.randn(2, 1200, 3).astype(np.float32) * 1.5
        centers = np.concatenate(
            [xyz[:, ::9][:, :120], np.full((2, 8, 3), 40.0, np.float32)],
            axis=1)
        with pltpu.force_tpu_interpret_mode():
            got = _ball_query_multi_grouped(
                (0.3, 0.7, 1.2), (4, 8, 16), jnp.asarray(xyz),
                jnp.asarray(centers), tile_m=64)
        for g, (r, s) in zip(got, ((0.3, 4), (0.7, 8), (1.2, 16))):
            want = ball_query_ref(r, s, xyz, centers)
            np.testing.assert_array_equal(np.asarray(g), want)

    def test_matches_standard_kernel(self, rng):
        from garment4d_tpu.ops.pallas.ball_query import (
            _ball_query_multi_grouped,
            ball_query_multi_pallas,
        )

        xyz = rng.randn(1, 700, 3).astype(np.float32)
        centers = xyz[:, :50] + 0.05
        with pltpu.force_tpu_interpret_mode():
            grouped = _ball_query_multi_grouped(
                (0.25, 0.6), (4, 8), jnp.asarray(xyz), jnp.asarray(centers),
                tile_m=64)
            std = ball_query_multi_pallas(
                (0.25, 0.6), (4, 8), jnp.asarray(xyz), jnp.asarray(centers))
        for g, s in zip(grouped, std):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(s))


class TestChannelFirstGather:
    def test_cf_matches_row_major(self, rng):
        from garment4d_tpu.ops.pallas.gather import (
            gather_rows_pallas,
            gather_rows_pallas_cf,
        )

        table = rng.randn(2, 300, 19).astype(np.float32)
        idx = rng.randint(0, 300, (2, 257)).astype(np.int32)
        with pltpu.force_tpu_interpret_mode():
            cf = np.asarray(gather_rows_pallas_cf(jnp.asarray(table),
                                                  jnp.asarray(idx)))
            rm = np.asarray(gather_rows_pallas(jnp.asarray(table),
                                               jnp.asarray(idx)))
        np.testing.assert_array_equal(cf.transpose(0, 2, 1), rm)

    def test_group_points_cf_fwd_bwd(self, rng):
        """group_points_cf must equal transpose(group_points) in value and
        produce the identical (deterministic) gradient."""
        from garment4d_tpu import ops

        pts = rng.randn(2, 90, 7).astype(np.float32)
        idx = rng.randint(0, 90, (2, 20, 5)).astype(np.int32)

        def f_cf(p):
            return jnp.sum(ops.group_points_cf(p, jnp.asarray(idx)) ** 2)

        def f_rm(p):
            return jnp.sum(ops.group_points(p, jnp.asarray(idx)) ** 2)

        v_cf = np.asarray(ops.group_points_cf(jnp.asarray(pts),
                                              jnp.asarray(idx)))
        v_rm = np.asarray(ops.group_points(jnp.asarray(pts),
                                           jnp.asarray(idx)))
        np.testing.assert_array_equal(v_cf.transpose(0, 2, 3, 1), v_rm)
        g_cf = np.asarray(jax.grad(f_cf)(jnp.asarray(pts)))
        g_rm = np.asarray(jax.grad(f_rm)(jnp.asarray(pts)))
        np.testing.assert_allclose(g_cf, g_rm, rtol=1e-6)


class TestBandedGraphMatmul:
    def _banded_adj(self, rng, v, offsets):
        adj = np.zeros((v, v), np.float32)
        for o in offsets:
            i = np.arange(v)
            adj[i, (i + o) % v] = rng.rand(v).astype(np.float32)
        return adj

    def test_kernel_matches_dense(self, rng):
        from garment4d_tpu.ops.pallas.banded import banded_matmul_pallas

        v, c, b = 37, 5, 2
        offsets = (0, 1, 7, 30, 36)
        adj = self._banded_adj(rng, v, offsets)
        x = rng.randn(b, v, c).astype(np.float32)
        i = np.arange(v)
        vals = np.stack([adj[i, (i + o) % v] for o in offsets])
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(banded_matmul_pallas(
                jnp.asarray(vals), jnp.asarray(x), offsets, v))
        want = np.einsum("vw,bwc->bvc", adj, x)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_graph_matmul_banded_value_and_grad(self, rng):
        """graph_matmul_banded == dense graph_matmul in value and x-grad
        (the roll fallback path on CPU)."""
        from garment4d_tpu.ops.graph import (
            cyclic_diagonals,
            graph_matmul,
            graph_matmul_banded,
        )

        v, c = 41, 6
        adj = self._banded_adj(rng, v, (0, 1, 5, 36, 40))
        offs = cyclic_diagonals(adj)
        assert offs == (0, 1, 5, 36, 40)
        x = rng.randn(3, 4, v, c).astype(np.float32)
        dense = np.asarray(graph_matmul(jnp.asarray(adj), jnp.asarray(x)))
        band = np.asarray(
            graph_matmul_banded(jnp.asarray(adj), jnp.asarray(x), offs))
        np.testing.assert_allclose(band, dense, rtol=1e-5, atol=1e-6)

        g = rng.randn(*x.shape).astype(np.float32)
        gd = jax.grad(lambda xx: jnp.sum(
            graph_matmul(jnp.asarray(adj), xx) * g))(jnp.asarray(x))
        gb = jax.grad(lambda xx: jnp.sum(
            graph_matmul_banded(jnp.asarray(adj), xx, offs) * g))(
                jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(gb), np.asarray(gd),
                                   rtol=1e-5, atol=1e-6)

    def test_irregular_returns_none(self, rng):
        from garment4d_tpu.ops.graph import cyclic_diagonals

        adj = (rng.rand(64, 64) < 0.3).astype(np.float32)
        assert cyclic_diagonals(adj) is None


class TestFusedPEKernel:
    def _params(self, rng, c, f=32):
        return (rng.randn(c, f).astype(np.float32) * 0.2,
                rng.randn(f).astype(np.float32),
                rng.randn(f, f).astype(np.float32) * 0.2,
                rng.randn(f).astype(np.float32))

    def test_matches_reference(self, rng):
        """Fused gather+MLP+max kernel == unfused formulation, for the body
        (C=6) and garment (C=35) channel layouts and several S."""
        from garment4d_tpu.ops.pallas.fusedpe import group_pe_max_pallas
        from garment4d_tpu.ops.pemax import _pe_reference

        B, N, M = 2, 300, 140
        ctr = rng.randn(B, M, 3).astype(np.float32)
        for c, s in ((6, 32), (35, 8), (6, 16)):
            table = rng.randn(B, N, c).astype(np.float32)
            idx = rng.randint(0, N, (B, M, s)).astype(np.int32)
            k0, b0, k1, b1 = self._params(rng, c)
            args = tuple(jnp.asarray(a)
                         for a in (table, idx, ctr, k0, b0, k1, b1))
            want = np.asarray(_pe_reference(*args))
            with pltpu.force_tpu_interpret_mode():
                got = np.asarray(group_pe_max_pallas(*args, s))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_group_pe_max_grad(self, rng):
        """custom_vjp backward == autodiff of the reference formulation."""
        from garment4d_tpu.ops.pemax import _pe_reference, group_pe_max

        B, N, C, M, S = 2, 90, 6, 40, 8
        table = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
        ctr = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
        k0, b0, k1, b1 = (jnp.asarray(a) for a in self._params(rng, C))

        def loss(fn, t, c, w):
            return jnp.sum(fn(t, idx, c, w, b0, k1, b1) ** 2)

        g_fused = jax.grad(lambda *a: loss(group_pe_max, *a),
                           argnums=(0, 1, 2))(table, ctr, k0)
        g_ref = jax.grad(lambda *a: loss(_pe_reference, *a),
                         argnums=(0, 1, 2))(table, ctr, k0)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_query_group_pe_multi_matches_unfused(self, rng):
        """The fused body-query front end == query + group + PE math,
        including no-hit centers (full-space row-0 convention)."""
        from garment4d_tpu import ops

        B, N, M = 2, 200, 60
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.3
        vn = rng.randn(B, N, 3).astype(np.float32)
        ctr = np.concatenate(
            [xyz[:, ::4][:, :50], np.full((B, 10, 3), 30.0, np.float32)],
            axis=1)
        radii, ss = (0.2, 0.5), (4, 8)
        params = [tuple(jnp.asarray(a) for a in self._params(rng, 6))
                  for _ in ss]
        got = ops.query_group_pe_multi(
            radii, ss, jnp.asarray(xyz), jnp.asarray(ctr), jnp.asarray(vn),
            params, use_pallas=False)
        packed = np.concatenate([xyz, vn], axis=-1)
        for g, r, s, (k0, b0, k1, b1) in zip(got, radii, ss, params):
            idx = np.asarray(ops.ball_query(r, s, jnp.asarray(xyz),
                                            jnp.asarray(ctr)))
            rows = np.take_along_axis(
                packed, idx.reshape(B, -1, 1), axis=1).reshape(B, -1, s, 6)
            ctr_pad = np.concatenate(
                [ctr, np.zeros((B, ctr.shape[1], 3), np.float32)], axis=-1)
            qg = rows - ctr_pad[:, :, None, :]
            h = np.maximum(
                np.einsum("bmsc,cf->bmsf", qg, np.asarray(k0))
                + np.asarray(b0), 0.0)
            want = np.max(
                np.einsum("bmsf,fg->bmsg", h, np.asarray(k1))
                + np.asarray(b1), axis=2)
            np.testing.assert_allclose(np.asarray(g), want,
                                       rtol=1e-4, atol=1e-5)


class TestFusedChainKernel:
    def test_chain_matches_reference(self, rng):
        """L-layer fused chain (the eval-mode SA pattern) == unfused."""
        from garment4d_tpu.ops.pallas.fusedpe import fused_chain_pallas
        from garment4d_tpu.ops.pemax import _chain_reference

        B, N, C, M, S = 2, 260, 9, 70, 16
        widths = (16, 16, 32)
        table = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
        ctr = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
        ws, bs, cur = [], [], C
        for w in widths:
            ws.append(jnp.asarray(rng.randn(cur, w).astype(np.float32) * 0.3))
            bs.append(jnp.asarray(rng.randn(w).astype(np.float32) * 0.1))
            cur = w
        relus = (True,) * len(widths)
        want = np.asarray(_chain_reference(table, idx, ctr, tuple(ws),
                                           tuple(bs), relus))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_chain_pallas(table, idx, ctr, tuple(ws),
                                                tuple(bs), relus, S))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_wide_s64_small_m(self, rng):
        """S=64 with 64 centers (the sa3 / garment_sa2 scale): TC drops to
        64 lanes, legal because one tile covers the whole center axis."""
        from garment4d_tpu.ops.pallas.fusedpe import (
            chain_supported,
            fused_chain_pallas,
        )
        from garment4d_tpu.ops.pemax import _chain_reference

        B, N, C, M, S = 2, 256, 99, 64, 64
        widths = (128, 128)
        assert chain_supported(N, C, S, widths, m=M)
        table = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, N, (B, M, S)).astype(np.int32))
        ctr = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
        ws, bs, cur = [], [], C
        for w in widths:
            ws.append(jnp.asarray(rng.randn(cur, w).astype(np.float32) * 0.2))
            bs.append(jnp.asarray(rng.randn(w).astype(np.float32) * 0.1))
            cur = w
        relus = (True,) * len(widths)
        want = np.asarray(_chain_reference(table, idx, ctr, tuple(ws),
                                           tuple(bs), relus))
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fused_chain_pallas(table, idx, ctr, tuple(ws),
                                                tuple(bs), relus, S))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_folded_sa_matches_unfused_module(self, rng):
        """SAModuleMSG's fused eval path (BN folding + chain kernel) ==
        the unfused module, end to end in interpret mode."""
        import garment4d_tpu.nn.pointnet as pn
        from garment4d_tpu.nn.pointnet import SAModuleMSG
        import garment4d_tpu.ops.pemax as pemax

        B, N = 2, 260
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.4)
        feats = jnp.asarray(rng.randn(B, N, 6).astype(np.float32))
        mod = SAModuleMSG(npoint=64, radii=[0.3, 0.6], nsamples=[8, 16],
                          mlps=[[16, 32], [16, 32]])
        v = mod.init(jax.random.PRNGKey(0), xyz, feats, train=False)
        want_xyz, want = mod.apply(v, xyz, feats, train=False)

        # emulate the TPU path: force fuse_ok on, kernels run interpreted
        orig_backend = jax.default_backend
        try:
            jax.default_backend = lambda: "tpu"
            with pltpu.force_tpu_interpret_mode():
                got_xyz, got = mod.apply(v, xyz, feats, train=False)
        finally:
            jax.default_backend = orig_backend
        np.testing.assert_allclose(np.asarray(got_xyz), np.asarray(want_xyz))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


class TestGcnStackKernel:
    """Fused GCN stack (ops/pallas/gcnstack.py) vs the unfused reference."""

    def _setup(self, rng, BT=3, V=48, C0=35):
        from garment4d_tpu.models.assets import GarmentAssets
        from garment4d_tpu.ops.graph import _gcn_stack_ref, cyclic_diagonals

        assets = GarmentAssets.synthetic(num_rings=6, ring_size=8)  # V=48
        adj = jnp.asarray(assets.gcn_adj)
        offs = cyclic_diagonals(assets.gcn_adj)
        widths = [16, 16, 16, 3]
        weights, biases = [], []
        c = C0
        for w_ in widths:
            weights.append(jnp.asarray(rng.randn(c, w_) * 0.3, jnp.float32))
            biases.append(jnp.asarray(rng.randn(w_) * 0.1, jnp.float32))
            c = w_
        x = jnp.asarray(rng.randn(BT, V, C0), jnp.float32)
        return x, weights, biases, adj, offs, _gcn_stack_ref

    def test_matches_reference(self, rng):
        from garment4d_tpu.ops.pallas.gcnstack import gcn_stack_cf_pallas

        x, ws, bs, adj, offs, ref = self._setup(rng)
        # split the input into pieces (as the posed model feeds them)
        xs = (x[..., :3], x[..., 3:19], x[..., 19:])
        relus = (True, True, True, False)
        out_ref, hid_ref = ref(xs, ws, bs, adj, offs, relus, 2)
        V = adj.shape[0]
        idx = jnp.arange(V)
        vals = jnp.stack([adj[idx, (idx + o) % V] for o in offs])
        with pltpu.force_tpu_interpret_mode():
            out, hid = gcn_stack_cf_pallas(xs, tuple(ws), tuple(bs), vals,
                                           offs, relus, 2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(hid), np.asarray(hid_ref),
                                   rtol=1e-5, atol=1e-5)

    def test_gcn_stack_grads(self, rng):
        from garment4d_tpu import ops

        x, ws, bs, adj, offs, ref = self._setup(rng)
        relus = (True, True, True, False)

        def loss_fused(x, ws, bs):
            xs = (x[..., :3], x[..., 3:])
            o, h = ops.gcn_stack(xs, tuple(ws), tuple(bs), adj, offs,
                                 relus, 2)
            return jnp.sum(o ** 2) + jnp.sum(h ** 2)

        def loss_ref(x, ws, bs):
            o, h = ref((x,), ws, bs, adj, offs, relus, 2)
            return jnp.sum(o ** 2) + jnp.sum(h ** 2)

        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(x, tuple(ws), tuple(bs))
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, tuple(ws), tuple(bs))
        for a, b in zip(jax.tree_util.tree_leaves(gf),
                        jax.tree_util.tree_leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)


class TestDynamicValidBallQuery:
    """grouped kernel with a per-batch dynamic valid count == full scan on
    the sentinel-padded table."""

    def test_matches_full_scan(self, rng):
        from garment4d_tpu.ops.pallas.ball_query import (
            _ball_query_multi_grouped,
        )

        B, N, M, cap = 3, 1200, 100, 2048
        xyz = jnp.asarray(rng.randn(B, N, 3), jnp.float32) * 0.3
        counts = jnp.asarray([1200, 700, 130], jnp.int32)
        # sentinel-pad each row past its dynamic count (as the candidate
        # compaction does)
        lane = jnp.arange(cap)[None, :]
        padded = jnp.pad(xyz, ((0, 0), (0, cap - N), (0, 0)),
                         constant_values=1e9)
        padded = jnp.where((lane < counts[:, None])[..., None], padded,
                           jnp.float32(1e9))
        ctr = jnp.asarray(rng.randn(B, M, 3), jnp.float32) * 0.3
        radii, ns = (0.2, 0.4), (8, 16)
        with pltpu.force_tpu_interpret_mode():
            ref = _ball_query_multi_grouped(radii, ns, padded, ctr)
            got = _ball_query_multi_grouped(radii, ns, padded, ctr,
                                            n_valid_dyn=counts)
        for a, b in zip(got, ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDynamicValidFusedPE:
    """Chunk-skipping fused PE/chain kernel (`fused_chain_pallas_nv`) ==
    the static kernel on sentinel-padded candidate tables."""

    def _setup(self, rng, B=3, cap=640, M=90, S=16, C=6):
        counts = np.asarray([cap, 300, 70], np.int32)[:B]
        table = rng.randn(B, cap, C).astype(np.float32)
        lane = np.arange(cap)[None, :, None]
        # xyz channels -> 1e9 sentinels past the count (as _gather_candidates
        # produces); feature channels left as garbage (never gathered)
        table[..., :3] = np.where(lane < counts[:, None, None],
                                  table[..., :3], 1e9)
        # idx only ever points at valid rows (ball-query guarantee)
        idx = (rng.randint(0, 1 << 30, (B, M, S))
               % np.maximum(counts, 1)[:, None, None]).astype(np.int32)
        ctr = rng.randn(B, M, 3).astype(np.float32)
        return counts, table, idx, ctr

    def test_matches_static_kernel(self, rng):
        from garment4d_tpu.ops.pallas.fusedpe import (
            fused_chain_pallas,
            fused_chain_pallas_nv,
        )

        counts, table, idx, ctr = self._setup(rng)
        ws = (rng.randn(6, 32).astype(np.float32) * 0.2,
              rng.randn(32, 32).astype(np.float32) * 0.2)
        bs = (rng.randn(32).astype(np.float32),
              rng.randn(32).astype(np.float32))
        relus = (True, False)
        args = (jnp.asarray(table), jnp.asarray(idx), jnp.asarray(ctr),
                ws, bs, relus, 16)
        with pltpu.force_tpu_interpret_mode():
            want = np.asarray(fused_chain_pallas(*args))
            got = np.asarray(fused_chain_pallas_nv(
                *args, jnp.asarray(counts)))
        np.testing.assert_array_equal(got, want)

    def test_nv_zero_matches_static(self, rng):
        """n_valid == 0: every idx is the no-hit prefill 0, and the clamped
        one-chunk scan must gather the sentinel row 0 exactly like the
        static kernel (exactness must not depend on the caller's no-hit
        fixup overwriting the output downstream)."""
        from garment4d_tpu.ops.pallas.fusedpe import (
            fused_chain_pallas,
            fused_chain_pallas_nv,
        )

        counts, table, idx, ctr = self._setup(rng, B=3)
        counts = np.asarray([counts[0], 0, counts[2]], np.int32)
        lane = np.arange(table.shape[1])[None, :, None]
        table[..., :3] = np.where(lane < counts[:, None, None],
                                  table[..., :3], 1e9)
        idx[1] = 0  # the prefill convention for a frame with no candidates
        ws = (rng.randn(6, 32).astype(np.float32) * 0.2,
              rng.randn(32, 32).astype(np.float32) * 0.2)
        bs = (rng.randn(32).astype(np.float32),
              rng.randn(32).astype(np.float32))
        args = (jnp.asarray(table), jnp.asarray(idx), jnp.asarray(ctr),
                ws, bs, (True, False), 16)
        with pltpu.force_tpu_interpret_mode():
            want = np.asarray(fused_chain_pallas(*args))
            got = np.asarray(fused_chain_pallas_nv(
                *args, jnp.asarray(counts)))
        np.testing.assert_array_equal(got, want)

    def test_group_pe_max_nv_grads(self, rng):
        """The nt_nv custom_vjp's backward == reference autodiff (the
        forward skips chunks; the recompute backward must not care)."""
        from garment4d_tpu.ops.pemax import _pe_reference, group_pe_max

        counts, table, idx, ctr = self._setup(rng, B=2, cap=256, M=40, S=8)
        k0 = jnp.asarray(rng.randn(6, 32).astype(np.float32) * 0.2)
        b0 = jnp.asarray(rng.randn(32).astype(np.float32))
        k1 = jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.2)
        b1 = jnp.asarray(rng.randn(32).astype(np.float32))
        t, i, c = jnp.asarray(table), jnp.asarray(idx), jnp.asarray(ctr)

        def loss_nv(c_, k0_):
            return jnp.sum(group_pe_max(t, i, c_, k0_, b0, k1, b1,
                                        table_grad=False,
                                        n_valid=jnp.asarray(counts)) ** 2)

        def loss_ref(c_, k0_):
            return jnp.sum(_pe_reference(t, i, c_, k0_, b0, k1, b1) ** 2)

        gf = jax.grad(loss_nv, argnums=(0, 1))(c, k0)
        gr = jax.grad(loss_ref, argnums=(0, 1))(c, k0)
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    @pytest.mark.parametrize("nv_wiring", [False, True])
    def test_query_group_pe_multi_compact_exact(self, rng, monkeypatch,
                                                nv_wiring):
        """End to end: the candidate-compacted pallas path == the unfused
        reference path, under BOTH PE-gather wirings. The chunk-skipping nv
        feed is off by default (G4D_PE_NV, a measured regression on the
        headline path), and the module constant is read once at import -
        so the nv wiring is forced here via monkeypatch to keep its
        query_group_pe_multi integration covered by default CI."""
        from garment4d_tpu import ops
        from garment4d_tpu.ops import pemax

        monkeypatch.setattr(pemax, "_NV_ENABLED", nv_wiring)
        B, N, M = 2, 1280, 70
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.3
        vn = rng.randn(B, N, 3).astype(np.float32)
        ctr = np.concatenate(
            [xyz[:, ::8][:, :60], np.full((B, 10, 3), 30.0, np.float32)],
            axis=1)
        radii, ss = (0.15, 0.3), (4, 8)
        params = [tuple(jnp.asarray(a) for a in (
            rng.randn(6, 32).astype(np.float32) * 0.2,
            rng.randn(32).astype(np.float32),
            rng.randn(32, 32).astype(np.float32) * 0.2,
            rng.randn(32).astype(np.float32))) for _ in ss]
        want = ops.query_group_pe_multi(
            radii, ss, jnp.asarray(xyz), jnp.asarray(ctr), jnp.asarray(vn),
            params, use_pallas=False)
        with pltpu.force_tpu_interpret_mode():
            got = ops.query_group_pe_multi(
                radii, ss, jnp.asarray(xyz), jnp.asarray(ctr),
                jnp.asarray(vn), params, cap_frac=0.5, use_pallas=True,
                table_grad=not nv_wiring)
        for g, w in zip(got, want):
            np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                       rtol=1e-4, atol=1e-5)


class TestMortonSpatial:
    """ops/morton.py + the grouped kernel's [lo, bound) group window."""

    @staticmethod
    def _morton_ref(xyz):
        lo = xyz.min(1, keepdims=True)
        hi = xyz.max(1, keepdims=True)
        q = np.clip((xyz - lo) / np.maximum(hi - lo, 1e-12) * 1023,
                    0, 1023).astype(np.int64)

        def spread(v):
            out = np.zeros_like(v)
            for bit in range(10):
                out |= ((v >> bit) & 1) << (3 * bit)
            return out

        return (spread(q[..., 0]) | (spread(q[..., 1]) << 1)
                | (spread(q[..., 2]) << 2)).astype(np.int32)

    def test_morton_codes_match_bitwise_reference(self, rng):
        from garment4d_tpu.ops.morton import morton_codes

        xyz = rng.randn(3, 200, 3).astype(np.float32)
        got = np.asarray(morton_codes(jnp.asarray(xyz)))
        np.testing.assert_array_equal(got, self._morton_ref(xyz))

    def test_spatial_order_is_stable_permutation(self, rng):
        from garment4d_tpu.ops.morton import spatial_order

        xyz = rng.randn(2, 150, 3).astype(np.float32)
        xyz[:, 50:60] = xyz[:, 40:50]  # duplicate points -> code ties
        perm = np.asarray(spatial_order(jnp.asarray(xyz)))
        codes = self._morton_ref(xyz)
        for b in range(2):
            assert sorted(perm[b]) == list(range(150))
            np.testing.assert_array_equal(
                perm[b], np.argsort(codes[b], kind="stable"))

    def test_grouped_kernel_on_morton_table(self, rng):
        """A Z-ordered table puts each coherent center tile's hits in a
        narrow group window - the new lo/bound skip logic must still equal
        the golden oracle exactly (the window is a pure perf device)."""
        from garment4d_tpu.ops.morton import spatial_order
        from garment4d_tpu.ops.pallas.ball_query import (
            _ball_query_multi_grouped,
        )

        B, N = 2, 1600
        xyz = rng.randn(B, N, 3).astype(np.float32) * 1.5
        perm = np.asarray(spatial_order(jnp.asarray(xyz)))
        zxyz = np.take_along_axis(xyz, perm[..., None], axis=1)
        # centers clustered near one corner: leading groups of the OTHER
        # corner's points are empty for the whole tile (lo > 0)
        centers = zxyz[:, -80:] + 0.02
        with pltpu.force_tpu_interpret_mode():
            got = _ball_query_multi_grouped(
                (0.25, 0.6), (4, 8), jnp.asarray(zxyz), jnp.asarray(centers),
                tile_m=64)
        for g, (r, s) in zip(got, ((0.25, 4), (0.6, 8))):
            want = ball_query_ref(r, s, zxyz, centers)
            np.testing.assert_array_equal(np.asarray(g), want)

    def test_query_group_pe_multi_spatial_oracle(self, rng):
        """spatial=True == numpy oracle: candidates Morton-ordered, ball
        query over the reordered table, PE math, full-row-0 no-hit fixup."""
        from garment4d_tpu import ops

        B, N, M = 2, 1152, 64
        cap = 896  # round_up(max(int(N*0.72), 256), 128)
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.6
        vn = rng.randn(B, N, 3).astype(np.float32)
        ctr = np.concatenate(
            [xyz[:, :56] * 0.2, np.full((B, 8, 3), 30.0, np.float32)],
            axis=1)  # clustered + no-hit centers
        radii, ss = (0.2, 0.45), (4, 8)
        params = [(rng.randn(6, 32).astype(np.float32) * 0.2,
                   rng.randn(32).astype(np.float32),
                   rng.randn(32, 32).astype(np.float32) * 0.2,
                   rng.randn(32).astype(np.float32)) for _ in ss]
        with pltpu.force_tpu_interpret_mode():
            got = ops.query_group_pe_multi(
                radii, ss, jnp.asarray(xyz), jnp.asarray(ctr),
                jnp.asarray(vn),
                [tuple(jnp.asarray(a) for a in p) for p in params],
                use_pallas=True, spatial=True)

        # ---- numpy oracle ----
        packed = np.concatenate([xyz, vn], axis=-1)
        codes = self._morton_ref(xyz)
        d2 = ((xyz[:, :, None] - ctr[:, None]) ** 2).sum(-1)  # (B, N, M)
        cover = d2.min(-1) < max(radii) ** 2
        assert (cover.sum(1) < cap).all() and (cover.sum(1) > 0).all()
        keys = np.where(cover, codes, np.int32(1 << 30))
        order = np.argsort(keys, kind="stable", axis=1)[:, :cap]
        ctable = np.take_along_axis(xyz, order[..., None], axis=1)
        ctable = np.where(cover.sum(1)[:, None, None]
                          > np.arange(cap)[None, :, None],
                          ctable, np.float32(1e9))
        cpacked = np.take_along_axis(packed, order[..., None], axis=1)
        ctr_pad = np.concatenate(
            [ctr, np.zeros((B, M, 3), np.float32)], axis=-1)
        d0 = ((ctr - ctable[:, 0:1]) ** 2).sum(-1)  # (B, M)
        for g, r, s, (k0, b0, k1, b1) in zip(got, radii, ss, params):
            idx = ball_query_ref(r, s, ctable, ctr)
            rows = np.take_along_axis(
                cpacked, idx.reshape(B, -1, 1), axis=1).reshape(B, M, s, 6)
            qg = rows - ctr_pad[:, :, None, :]
            h = np.maximum(np.einsum("bmsc,cf->bmsf", qg, k0) + b0, 0.0)
            want = np.max(np.einsum("bmsf,fg->bmsg", h, k1) + b1, axis=2)
            no_hit = (idx[:, :, 0] == 0) & ~(d0 < r ** 2)
            qg0 = packed[:, 0][:, None, :] - ctr_pad
            h0 = np.maximum(np.einsum("bmc,cf->bmf", qg0, k0) + b0, 0.0)
            pe0 = np.einsum("bmf,fg->bmg", h0, k1) + b1
            want = np.where(no_hit[..., None], pe0, want)
            np.testing.assert_allclose(np.asarray(g), want,
                                       rtol=1e-4, atol=1e-5)

    def test_center_permutation_invariance(self, rng):
        """Query-center order is semantically free: permuting the centers and
        inverse-gathering the per-center outputs must be BITWISE identical.
        This is the property `PosedGarmentModel(spatial_sample=True)` relies
        on when it Morton-sorts the query centers so the grouped kernel's
        per-tile group windows collapse (the sort is a pure perf device)."""
        from garment4d_tpu import ops
        from garment4d_tpu.ops.morton import spatial_order

        B, N, M = 2, 1152, 64
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.6
        vn = rng.randn(B, N, 3).astype(np.float32)
        ctr = np.concatenate(
            [xyz[:, :56] * 0.2, np.full((B, 8, 3), 30.0, np.float32)],
            axis=1)
        radii, ss = (0.2, 0.45), (4, 8)
        params = [tuple(jnp.asarray(a) for a in (
            rng.randn(6, 32).astype(np.float32) * 0.2,
            rng.randn(32).astype(np.float32),
            rng.randn(32, 32).astype(np.float32) * 0.2,
            rng.randn(32).astype(np.float32))) for _ in ss]
        perm = spatial_order(jnp.asarray(ctr))        # (B, M)
        inv = jnp.argsort(perm, axis=1).astype(jnp.int32)
        sorted_ctr = jnp.take_along_axis(jnp.asarray(ctr),
                                         perm[..., None], axis=1)
        with pltpu.force_tpu_interpret_mode():
            base = ops.query_group_pe_multi(
                radii, ss, jnp.asarray(xyz), jnp.asarray(ctr),
                jnp.asarray(vn), params, use_pallas=True, spatial=True)
            got = ops.query_group_pe_multi(
                radii, ss, jnp.asarray(xyz), sorted_ctr,
                jnp.asarray(vn), params, use_pallas=True, spatial=True)
        for b, g in zip(base, got):
            unperm = jnp.take_along_axis(
                g, jnp.broadcast_to(inv[..., None], g.shape), axis=1)
            np.testing.assert_array_equal(np.asarray(b), np.asarray(unperm))


class TestCandidateReuse:
    """Candidate-set reuse across refinement iterations
    (`query_group_pe_multi(reuse_margin=...)`, PLAN round-2 candidate 3):
    coverage at r_max+margin makes reuse EXACT while centers drift less than
    the margin; a lax.cond rebuilds on larger drift."""

    def _setup(self, rng, B=2, N=1152, M=64):
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.6
        vn = rng.randn(B, N, 3).astype(np.float32)
        ctr = np.concatenate(
            [xyz[:, :56] * 0.2, np.full((B, 8, 3), 30.0, np.float32)],
            axis=1)
        radii, ss = (0.2, 0.45), (4, 8)
        params = [tuple(jnp.asarray(a) for a in (
            rng.randn(6, 32).astype(np.float32) * 0.2,
            rng.randn(32).astype(np.float32),
            rng.randn(32, 32).astype(np.float32) * 0.2,
            rng.randn(32).astype(np.float32))) for _ in ss]
        return (jnp.asarray(xyz), jnp.asarray(ctr), jnp.asarray(vn),
                radii, ss, params)

    def test_reuse_matches_fresh(self, rng):
        from garment4d_tpu import ops

        xyz, ctr0, vn, radii, ss, params = self._setup(rng)
        margin = 0.1
        jitter = jnp.asarray(
            rng.randn(*np.asarray(ctr0).shape).astype(np.float32))

        def fresh(centers):
            return ops.query_group_pe_multi(
                radii, ss, xyz, centers, vn, params, use_pallas=True)

        with pltpu.force_tpu_interpret_mode():
            out0, state = ops.query_group_pe_multi(
                radii, ss, xyz, ctr0, vn, params, use_pallas=True,
                reuse_margin=margin)
            for g, w in zip(out0, fresh(ctr0)):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-5, atol=1e-6)

            # drift below the margin: the REUSED candidate set must still
            # give exactly the fresh-compaction results
            ctr1 = ctr0 + 0.04 * jitter / jnp.maximum(
                jnp.linalg.norm(jitter, axis=-1, keepdims=True), 1e-9)
            out1, state1 = ops.query_group_pe_multi(
                radii, ss, xyz, ctr1, vn, params, use_pallas=True,
                candidates=state, reuse_margin=margin)
            for g, w in zip(out1, fresh(ctr1)):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-5, atol=1e-6)
            # the state was reused, not rebuilt: centers0 is still ctr0
            np.testing.assert_array_equal(np.asarray(state1["centers0"]),
                                          np.asarray(ctr0))

            # drift beyond the margin: rebuild, results still exact and the
            # new state anchors at the moved centers
            ctr2 = ctr0.at[:, :, 0].add(0.3)
            out2, state2 = ops.query_group_pe_multi(
                radii, ss, xyz, ctr2, vn, params, use_pallas=True,
                candidates=state1, reuse_margin=margin)
            for g, w in zip(out2, fresh(ctr2)):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-5, atol=1e-6)
            np.testing.assert_array_equal(np.asarray(state2["centers0"]),
                                          np.asarray(ctr2))

    def test_overflowed_state_rebuilds(self, rng):
        """An overflowed build-time state is pure overhead to carry: reuse
        would pin every call to the full-space branch until drift alone
        exceeded the margin (ADVICE r3 #3). Overflow folds into staleness,
        so the next call re-anchors at ITS centers - observable as
        centers0 following the new centers - and results stay exact."""
        from garment4d_tpu import ops

        B, N, M = 2, 1152, 64
        # dense cluster: every point within cover_r of some center, so the
        # candidate count (~N) blows the cap (256 at this N with a tiny
        # cap_frac) and compaction overflows
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.05)
        ctr0 = xyz[:, :M] * 0.5
        vn = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        radii, ss = (0.2, 0.45), (4, 8)
        params = [tuple(jnp.asarray(a) for a in (
            rng.randn(6, 32).astype(np.float32) * 0.2,
            rng.randn(32).astype(np.float32),
            rng.randn(32, 32).astype(np.float32) * 0.2,
            rng.randn(32).astype(np.float32))) for _ in ss]
        margin = 0.1

        def fresh(centers):
            return ops.query_group_pe_multi(
                radii, ss, xyz, centers, vn, params, cap_frac=0.1,
                use_pallas=True)

        with pltpu.force_tpu_interpret_mode():
            out0, state = ops.query_group_pe_multi(
                radii, ss, xyz, ctr0, vn, params, cap_frac=0.1,
                use_pallas=True, reuse_margin=margin)
            assert bool(np.asarray(state["overflow"])), \
                "setup failed to overflow the candidate cap"
            ctr1 = ctr0 + 0.01
            out1, state1 = ops.query_group_pe_multi(
                radii, ss, xyz, ctr1, vn, params, cap_frac=0.1,
                use_pallas=True, candidates=state, reuse_margin=margin)
            # rebuilt despite sub-margin drift: anchored at the new centers
            np.testing.assert_array_equal(np.asarray(state1["centers0"]),
                                          np.asarray(ctr1))
            for g, w in zip(out1, fresh(ctr1)):
                np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                           rtol=1e-5, atol=1e-6)


class TestFusedPeBackward:
    """Fused VMEM-resident backward of group_pe_max (ops/pallas/fusedpe.py:
    fused_pe_bwd_pallas) == jax.vjp of the unfused reference, including the
    even-split-among-ties max routing that slot replication makes common."""

    def _case(self, rng, B=2, N=300, M=150, S=8, C=6, F=32, G=32):
        table = rng.randn(B, N, C).astype(np.float32)
        centers = rng.randn(B, M, 3).astype(np.float32)
        # replicated slots (the CUDA prefill convention): guaranteed ties
        idx = rng.randint(0, N, (B, M, S)).astype(np.int32)
        idx[:, :, S // 2:] = idx[:, :, :1]  # half the slots replicate slot 0
        k0 = rng.randn(C, F).astype(np.float32) * 0.3
        b0 = rng.randn(F).astype(np.float32) * 0.1
        k1 = rng.randn(F, G).astype(np.float32) * 0.3
        b1 = rng.randn(G).astype(np.float32) * 0.1
        cot = rng.randn(B, M, G).astype(np.float32)
        return table, idx, centers, k0, b0, k1, b1, cot

    def test_matches_reference_vjp(self, rng):
        from garment4d_tpu.ops.pallas.fusedpe import fused_pe_bwd_pallas
        from garment4d_tpu.ops.pemax import _pe_reference

        table, idx, centers, k0, b0, k1, b1, cot = self._case(rng)
        args = tuple(jnp.asarray(a) for a in (table, centers, k0, b0, k1, b1))
        idx_j, cot_j = jnp.asarray(idx), jnp.asarray(cot)

        _, vjp = jax.vjp(
            lambda t, c, a0, a1, a2, a3: _pe_reference(
                t, idx_j, c, a0, a1, a2, a3), *args)
        want = vjp(cot_j)

        with pltpu.force_tpu_interpret_mode():
            got = fused_pe_bwd_pallas(*args[:2][:1], idx_j, args[1],
                                      *args[2:], int(idx.shape[2]), cot_j)
        # weight/bias grads sum ~B*M*S cancelling terms: their absolute
        # tolerance reflects f32 accumulation-order noise (kernel tiles vs
        # one einsum), not routing differences (those would be O(1))
        names = ("dtable", "dcenters", "dk0", "db0", "dk1", "db1")
        atols = (2e-6, 2e-6, 1e-4, 1e-4, 1e-4, 1e-4)
        for name, a, b, atol in zip(names, got, want, atols):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=atol,
                err_msg=f"{name} diverges from reference VJP")

    def test_no_table_grad_matches_reference_vjp(self, rng):
        """table_grad=False kernel: identical (dcenters, dk0, db0, dk1, db1)
        to the reference VJP, no dtable output (the posed stage's body PE
        tables are batch data — their dtable scatter is skipped)."""
        from garment4d_tpu.ops.pallas.fusedpe import fused_pe_bwd_pallas
        from garment4d_tpu.ops.pemax import _pe_reference

        table, idx, centers, k0, b0, k1, b1, cot = self._case(rng)
        args = tuple(jnp.asarray(a) for a in (table, centers, k0, b0, k1, b1))
        idx_j, cot_j = jnp.asarray(idx), jnp.asarray(cot)

        _, vjp = jax.vjp(
            lambda c, a0, a1, a2, a3: _pe_reference(
                args[0], idx_j, c, a0, a1, a2, a3), *args[1:])
        want = vjp(cot_j)

        with pltpu.force_tpu_interpret_mode():
            got = fused_pe_bwd_pallas(args[0], idx_j, args[1], *args[2:],
                                      int(idx.shape[2]), cot_j,
                                      table_grad=False)
        assert len(got) == 5
        names = ("dcenters", "dk0", "db0", "dk1", "db1")
        atols = (2e-6, 1e-4, 1e-4, 1e-4, 1e-4)
        for name, a, b, atol in zip(names, got, want, atols):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-5, atol=atol,
                err_msg=f"{name} diverges from reference VJP")

    def test_group_pe_max_no_table_grad_end_to_end(self, rng):
        """ops.group_pe_max(table_grad=False): zero table cotangent, all
        other grads equal to the default path's."""
        from garment4d_tpu import ops

        table, idx, centers, k0, b0, k1, b1, cot = self._case(
            rng, B=1, N=120, M=40, S=4)
        args = tuple(jnp.asarray(a) for a in (table, centers, k0, b0, k1, b1))
        idx_j, cot_j = jnp.asarray(idx), jnp.asarray(cot)

        def loss(table_grad, t, c, a0, a1, a2, a3):
            return jnp.sum(ops.group_pe_max(t, idx_j, c, a0, a1, a2, a3,
                                            table_grad=table_grad) * cot_j)

        g_nt = jax.grad(functools.partial(loss, False),
                        argnums=tuple(range(6)))(*args)
        g_full = jax.grad(functools.partial(loss, True),
                          argnums=tuple(range(6)))(*args)
        np.testing.assert_array_equal(np.asarray(g_nt[0]), 0.0)
        for a, b in zip(g_nt[1:], g_full[1:]):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_group_pe_max_split_frozen(self, rng):
        """Split-projected fwd == unsplit fwd; grads w.r.t. (centers, k0,
        b0, k1, b1) == unsplit reference VJP; frozen inputs get zeros
        (the garment-PE pattern: SplitQueryGroupPE over stage-1 levels)."""
        from garment4d_tpu import ops
        from garment4d_tpu.ops.pemax import _pe_reference

        B, N, M, S, C, F = 1, 120, 40, 4, 9, 32
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(B, N, C).astype(np.float32))
        centers = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
        idx_np = rng.randint(0, N, (B, M, S)).astype(np.int32)
        idx_np[:, :, S // 2:] = idx_np[:, :, :1]
        idx = jnp.asarray(idx_np)
        k0 = jnp.asarray(rng.randn(3 + C, F).astype(np.float32) * 0.3)
        b0 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)
        k1 = jnp.asarray(rng.randn(F, F).astype(np.float32) * 0.3)
        b1 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.randn(B, M, F).astype(np.float32))
        table = jnp.concatenate([xyz, feats], axis=-1)

        out = ops.group_pe_max_split_frozen(xyz, feats, idx, centers,
                                            k0, b0, k1, b1)
        want_out = _pe_reference(table, idx, centers, k0, b0, k1, b1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want_out),
                                   rtol=1e-5, atol=1e-6)

        def loss(x, f, c, a0, a1, a2, a3):
            return jnp.sum(ops.group_pe_max_split_frozen(
                x, f, idx, c, a0, a1, a2, a3) * cot)

        grads = jax.grad(loss, argnums=tuple(range(7)))(
            xyz, feats, centers, k0, b0, k1, b1)
        np.testing.assert_array_equal(np.asarray(grads[0]), 0.0)
        np.testing.assert_array_equal(np.asarray(grads[1]), 0.0)

        def ref_loss(c, a0, a1, a2, a3):
            return jnp.sum(_pe_reference(table, idx, c, a0, a1, a2, a3)
                           * cot)

        want = jax.grad(ref_loss, argnums=tuple(range(5)))(
            centers, k0, b0, k1, b1)
        for a, b in zip(grads[2:], want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-5)

    def test_group_pe_max_grads_use_kernel_path_semantics(self, rng):
        """End-to-end custom_vjp: grads of ops.group_pe_max == grads of the
        reference formulation (CPU fallback path exercises _pe_bwd's
        reference branch; the kernel branch is covered above and by
        tools/verify_tpu.py on the chip)."""
        from garment4d_tpu import ops
        from garment4d_tpu.ops.pemax import _pe_reference

        table, idx, centers, k0, b0, k1, b1, cot = self._case(
            rng, B=1, N=120, M=40, S=4)
        args = tuple(jnp.asarray(a) for a in (table, centers, k0, b0, k1, b1))
        idx_j, cot_j = jnp.asarray(idx), jnp.asarray(cot)

        def loss_fused(t, c, a0, a1, a2, a3):
            return jnp.sum(ops.group_pe_max(t, idx_j, c, a0, a1, a2, a3)
                           * cot_j)

        def loss_ref(t, c, a0, a1, a2, a3):
            return jnp.sum(_pe_reference(t, idx_j, c, a0, a1, a2, a3) * cot_j)

        g_fused = jax.grad(loss_fused, argnums=tuple(range(6)))(*args)
        g_ref = jax.grad(loss_ref, argnums=tuple(range(6)))(*args)
        for a, b in zip(g_fused, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)


class TestMxuDistanceBallQuery:
    """MXU expansion-form phase-1 distances in the grouped kernel
    (`_bq_grouped_kernel` mxu_dist): bitwise == the exact VPU diff form,
    including on data engineered to land in the ambiguity band (forcing the
    per-group exact fallback) and on sentinel-padded dynamic tables."""

    def _run_both(self, xyz, centers, radii, ss, nv=None):
        from garment4d_tpu.ops.pallas.ball_query import (
            _ball_query_multi_grouped,
        )

        with pltpu.force_tpu_interpret_mode():
            exact = _ball_query_multi_grouped(
                radii, ss, jnp.asarray(xyz), jnp.asarray(centers),
                n_valid_dyn=nv, mxu_dist=False)
            mxu = _ball_query_multi_grouped(
                radii, ss, jnp.asarray(xyz), jnp.asarray(centers),
                n_valid_dyn=nv, mxu_dist=True)
        for e, m in zip(exact, mxu):
            np.testing.assert_array_equal(np.asarray(m), np.asarray(e))

    def test_random_cloud_bitwise(self, rng):
        xyz = rng.randn(2, 1536, 3).astype(np.float32) * 0.3
        centers = xyz[:, ::4][:, :130] + \
            rng.randn(2, 130, 3).astype(np.float32) * 0.02
        self._run_both(xyz, centers, (0.1, 0.2, 0.4), (4, 8, 16))

    def test_band_trigger_bitwise(self, rng):
        # points placed EXACTLY at the radius boundary (and eps-close to
        # it), so the expansion-form membership is genuinely ambiguous and
        # the kernel must take the exact fallback to stay bitwise
        r = 0.2
        centers = rng.randn(1, 64, 3).astype(np.float32) * 0.3
        base = rng.randn(1, 1536, 3).astype(np.float32) * 0.3
        # sprinkle boundary points around the first 32 centers
        dirs = rng.randn(32, 3).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        for i in range(32):
            for j, off in enumerate((0.0, 1e-7, -1e-7, 3e-6)):
                base[0, i * 8 + j] = centers[0, i] + (r + off) * dirs[i]
        self._run_both(base, centers, (0.2, 0.4), (8, 16))

    def test_sentinel_padded_dynamic(self, rng):
        xyz = rng.randn(2, 1536, 3).astype(np.float32) * 0.3
        nv = np.asarray([1100, 600], np.int32)
        lanei = np.arange(1536)[None, :, None]
        xyz = np.where(lanei < nv[:, None, None], xyz, 1e9).astype(np.float32)
        centers = rng.randn(2, 100, 3).astype(np.float32) * 0.3
        self._run_both(xyz, centers, (0.1, 0.2, 0.4), (4, 8, 16),
                       nv=jnp.asarray(nv))


class TestNN1Kernel:
    """Fused 1-NN kernel (`ops/pallas/nn1.py`) vs the XLA exact form:
    squared distances, argmin's first-occurrence tie rule, and the
    custom_vjp backward vs autodiff of the XLA path."""

    def _ref(self, q, p):
        d2 = np.sum((q[:, :, None].astype(np.float64)
                     - p[:, None].astype(np.float64)) ** 2, -1)
        return d2.min(-1), d2.argmin(-1)

    def test_matches_argmin(self, rng):
        from garment4d_tpu.ops.pallas.nn1 import nn1_pallas

        q = rng.randn(2, 300, 3).astype(np.float32) * 0.3
        p = rng.randn(2, 700, 3).astype(np.float32) * 0.3
        with pltpu.force_tpu_interpret_mode():
            d2, idx = jax.jit(nn1_pallas)(jnp.asarray(q), jnp.asarray(p))
        want_d, want_i = self._ref(q, p)
        np.testing.assert_array_equal(np.asarray(idx), want_i)
        np.testing.assert_allclose(np.asarray(d2), want_d, rtol=1e-5,
                                   atol=1e-7)

    def test_tie_breaks_to_first(self, rng):
        from garment4d_tpu.ops.pallas.nn1 import nn1_pallas

        q = np.zeros((1, 130, 3), np.float32)
        p = rng.randn(1, 520, 3).astype(np.float32)
        # rows 0/1: exact duplicate points -> lower index must win
        p[0, 7] = p[0, 3] = [0.5, 0, 0]
        q[0, 1] = [0.55, 0, 0]
        with pltpu.force_tpu_interpret_mode():
            _, idx = jax.jit(nn1_pallas)(jnp.asarray(q), jnp.asarray(p))
        assert np.asarray(idx)[0, 1] == 3

    def test_grads_match_xla(self, rng):
        from garment4d_tpu.ops import pointcloud as pc
        from garment4d_tpu.ops.pallas.nn1 import nn1_pallas

        q = rng.randn(1, 140, 3).astype(np.float32) * 0.3
        p = rng.randn(1, 600, 3).astype(np.float32) * 0.3

        def loss_kernel(q, p):
            d2, _ = nn1_pallas(q, p)
            return jnp.sum(jnp.sin(d2))

        def loss_xla(q, p):
            res = pc.knn_points(q, p, K=1, exact=True, use_pallas=False)
            return jnp.sum(jnp.sin(res.dists[..., 0]))

        with pltpu.force_tpu_interpret_mode():
            gq, gp = jax.grad(loss_kernel, argnums=(0, 1))(
                jnp.asarray(q), jnp.asarray(p))
        gq_ref, gp_ref = jax.grad(loss_xla, argnums=(0, 1))(
            jnp.asarray(q), jnp.asarray(p))
        np.testing.assert_allclose(np.asarray(gq), np.asarray(gq_ref),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(gp), np.asarray(gp_ref),
                                   rtol=1e-5, atol=1e-6)
