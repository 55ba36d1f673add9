"""Golden tests for the geometry op layer against numpy references."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from garment4d_tpu import ops
from garment4d_tpu.ops.pointcloud import _fps_xla

from golden import ball_query_ref, fps_ref, knn_ref, three_nn_ref


def make_cloud(rng, B=2, N=300):
    return rng.randn(B, N, 3).astype(np.float32)


class TestFPS:
    def test_matches_golden(self, rng):
        xyz = make_cloud(rng, B=2, N=200)
        got = np.asarray(_fps_xla(jnp.asarray(xyz), 32))
        want = fps_ref(xyz, 32)
        np.testing.assert_array_equal(got, want)

    def test_starts_at_zero_and_unique(self, rng):
        xyz = make_cloud(rng, B=1, N=500)
        got = np.asarray(_fps_xla(jnp.asarray(xyz), 64))
        assert got[0, 0] == 0
        assert len(set(got[0].tolist())) == 64

    def test_npoint_one(self, rng):
        xyz = make_cloud(rng, B=3, N=50)
        got = np.asarray(_fps_xla(jnp.asarray(xyz), 1))
        np.testing.assert_array_equal(got, np.zeros((3, 1), np.int32))


class TestBallQuery:
    @pytest.mark.parametrize("radius,nsample", [(0.5, 8), (1.0, 16), (0.1, 4)])
    def test_matches_golden(self, rng, radius, nsample):
        xyz = make_cloud(rng, B=2, N=150)
        new_xyz = xyz[:, :40, :]
        got = np.asarray(ops.ball_query(radius, nsample, jnp.asarray(xyz), jnp.asarray(new_xyz)))
        want = ball_query_ref(radius, nsample, xyz, new_xyz)
        np.testing.assert_array_equal(got, want)

    def test_no_hits_gives_zero(self, rng):
        xyz = np.ones((1, 10, 3), np.float32) * 100.0
        centers = np.zeros((1, 3, 3), np.float32)
        got = np.asarray(ops.ball_query(0.1, 4, jnp.asarray(xyz), jnp.asarray(centers)))
        np.testing.assert_array_equal(got, np.zeros((1, 3, 4), np.int32))

    def test_chunked_equals_unchunked(self, rng):
        xyz = make_cloud(rng, B=2, N=128)
        new_xyz = make_cloud(rng, B=2, N=64)
        a = ops.ball_query(0.8, 8, jnp.asarray(xyz), jnp.asarray(new_xyz), chunk=16)
        b = ops.ball_query(0.8, 8, jnp.asarray(xyz), jnp.asarray(new_xyz), chunk=1024)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestThreeNN:
    def test_matches_golden(self, rng):
        unknown = make_cloud(rng, B=2, N=100)
        known = make_cloud(rng, B=2, N=37)
        dist, idx = ops.three_nn(jnp.asarray(unknown), jnp.asarray(known))
        want_dist, want_idx = three_nn_ref(unknown, known)
        np.testing.assert_array_equal(np.asarray(idx), want_idx)
        np.testing.assert_allclose(np.asarray(dist), want_dist, rtol=1e-4, atol=1e-5)


class TestKnn:
    @pytest.mark.parametrize("K", [1, 3, 16])
    def test_exact_matches_golden(self, rng, K):
        q = make_cloud(rng, B=2, N=64)
        p = make_cloud(rng, B=2, N=90)
        res = ops.knn_points(jnp.asarray(q), jnp.asarray(p), K=K, exact=True)
        want_d, want_i = knn_ref(q, p, K)
        np.testing.assert_array_equal(np.asarray(res.idx), want_i)
        np.testing.assert_allclose(np.asarray(res.dists), want_d, rtol=1e-4, atol=1e-5)

    def test_mxu_form_close(self, rng):
        # matmul-form distances may permute near-ties but must agree in value
        q = make_cloud(rng, B=2, N=64)
        p = make_cloud(rng, B=2, N=90)
        res = ops.knn_points(jnp.asarray(q), jnp.asarray(p), K=8)
        want_d, _ = knn_ref(q, p, 8)
        np.testing.assert_allclose(np.asarray(res.dists), want_d, rtol=1e-3, atol=1e-4)

    def test_chunked(self, rng):
        q = make_cloud(rng, B=1, N=64)
        p = make_cloud(rng, B=1, N=50)
        a = ops.knn_points(jnp.asarray(q), jnp.asarray(p), K=4, chunk=16)
        b = ops.knn_points(jnp.asarray(q), jnp.asarray(p), K=4, chunk=1024)
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))

    def test_k1_tie_breaks_to_first(self, rng):
        # K=1's two-reduce form (min + first-lane-where-equal, replacing the
        # kLoop variadic argmin) must keep argmin's first-occurrence tie rule
        q = np.zeros((1, 3, 3), np.float32)
        p = np.zeros((1, 8, 3), np.float32)
        p[0, :, 0] = [5.0, 2.0, 2.0, 7.0, 2.0, 9.0, 1.5, 1.5]
        q[0, :, 0] = [0.0, 2.0, 100.0]  # ties at idx 1/2/4 and 6/7
        res = ops.knn_points(jnp.asarray(q), jnp.asarray(p), K=1, exact=True)
        d2 = np.sum((q[:, :, None] - p[:, None]) ** 2, -1)
        np.testing.assert_array_equal(
            np.asarray(res.idx)[..., 0], d2.argmin(-1))
        assert np.asarray(res.idx)[0, 0, 0] == 6  # the tie, lowest index
        assert np.asarray(res.idx)[0, 1, 0] == 1


class TestGatherGroup:
    def test_gather(self, rng):
        pts = rng.randn(2, 20, 5).astype(np.float32)
        idx = rng.randint(0, 20, size=(2, 7)).astype(np.int32)
        got = np.asarray(ops.gather_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b]] for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group(self, rng):
        pts = rng.randn(2, 20, 5).astype(np.float32)
        idx = rng.randint(0, 20, size=(2, 7, 3)).astype(np.int32)
        got = np.asarray(ops.group_points(jnp.asarray(pts), jnp.asarray(idx)))
        want = np.stack([pts[b][idx[b].reshape(-1)].reshape(7, 3, 5) for b in range(2)])
        np.testing.assert_array_equal(got, want)

    def test_group_grad_deterministic(self, rng):
        pts = jnp.asarray(rng.randn(1, 10, 4).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 10, size=(1, 5, 3)).astype(np.int32))

        def f(p):
            return jnp.sum(ops.group_points(p, idx) ** 2)

        g1 = jax.grad(f)(pts)
        g2 = jax.grad(f)(pts)
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))


class TestInterpolate:
    def test_three_interpolate(self, rng):
        feats = rng.randn(2, 12, 6).astype(np.float32)
        idx = rng.randint(0, 12, size=(2, 30, 3)).astype(np.int32)
        w = rng.rand(2, 30, 3).astype(np.float32)
        got = np.asarray(ops.three_interpolate(jnp.asarray(feats), jnp.asarray(idx), jnp.asarray(w)))
        want = np.einsum("bnkc,bnk->bnc",
                         np.stack([feats[b][idx[b].reshape(-1)].reshape(30, 3, 6) for b in range(2)]),
                         w)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def test_three_interpolate_cf_path(self, rng):
        """The TPU channel-first K-major formulation == the reference
        formulation, values and gradients."""
        feats = jnp.asarray(rng.randn(2, 12, 8), jnp.float32)  # C % 8 == 0
        idx = jnp.asarray(rng.randint(0, 12, size=(2, 30, 3)), jnp.int32)
        w = jnp.asarray(rng.rand(2, 30, 3), jnp.float32)

        ref = ops.three_interpolate(feats, idx, w, use_cf=False)
        cf = ops.three_interpolate(feats, idx, w, use_cf=True)
        np.testing.assert_allclose(np.asarray(cf), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

        def loss(f, w, cf_flag):
            return jnp.sum(
                ops.three_interpolate(f, idx, w, use_cf=cf_flag) ** 2)

        gr = jax.grad(loss, argnums=(0, 1))(feats, w, False)
        gc = jax.grad(loss, argnums=(0, 1))(feats, w, True)
        for a, b in zip(gc, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)

    def test_weights(self):
        dist = jnp.asarray([[[1.0, 2.0, 4.0]]])
        w = np.asarray(ops.interp_weights_from_dists(dist))
        recip = 1.0 / (np.array([1.0, 2.0, 4.0]) + 1e-8)
        np.testing.assert_allclose(w[0, 0], recip / recip.sum(), rtol=1e-6)


class TestQueryAndGroup:
    def test_centred_xyz(self, rng):
        xyz = make_cloud(rng, B=1, N=50)
        centers = xyz[:, :10, :]
        out = np.asarray(ops.query_and_group(0.7, 8, jnp.asarray(xyz), jnp.asarray(centers)))
        assert out.shape == (1, 10, 8, 3)
        # every grouped point must be within the radius of its (centred) origin
        idx = np.asarray(ops.ball_query(0.7, 8, jnp.asarray(xyz), jnp.asarray(centers)))
        has_hit = (np.sum((xyz[0][:, None] - centers[0][None]) ** 2, -1).T < 0.49).any(-1)
        norms = np.linalg.norm(out[0], axis=-1)
        assert (norms[has_hit] < 0.7 + 1e-5).all()

    def test_group_all(self, rng):
        xyz = make_cloud(rng, B=2, N=30)
        feats = rng.randn(2, 30, 8).astype(np.float32)
        out = np.asarray(ops.group_all(jnp.asarray(xyz), jnp.asarray(feats)))
        assert out.shape == (2, 1, 30, 11)
        np.testing.assert_array_equal(out[:, 0, :, :3], xyz)
        np.testing.assert_array_equal(out[:, 0, :, 3:], feats)


class TestGraph:
    def test_adjacency_matches_reference_coo_on_mixed_faces(self):
        """Oracle reproducing the reference construction verbatim
        (`mesh_encoder.py:288-306`): zero-initialised (2, F*4) edge buffer
        (tri faces leave slot i*4+2 at [0,0]), duplicate-summing coo build,
        add/multiply max-symmetrisation, then normalize(adj + I). Asserts
        exact equality on a template mixing quads, tris, a duplicated
        directed edge, and vertex 0 in a face."""
        import scipy.sparse as sp

        faces = [[0, 1, 2, 3], [1, 4, 5, 2], [2, 5, 6], [6, 5, 4],
                 [3, 2, 6], [1, 4, 5, 2]]  # repeated quad: summed duplicates
        V = 7
        edges = np.zeros([2, len(faces) * 4], dtype=np.int32)
        for i, f in enumerate(faces):
            if len(f) == 4:
                edges[:, i * 4 + 0] = [f[0], f[1]]
                edges[:, i * 4 + 1] = [f[1], f[2]]
                edges[:, i * 4 + 2] = [f[2], f[3]]
                edges[:, i * 4 + 3] = [f[3], f[0]]
            else:
                edges[:, i * 4 + 0] = [f[0], f[1]]
                edges[:, i * 4 + 1] = [f[1], f[2]]
                edges[:, i * 4 + 3] = [f[2], f[0]]
        ref = sp.coo_matrix((np.ones(edges.shape[1]), (edges[0], edges[1])),
                            shape=(V, V), dtype=np.float32)
        ref = (ref + ref.T.multiply(ref.T > ref) - ref.multiply(ref.T > ref))
        ref_gcn = ref + sp.eye(V)
        rowsum = np.asarray(ref_gcn.sum(1)).ravel()
        r_inv = np.power(rowsum, -1.0)
        r_inv[np.isinf(r_inv)] = 0.0
        ref_gcn = sp.diags(r_inv).dot(ref_gcn).toarray().astype(np.float32)

        adj = ops.build_mesh_adjacency(faces, V)
        np.testing.assert_array_equal(adj, ref.toarray().astype(np.float32))
        np.testing.assert_allclose(ops.gcn_adjacency(adj), ref_gcn,
                                   rtol=0, atol=1e-7)
        # the tri-face quirk is present: spurious (0,0) self-edges
        assert adj[0, 0] == 3.0  # three tri faces
        # and the duplicated quad produced a summed weight
        assert adj[1, 4] == 2.0

    def test_adjacency_quads(self):
        faces = [[0, 1, 2, 3], [1, 4, 5, 2]]
        adj = ops.build_mesh_adjacency(faces, 6)
        assert adj[0, 1] == 1.0 and adj[1, 0] == 1.0
        assert adj[3, 0] == 1.0 and adj[2, 5] == 1.0
        assert adj[0, 4] == 0.0
        np.testing.assert_array_equal(adj, adj.T)

    def test_row_normalize(self):
        adj = np.array([[0, 1, 1], [1, 0, 0], [0, 0, 0]], np.float32)
        norm = ops.row_normalize(adj)
        np.testing.assert_allclose(norm.sum(1), [1.0, 1.0, 0.0], atol=1e-6)

    def test_smoothing_operator_matches_loop(self):
        rng = np.random.RandomState(1)
        faces = [[0, 1, 2], [1, 2, 3], [2, 3, 4], [3, 4, 0]]
        adj = ops.build_mesh_adjacency(faces, 5)
        op = ops.smoothing_operator(adj, coeff=0.1, iters=100)
        w = rng.rand(5, 7).astype(np.float64)
        m = ops.row_normalize(adj).astype(np.float64) - np.eye(5)
        w_loop = w.copy()
        for _ in range(100):
            w_loop = w_loop + 0.1 * (m @ w_loop)
        np.testing.assert_allclose(op @ w, w_loop, rtol=1e-4, atol=1e-6)

    def test_graph_matmul_batched(self, rng):
        adj = rng.rand(6, 6).astype(np.float32)
        x = rng.randn(2, 3, 6, 4).astype(np.float32)
        got = np.asarray(ops.graph_matmul(jnp.asarray(adj), jnp.asarray(x)))
        want = np.einsum("vw,btwc->btvc", adj, x)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestPallasFPSInterpret:
    def test_interpret_mode_matches_golden(self, rng):
        from jax.experimental.pallas import tpu as pltpu
        from garment4d_tpu.ops.pallas.fps import fps_pallas

        xyz = make_cloud(rng, B=2, N=200)
        with pltpu.force_tpu_interpret_mode():
            got = np.asarray(fps_pallas(jnp.asarray(xyz), 16))
        want = fps_ref(xyz, 16)
        np.testing.assert_array_equal(got, want)


class TestPrunedQueryGroup:
    def _want(self, radii, ns, xyz, new_xyz, feats):
        idxs = ops.ball_query_multi(radii, ns, jnp.asarray(xyz),
                                    jnp.asarray(new_xyz), use_pallas=False)
        return [np.asarray(ops.group_points(jnp.asarray(feats), i))
                for i in idxs]

    def test_matches_plain_query_group(self, rng):
        """Candidate compaction is a pure perf path: grouped features must
        equal the full-space query+group bit-for-bit, including no-hit
        centers (full-space row 0) and centers whose first hit is row 0."""
        B, N, M = 2, 1536, 64
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.5
        # center 0 sits exactly on point 0 (first-hit-at-0 case); last
        # center is far away (no-hit case)
        new_xyz = rng.randn(B, M, 3).astype(np.float32) * 0.5
        new_xyz[:, 0] = xyz[:, 0]
        new_xyz[:, -1] = 50.0
        feats = rng.randn(B, N, 5).astype(np.float32)
        radii, ns = (0.2, 0.4), (4, 8)
        got = ops.query_group_pruned_multi(radii, ns, jnp.asarray(xyz),
                                           jnp.asarray(new_xyz),
                                           jnp.asarray(feats), cap_frac=0.5)
        for g, w in zip(got, self._want(radii, ns, xyz, new_xyz, feats)):
            np.testing.assert_allclose(np.asarray(g), w, rtol=1e-6)

    def test_gradient_matches_plain(self, rng):
        B, N, M = 1, 1100, 32
        xyz = rng.randn(B, N, 3).astype(np.float32) * 0.4
        new_xyz = rng.randn(B, M, 3).astype(np.float32) * 0.4
        feats = rng.randn(B, N, 4).astype(np.float32)
        radii, ns = (0.3,), (4,)

        def via_pruned(f):
            return sum(jnp.sum(g) for g in ops.query_group_pruned_multi(
                radii, ns, jnp.asarray(xyz), jnp.asarray(new_xyz), f))

        def via_plain(f):
            idxs = ops.ball_query_multi(radii, ns, jnp.asarray(xyz),
                                        jnp.asarray(new_xyz))
            return sum(jnp.sum(ops.group_points(f, i)) for i in idxs)

        g1 = jax.grad(via_pruned)(jnp.asarray(feats))
        g2 = jax.grad(via_plain)(jnp.asarray(feats))
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
