"""On-TPU Pallas-kernel parity runner.

CI runs the Pallas kernels only in interpret mode on CPU
(tests/test_pallas_kernels.py); this script is the checked-in one-command
verification that the MOSAIC-COMPILED kernels - the thing that actually
ships - still match their pure-XLA fallbacks on the real chip at production
shapes. Run after any kernel edit:

    python tools/verify_tpu.py            # all checks
    python tools/verify_tpu.py gather fps # substring-filtered subset

Prints a pass/fail table and exits non-zero on any failure. Every check
computes the Pallas path and the XLA fallback on the SAME device inputs and
compares on host (indices exactly, floats to tolerance).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _key(i):
    import jax

    return jax.random.PRNGKey(i)


class Runner:
    def __init__(self, names):
        self.names = names
        self.rows = []

    def want(self, name):
        return not self.names or any(f in name for f in self.names)

    def check(self, name, fn):
        if not self.want(name):
            return
        t0 = time.time()
        try:
            fn()
            self.rows.append((name, "PASS", "", time.time() - t0))
            print(f"  PASS  {name}  ({time.time() - t0:.1f}s)", flush=True)
        except Exception as err:  # noqa: BLE001 - report and continue
            msg = f"{type(err).__name__}: {str(err)[:160]}"
            self.rows.append((name, "FAIL", msg, time.time() - t0))
            print(f"  FAIL  {name}: {msg}", flush=True)

    def summary(self) -> int:
        failed = [r for r in self.rows if r[1] == "FAIL"]
        print(f"\n{'check':<42} {'result':<7} detail")
        for name, res, msg, dt in self.rows:
            print(f"{name:<42} {res:<7} {msg}")
        print(f"\n{len(self.rows) - len(failed)}/{len(self.rows)} checks pass")
        return 1 if failed else 0


def main():
    names = [a for a in sys.argv[1:] if not a.startswith("-")]

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_garment4d")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        print(f"backend is {jax.default_backend()}, not tpu - this runner "
              "verifies the compiled kernels on the real chip; CI interpret-"
              "mode coverage is tests/test_pallas_kernels.py")
        return 2

    from garment4d_tpu import ops
    from garment4d_tpu.ops import pointcloud as pc

    r = Runner(names)
    rng = np.random.RandomState(0)

    # production shapes: body N=6890, garment Vg=2000, B small for runtime
    B, N, Vg = 2, 6890, 2000
    body = jnp.asarray(rng.randn(B, N, 3).astype(np.float32) * 0.3)
    garment = jnp.asarray(rng.randn(B, Vg, 3).astype(np.float32) * 0.3)

    def close(a, b, tol=1e-5, exact=False):
        a, b = np.asarray(a), np.asarray(b)
        if exact:
            mism = np.sum(a != b)
            assert mism == 0, f"{mism}/{a.size} elements differ"
        else:
            np.testing.assert_allclose(a, b, rtol=tol, atol=tol)

    # ---- FPS -------------------------------------------------------------
    def fps():
        got = pc.furthest_point_sample(body, 1024, use_pallas=True)
        want = pc._fps_xla(body, 1024)
        close(got, want, exact=True)

    r.check("fps (N=6890 -> 1024)", fps)

    # ---- ball query: flat multi-radius ------------------------------------
    def bq_flat():
        from garment4d_tpu.ops.pallas.ball_query import ball_query_multi_pallas

        centers = pc.gather_points(body, pc._fps_xla(body, 1024))
        got = ball_query_multi_pallas((0.05, 0.1), (16, 32), body, centers)
        want = pc.ball_query_multi((0.05, 0.1), (16, 32), body, centers,
                                   use_pallas=False)
        for g, w in zip(got, want):
            close(g, w, exact=True)

    r.check("ball_query flat multi-radius", bq_flat)

    # ---- ball query: group-bounded + dynamic valid counts ------------------
    def bq_grouped():
        from garment4d_tpu.ops.pallas.ball_query import ball_query_multi_pallas

        # garment-vertex centers (tile-coherent), body table with a sentinel
        # tail after a per-frame dynamic count
        nv = jnp.asarray([5000, 6100], jnp.int32)
        lane = jnp.arange(N)[None, :, None]
        table = jnp.where(lane < nv[:, None, None], body, jnp.float32(1e9))
        got = ball_query_multi_pallas((0.1, 0.2, 0.4), (8, 16, 32),
                                      table, garment, grouped=True,
                                      n_valid_dyn=nv)
        want = pc.ball_query_multi((0.1, 0.2, 0.4), (8, 16, 32), table,
                                   garment, use_pallas=False)
        for g, w in zip(got, want):
            close(g, w, exact=True)

    r.check("ball_query grouped + dyn-valid", bq_grouped)

    # ---- ball query: MXU expansion-form distances --------------------------
    def bq_mxu():
        from garment4d_tpu.ops.pallas.ball_query import ball_query_multi_pallas

        # same setup as bq_grouped, PLUS engineered boundary points so the
        # expansion-form ambiguity band genuinely fires on chip (compiled
        # bf16 MXU splits, not interpret-mode f64 emulation)
        nv = jnp.asarray([5000, 6100], jnp.int32)
        tb = np.array(body)
        gm = np.array(garment)
        dirs = np.asarray(rng.randn(32, 3), np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        for i in range(32):
            for j, off in enumerate((0.0, 1e-7, -1e-7, 3e-6)):
                tb[:, i * 8 + j] = gm[:, i] + (0.2 + off) * dirs[i]
        lane = np.arange(N)[None, :, None]
        table = jnp.asarray(np.where(lane < np.asarray(nv)[:, None, None],
                                     tb, 1e9).astype(np.float32))
        exact = ball_query_multi_pallas((0.1, 0.2, 0.4), (8, 16, 32),
                                        table, garment, grouped=True,
                                        n_valid_dyn=nv, mxu_dist=False)
        mxu = ball_query_multi_pallas((0.1, 0.2, 0.4), (8, 16, 32),
                                      table, garment, grouped=True,
                                      n_valid_dyn=nv, mxu_dist=True)
        for g, w in zip(mxu, exact):
            close(g, w, exact=True)

    r.check("ball_query grouped MXU-dist vs exact", bq_mxu)

    # ---- fused 1-NN (squared dist + first-occurrence argmin) ---------------
    def nn1():
        from garment4d_tpu.ops.pallas.nn1 import nn1_pallas

        q = garment  # (B, Vg, 3) garment verts vs the body table
        d2k, idxk = jax.jit(nn1_pallas)(q, body)
        d2w = pc.pairwise_sqdist(q, body, exact=True)
        close(idxk, jnp.argmin(d2w, axis=-1).astype(jnp.int32), exact=True)
        close(d2k, jnp.min(d2w, axis=-1), tol=1e-6)
        # backward: the dq path vs autodiff of the XLA exact form
        gk = jax.grad(lambda a: jnp.sum(jnp.sin(nn1_pallas(a, body)[0])))(q)
        gw = jax.grad(lambda a: jnp.sum(jnp.sin(jnp.min(
            pc.pairwise_sqdist(a, body, exact=True), axis=-1))))(q)
        close(gk, gw, tol=1e-5)

    r.check("fused 1-NN kernel vs XLA exact", nn1)


    # ---- coverage mask -----------------------------------------------------
    def coverage():
        from garment4d_tpu.ops.pallas.coverage import covered_mask_pallas

        got = covered_mask_pallas(body, garment, 0.4)
        d2 = pc.pairwise_sqdist(garment, body, exact=True)  # (B, M, N)
        want = jnp.any(d2 < 0.4 ** 2, axis=1).astype(jnp.int32)
        close(got, want, exact=True)

    r.check("coverage mask (r=0.4)", coverage)

    # ---- gathers / scatter -------------------------------------------------
    feats = jnp.asarray(rng.randn(B, N, 64).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, N, (B, 4096)).astype(np.int32))

    def gather():
        from garment4d_tpu.ops.pallas.gather import (
            gather_rows_pallas,
            gather_rows_pallas_cf,
        )

        want = jnp.take_along_axis(feats, idx[..., None], axis=1)
        close(gather_rows_pallas(feats, idx), want)
        close(gather_rows_pallas_cf(feats, idx),
              jnp.transpose(want, (0, 2, 1)))
        padded = gather_rows_pallas_cf(feats, idx, True)
        close(padded[:, :64, :4096], jnp.transpose(want, (0, 2, 1)))

    r.check("gather rows (row-major/cf/cf-pad)", gather)

    def scatter():
        from garment4d_tpu.ops.pallas.scatter import scatter_add_rows_pallas

        # collision-heavy: many rows hit the same targets
        cidx = jnp.asarray(rng.randint(0, 256, (B, 4096)).astype(np.int32))
        g = jnp.asarray(rng.randn(B, 4096, 64).astype(np.float32))
        got = scatter_add_rows_pallas(g, cidx, N)
        want = jnp.zeros((B, N, 64), jnp.float32).at[
            jnp.arange(B)[:, None], cidx].add(g)
        close(got, want, tol=1e-4)

    r.check("scatter-add rows (collision-heavy)", scatter)

    # ---- three-NN + three-interpolate --------------------------------------
    def threenn():
        from garment4d_tpu.ops.pallas.three_nn import three_nn_pallas

        centers = pc.gather_points(body, pc._fps_xla(body, 256))
        d2, i3 = three_nn_pallas(body, centers)
        want = pc.knn_points(body, centers, K=3, exact=True)
        close(i3, want.idx, exact=True)
        close(d2, want.dists, tol=1e-5)

    r.check("three_nn (6890 queries, 256 known)", threenn)

    def interp():
        centers = pc.gather_points(body, pc._fps_xla(body, 256))
        cfeat = jnp.asarray(rng.randn(B, 256, 64).astype(np.float32))
        dist, i3 = pc.three_nn(body, centers)
        w = pc.interp_weights_from_dists(dist)
        close(pc.three_interpolate(cfeat, i3, w, use_cf=True),
              pc.three_interpolate(cfeat, i3, w, use_cf=False), tol=1e-5)

    r.check("three_interpolate cf vs row-major", interp)

    # ---- knn weight transfer ------------------------------------------------
    def knn_transfer():
        from garment4d_tpu.models import skinning as sk

        w0 = jax.nn.softmax(
            jnp.asarray(rng.randn(B, N, 24).astype(np.float32)), axis=-1)
        got = sk._knn_transfer_impl(garment, body, w0, 256, 64)
        want = sk._knn_transfer_xla(garment, body, w0, 256, 64)
        close(got[0], want[0], tol=2e-5)
        close(got[1], want[1], tol=2e-5)
        close(got[2], want[2], exact=True)

    r.check("knn weight transfer (K=256/64)", knn_transfer)

    # ---- fused PE / chain kernels -------------------------------------------
    def pe():
        from garment4d_tpu.ops import pemax
        from garment4d_tpu.ops.pallas.fusedpe import group_pe_max_pallas

        table = jnp.concatenate([body, feats[..., :3]], axis=-1)  # C=6
        gidx = jnp.asarray(
            rng.randint(0, N, (B, Vg, 16)).astype(np.int32))
        k0 = jnp.asarray(rng.randn(6, 32).astype(np.float32) * 0.3)
        b0 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        k1 = jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3)
        b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        got = group_pe_max_pallas(table, gidx, garment, k0, b0, k1, b1, 16)
        want = pemax._pe_reference(table, gidx, garment, k0, b0, k1, b1)
        close(got, want, tol=2e-4)

    r.check("fused gather+PE+max kernel", pe)

    def pe_bwd():
        from garment4d_tpu.ops import pemax
        from garment4d_tpu.ops.pallas.fusedpe import fused_pe_bwd_pallas

        table = jnp.concatenate([body, feats[..., :3]], axis=-1)  # C=6
        gidx = jnp.asarray(rng.randint(0, N, (B, Vg, 16)).astype(np.int32))
        k0 = jnp.asarray(rng.randn(6, 32).astype(np.float32) * 0.3)
        b0 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        k1 = jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3)
        b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.randn(B, Vg, 32).astype(np.float32))
        got = fused_pe_bwd_pallas(table, gidx, garment, k0, b0, k1, b1,
                                  16, cot)
        _, vjp = jax.vjp(
            lambda t, c, a0, a1, a2, a3: pemax._pe_reference(
                t, gidx, c, a0, a1, a2, a3),
            table, garment, k0, b0, k1, b1)
        want = vjp(cot)
        # weight grads sum ~B*Vg*S cancelling terms -> absolute tolerance
        for g, w, tol in zip(got, want, (2e-4, 2e-4, 3e-3, 3e-3, 3e-3, 3e-3)):
            close(g, w, tol=tol)

    r.check("fused PE backward kernel", pe_bwd)

    def pe_bwd_nt():
        # table_grad=False variant (posed body PEs: table is batch data) —
        # must equal the reference VJP w.r.t. (centers, k0, b0, k1, b1)
        from garment4d_tpu.ops import pemax
        from garment4d_tpu.ops.pallas.fusedpe import fused_pe_bwd_pallas

        table = jnp.concatenate([body, feats[..., :3]], axis=-1)  # C=6
        gidx = jnp.asarray(rng.randint(0, N, (B, Vg, 32)).astype(np.int32))
        k0 = jnp.asarray(rng.randn(6, 32).astype(np.float32) * 0.3)
        b0 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        k1 = jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3)
        b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.randn(B, Vg, 32).astype(np.float32))
        got = fused_pe_bwd_pallas(table, gidx, garment, k0, b0, k1, b1,
                                  32, cot, table_grad=False)
        assert len(got) == 5
        _, vjp = jax.vjp(
            lambda c, a0, a1, a2, a3: pemax._pe_reference(
                table, gidx, c, a0, a1, a2, a3),
            garment, k0, b0, k1, b1)
        want = vjp(cot)
        for g, w, tol in zip(got, want, (2e-4, 3e-3, 3e-3, 3e-3, 3e-3)):
            close(g, w, tol=tol)

    r.check("fused PE backward, table_grad=False", pe_bwd_nt)

    def pe_split_frozen():
        # garment-PE pattern at production-ish widths: split-projected fwd,
        # unsplit no-dtable bwd (ops.group_pe_max_split_frozen)
        from garment4d_tpu.ops import pemax

        Ng = 1722
        gxyz = jnp.asarray(rng.randn(B, Ng, 3).astype(np.float32) * 0.3)
        gfeat = jnp.asarray(rng.randn(B, Ng, 64).astype(np.float32))
        gidx = jnp.asarray(rng.randint(0, Ng, (B, Vg, 32)).astype(np.int32))
        k0 = jnp.asarray(rng.randn(67, 32).astype(np.float32) * 0.2)
        b0 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        k1 = jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3)
        b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        cot = jnp.asarray(rng.randn(B, Vg, 32).astype(np.float32))
        table = jnp.concatenate([gxyz, gfeat], axis=-1)

        def loss(c, a0, a1, a2, a3):
            return jnp.sum(ops.group_pe_max_split_frozen(
                gxyz, gfeat, gidx, c, a0, a1, a2, a3) * cot)

        got = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))(
            garment, k0, b0, k1, b1)

        def ref(c, a0, a1, a2, a3):
            return jnp.sum(pemax._pe_reference(
                table, gidx, c, a0, a1, a2, a3) * cot)

        want = jax.jit(jax.grad(ref, argnums=(0, 1, 2, 3, 4)))(
            garment, k0, b0, k1, b1)
        for g, w, tol in zip(got, want, (2e-4, 3e-3, 3e-3, 3e-3, 3e-3)):
            close(g, w, tol=tol)

    r.check("group_pe_max_split_frozen grads", pe_split_frozen)

    def pe_nv():
        # chunk-skipping nv kernel vs the static kernel on a sentinel-padded
        # candidate table: bitwise-equal outputs, including a frame whose
        # valid count rounds to a partial chunk and one with nv=0 (the
        # clamped single-chunk scan must gather the sentinel row 0 exactly
        # like the static kernel does)
        from garment4d_tpu.ops.pallas.fusedpe import (
            fused_chain_pallas,
            fused_chain_pallas_nv,
        )

        cap = 4992  # candidate cap at body shapes (0.72*6890 rounded to 128)
        nv = jnp.asarray([3100, 0], jnp.int32)
        lane = jnp.arange(cap)[None, :, None]
        ctab = jnp.where(lane < nv[:, None, None], body[:, :cap, :],
                         jnp.float32(1e9))
        ctab = jnp.concatenate([ctab, jnp.where(lane < nv[:, None, None],
                                                feats[:, :cap, :3], 0.0)],
                               axis=-1)  # C=6
        # idx within valid rows (or the no-hit prefill 0 for frame 1)
        gidx = jnp.asarray(rng.randint(0, 3100, (B, Vg, 16)).astype(np.int32))
        gidx = jnp.where(jnp.arange(B)[:, None, None] == 1, 0, gidx)
        k0 = jnp.asarray(rng.randn(6, 32).astype(np.float32) * 0.3)
        b0 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        k1 = jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3)
        b1 = jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)
        got = fused_chain_pallas_nv(ctab, gidx, garment, (k0, k1), (b0, b1),
                                    (True, False), 16, nv)
        want = fused_chain_pallas(ctab, gidx, garment, (k0, k1), (b0, b1),
                                  (True, False), 16)
        close(got, want, exact=True)

    r.check("fused PE nv (chunk-skip) vs static", pe_nv)

    def qgpm_frozen():
        # the PRODUCTION posed-stage configuration of query_group_pe_multi:
        # table_grad=False (body table is batch data), which is the only
        # path that can route through the nv kernel when G4D_PE_NV=1
        from garment4d_tpu.ops import pemax

        table_feats = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        params = []
        for _ in range(3):
            params.append((
                jnp.asarray(rng.randn(6, 32).astype(np.float32) * 0.3),
                jnp.asarray(rng.randn(32).astype(np.float32) * 0.1),
                jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3),
                jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)))
        got = pemax.query_group_pe_multi(
            (0.1, 0.2, 0.4), (8, 16, 32), body, garment, table_feats, params,
            table_grad=False)
        want = pemax.query_group_pe_multi(
            (0.1, 0.2, 0.4), (8, 16, 32), body, garment, table_feats, params,
            use_pallas=False, table_grad=False)
        for g, w in zip(got, want):
            close(g, w, tol=2e-4)

    r.check("query_group_pe_multi frozen-table vs ref", qgpm_frozen)

    def chain():
        from garment4d_tpu.ops import pemax

        table = jnp.concatenate([body, feats], axis=-1)  # C=67
        gidx = jnp.asarray(rng.randint(0, N, (B, 1024, 32)).astype(np.int32))
        widths, cin = (64, 64, 128), 67
        ws, bs = [], []
        for wd in widths:
            ws.append(jnp.asarray(rng.randn(cin, wd).astype(np.float32) * 0.2))
            bs.append(jnp.asarray(rng.randn(wd).astype(np.float32) * 0.1))
            cin = wd
        relus = (True, True, True)
        got = pemax._chain_impl(table, gidx, body[:, :1024], ws, bs, relus)
        want = pemax._chain_reference(table, gidx, body[:, :1024], ws, bs,
                                      relus)
        close(got, want, tol=2e-4)

    r.check("fused gather+chain+max kernel", chain)

    # ---- fused GCN stack (fwd + bwd) ----------------------------------------
    def gcn():
        from garment4d_tpu.models import GarmentAssets
        from garment4d_tpu.ops import graph

        assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)
        adj = jnp.asarray(assets.gcn_adj)
        offsets = graph.cyclic_diagonals(assets.gcn_adj)
        xs = tuple(
            jnp.asarray(rng.randn(B, Vg, c).astype(np.float32))
            for c in (3, 32, 32, 32, 32, 32, 32))
        widths, cin = (128, 128, 128, 3), 195
        ws, bs = [], []
        for wd in widths:
            ws.append(jnp.asarray(rng.randn(cin, wd).astype(np.float32) * 0.1))
            bs.append(jnp.asarray(rng.randn(wd).astype(np.float32) * 0.1))
            cin = wd
        relus = (True, True, True, False)

        def fused(xs, ws, bs):
            out, hid = ops.gcn_stack(xs, tuple(ws), tuple(bs), adj, offsets,
                                     relus, 2)
            return jnp.sum(out ** 2) + jnp.sum(hid ** 2), (out, hid)

        def ref(xs, ws, bs):
            out, hid = graph._gcn_stack_ref(xs, tuple(ws), tuple(bs), adj,
                                            offsets, relus, 2)
            return jnp.sum(out ** 2) + jnp.sum(hid ** 2), (out, hid)

        (lg, (og, hg)), grads_g = jax.value_and_grad(
            fused, argnums=(0, 1), has_aux=True)(xs, ws, bs)
        (lw, (ow, hw)), grads_w = jax.value_and_grad(
            ref, argnums=(0, 1), has_aux=True)(xs, ws, bs)
        close(og, ow, tol=2e-4)
        close(hg, hw, tol=2e-4)
        for gg, gw in zip(jax.tree_util.tree_leaves(grads_g),
                          jax.tree_util.tree_leaves(grads_w)):
            close(gg, gw, tol=5e-4)

    r.check("fused GCN stack fwd+bwd", gcn)

    # ---- fused GCN stack at the ATTENTION-iteration width -------------------
    # The round-3 bench regression compiled fine at the 195-wide iteration-0
    # input above but blew the 16 MB scoped-vmem stack at THIS shape: the
    # 323-wide input with the 128-wide temporal-attention piece
    # (models/posed.py:339-365, reference `modules/mesh_encoder.py:467-484`).
    # Any precision/temporary change in gcnstack.py must pass here.
    def gcn_attn():
        from garment4d_tpu.models import GarmentAssets
        from garment4d_tpu.ops import graph

        assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)
        adj = jnp.asarray(assets.gcn_adj)
        offsets = graph.cyclic_diagonals(assets.gcn_adj)
        xs = tuple(
            jnp.asarray(rng.randn(B, Vg, c).astype(np.float32))
            for c in (3, 32, 32, 32, 32, 32, 32, 128))
        widths, cin = (128, 128, 128, 3), 323
        ws, bs = [], []
        for wd in widths:
            ws.append(jnp.asarray(rng.randn(cin, wd).astype(np.float32) * 0.1))
            bs.append(jnp.asarray(rng.randn(wd).astype(np.float32) * 0.1))
            cin = wd
        relus = (True, True, True, False)

        def fused(xs, ws, bs):
            out, hid = ops.gcn_stack(xs, tuple(ws), tuple(bs), adj, offsets,
                                     relus, 2)
            return jnp.sum(out ** 2) + jnp.sum(hid ** 2), (out, hid)

        def ref(xs, ws, bs):
            out, hid = graph._gcn_stack_ref(xs, tuple(ws), tuple(bs), adj,
                                            offsets, relus, 2)
            return jnp.sum(out ** 2) + jnp.sum(hid ** 2), (out, hid)

        from garment4d_tpu.ops.pallas.gcnstack import stack_supported
        assert stack_supported(Vg, [x.shape[-1] for x in xs],
                               [w.shape[1] for w in ws], offsets), \
            "stack_supported rejects the production attention shape"
        (lg, (og, hg)), grads_g = jax.value_and_grad(
            fused, argnums=(0, 1), has_aux=True)(xs, ws, bs)
        (lw, (ow, hw)), grads_w = jax.value_and_grad(
            ref, argnums=(0, 1), has_aux=True)(xs, ws, bs)
        close(og, ow, tol=2e-4)
        close(hg, hw, tol=2e-4)
        for gg, gw in zip(jax.tree_util.tree_leaves(grads_g),
                          jax.tree_util.tree_leaves(grads_w)):
            close(gg, gw, tol=5e-4)

    r.check("fused GCN stack @ attention width (323)", gcn_attn)

    # ---- end-to-end: candidate-compacted query+PE vs plain reference -------
    def qgpm():
        from garment4d_tpu.ops import pemax

        table_feats = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        params = []
        for _ in range(3):
            params.append((
                jnp.asarray(rng.randn(6, 32).astype(np.float32) * 0.3),
                jnp.asarray(rng.randn(32).astype(np.float32) * 0.1),
                jnp.asarray(rng.randn(32, 32).astype(np.float32) * 0.3),
                jnp.asarray(rng.randn(32).astype(np.float32) * 0.1)))
        got = pemax.query_group_pe_multi(
            (0.1, 0.2, 0.4), (8, 16, 32), body, garment, table_feats, params)
        want = pemax.query_group_pe_multi(
            (0.1, 0.2, 0.4), (8, 16, 32), body, garment, table_feats, params,
            use_pallas=False)
        for g, w in zip(got, want):
            close(g, w, tol=2e-4)

    r.check("query_group_pe_multi compact vs ref", qgpm)

    # ---- pruned grouping path ----------------------------------------------
    def pruned():
        got = pc.query_group_pruned_multi(
            (0.1, 0.2, 0.4), (8, 16, 32), body, garment, feats)
        want = tuple(
            pc.group_points(feats, i) for i in pc.ball_query_multi(
                (0.1, 0.2, 0.4), (8, 16, 32), body, garment,
                use_pallas=False))
        for g, w in zip(got, want):
            close(g, w, tol=1e-6)

    r.check("query_group_pruned_multi vs ref", pruned)

    # ---- ship gates: the FULL flagship programs compile + run at BENCH
    # shapes (B=8, T=10, N=6890, Vg=2000). These are what the driver bench
    # measures; a kernel that passes its unit parity above but breaks the
    # whole-model Mosaic compile (the round-3 regression) must fail HERE,
    # before any bench run. Uses the persistent compile cache, so repeat
    # runs are cheap.
    def _bench_setup():
        from garment4d_tpu import smpl
        from garment4d_tpu.data.synthetic import make_batch
        from garment4d_tpu.models import GarmentAssets, PosedGarmentModel
        from garment4d_tpu.train.step import body_inputs_from_batch

        Bp, T, Np = 8, 10, 6890
        assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)
        body_model = smpl.synthetic_smpl(num_verts=Np)
        model = PosedGarmentModel(assets=assets, body_faces=body_model.faces,
                                  lbs_k=256, iterations=3)
        batch = make_batch(assets, body_model, batch_size=Bp, T=T, npoints=Np)
        body = body_inputs_from_batch(batch)
        variables = jax.jit(model.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["pcd"], body, train=False)
        return model, assets, body_model, batch, body, variables

    setup_cache = {}

    def _setup():
        if not setup_cache:
            setup_cache["v"] = _bench_setup()
        return setup_cache["v"]

    def posed_fwd_bench_shape():
        model, _, _, batch, body, variables = _setup()

        @jax.jit
        def posed_fwd(pcd, body):
            return model.apply(variables, pcd, body,
                               train=False).iter_garment_v[-1]

        posed_fwd.lower(batch["pcd"], body).compile()
        out = posed_fwd(batch["pcd"], body)
        val = float(np.asarray(out.ravel()[0]))
        assert np.isfinite(val), f"posed fwd produced {val}"

    r.check("SHIP posed fwd compile+step @ bench shapes", posed_fwd_bench_shape)

    def posed_train_bench_shape():
        from garment4d_tpu.data.synthetic import make_batch
        from garment4d_tpu.train.step import make_posed_steps, make_state_for

        model, assets, body_model, _, _, variables = _setup()
        tb = make_batch(assets, body_model, batch_size=4, T=10, npoints=6890,
                        seed=1)
        state = make_state_for(model, variables, assets, lr=1e-3,
                               freeze_canonical=True)
        train_step, _ = make_posed_steps(model, assets, body_model.faces)
        train_step.lower(state, tb, jax.random.PRNGKey(1)).compile()
        _, losses = train_step(state, tb, jax.random.PRNGKey(1))
        val = float(np.asarray(losses["total_loss"]))
        assert np.isfinite(val), f"posed train loss {val}"

    r.check("SHIP posed train compile+step @ bench shapes",
            posed_train_bench_shape)

    return r.summary()


if __name__ == "__main__":
    sys.exit(main())
