"""Microbench of posed-stage non-query components on the real TPU.

Usage: python tools/bench_parts.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_garment4d")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=20):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    from garment4d_tpu import ops, smpl
    from garment4d_tpu.models.assets import GarmentAssets
    from garment4d_tpu.models.skinning import lbs_garment_interpolation
    from garment4d_tpu.ops.graph import cyclic_diagonals, graph_matmul_banded

    rng = np.random.RandomState(0)
    B, T, Vg, N, J = 8, 10, 2000, 6890, 24
    BT = B * T
    assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)
    body = smpl.synthetic_smpl(num_verts=N)

    # ---- banded GCN matmul (12 per posed forward) -----------------------
    adj = jnp.asarray(assets.gcn_adj)
    offs = cyclic_diagonals(assets.gcn_adj)
    x = jnp.asarray(rng.randn(BT, Vg, 128), jnp.float32)
    f = jax.jit(lambda a, x: graph_matmul_banded(a, x, offs))
    print(f"banded_gcn_matmul (BT={BT},V={Vg},C=128): {timeit(f, adj, x):7.2f} ms x12")

    # dense weight matmul of a GCN layer for scale
    w = jnp.asarray(rng.randn(128, 128), jnp.float32)
    g = jax.jit(lambda x, w: jnp.einsum("bvc,cd->bvd", x, w))
    print(f"gcn_weight_matmul: {timeit(g, x, w):7.2f} ms x12")

    # ---- vertex normals (1 per forward) ---------------------------------
    faces = np.asarray(body.faces, np.int32)
    verts = jnp.asarray(rng.randn(BT, N, 3), jnp.float32)
    vn = jax.jit(lambda v: ops.vertex_normals(v, jnp.asarray(faces)))
    print(f"vertex_normals (BT={BT},N={N},F={len(faces)}): {timeit(vn, verts):7.2f} ms")

    # ---- temporal attention (2 per forward) ------------------------------
    h = jnp.asarray(rng.randn(B, T, Vg, 128), jnp.float32)
    wq = jnp.asarray(rng.randn(128, 384), jnp.float32)

    @jax.jit
    def attn(h, wq):
        qkv = h @ wq
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(B, T, Vg * 128)
        k = k.reshape(B, T, Vg * 128)
        v = v.reshape(B, T, Vg * 128)
        qk = jnp.einsum("btd,bsd->bts", q, k) / np.sqrt(T)
        a = jax.nn.softmax(qk, axis=-1)
        return jnp.einsum("bts,bsd->btd", a, v)

    print(f"temporal_attention: {timeit(attn, h, wq):7.2f} ms x2")

    # ---- LBS interpolation (1 per forward) -------------------------------
    tmpl = jnp.asarray(rng.randn(B, Vg, 3) * 0.2, jnp.float32)
    tpose_v = jnp.asarray(rng.randn(B, N, 3) * 0.3, jnp.float32)
    root_j = jnp.zeros((B, 3), jnp.float32)
    zerop = jnp.asarray(rng.randn(B, T, N, 3) * 0.3, jnp.float32)
    pose = jnp.asarray(rng.randn(B, T, 72) * 0.1, jnp.float32)
    Jreg = jnp.asarray(rng.rand(B, T, J, N) / N, jnp.float32)
    lbsw = jax.nn.softmax(jnp.asarray(rng.randn(B, T, N, J), jnp.float32))
    smooth = jnp.asarray(assets.smooth_op)
    parents = np.array([0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13,
                        14, 16, 17, 18, 19, 20, 21], np.int64)
    lbs = jax.jit(lambda *a: lbs_garment_interpolation(
        *a, parents=parents, smooth_op=smooth, K=256).posed_garment)
    print(f"lbs_interpolation: "
          f"{timeit(lbs, tmpl, tpose_v, root_j, zerop, pose, Jreg, lbsw):7.2f} ms")

    # ---- garment-point selection (1 per forward) -------------------------
    labels = jnp.asarray(rng.randint(0, 5, (BT, N)), jnp.int32)
    feats = jnp.asarray(rng.randn(BT, N, 128), jnp.float32)
    from garment4d_tpu.models.canonical import select_garment_points
    sel = jax.jit(lambda v, f, l: select_garment_points(v, f, l, 2, N // 4))
    print(f"select_garment_points: {timeit(sel, verts, feats, labels):7.2f} ms")


if __name__ == "__main__":
    main()
