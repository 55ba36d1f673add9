"""Microbench: ball-query kernel variants at the pipeline's query shapes.

Usage: python tools/bench_bq.py
Compares the flat kernel vs the boundary-gated grouped kernel on body-like
point sets, checks compiled-mode equality, prints ms per call.
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

from functools import partial

from garment4d_tpu.ops.pallas.ball_query import (
    _ball_query_multi_grouped,
    ball_query_multi_pallas,
)


def surface_cloud(rng, b, n, jitter=0.02):
    """Points on a vertical cylinder of radius 0.2, height 1.8 (body-ish)."""
    theta = rng.uniform(0, 2 * np.pi, (b, n))
    z = rng.uniform(-0.9, 0.9, (b, n))
    pts = np.stack([0.2 * np.cos(theta), 0.2 * np.sin(theta), z], axis=-1)
    return (pts + rng.normal(0, jitter, pts.shape)).astype(np.float32)


def coherent_centers(rng, b, m):
    """Ring-ordered centers (garment-vertex-like): sorted by z then angle."""
    rings = 25
    per = m // rings
    out = []
    for i in range(rings):
        z = -0.5 + i / rings
        th = np.linspace(0, 2 * np.pi, per, endpoint=False)
        out.append(np.stack([0.22 * np.cos(th), 0.22 * np.sin(th),
                             np.full(per, z)], -1))
    pts = np.concatenate(out, 0)[:m]
    pts = np.broadcast_to(pts, (b, m, 3)).copy()
    return (pts + rng.normal(0, 0.01, pts.shape)).astype(np.float32)


def timeit(fn, *args, iters=20):
    r = fn(*args)
    _ = [np.asarray(o.ravel()[0]) for o in r]
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    _ = [np.asarray(o.ravel()[0]) for o in r]
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.RandomState(0)
    cases = [
        # name, B, N, M, radii, nsamples, coherent_centers?
        ("body-compact", 80, 4992, 2000, (0.1, 0.2, 0.4), (8, 16, 32), True),
        ("body-full", 80, 6890, 2000, (0.1, 0.2, 0.4), (8, 16, 32), True),
        ("garment-pe", 80, 1722, 2000, (0.1, 0.2, 0.4), (32, 16, 8), True),
        ("sa1-backbone", 80, 6890, 1024, (0.05, 0.1), (16, 32), False),
        ("garment-enc1", 80, 1722, 512, (0.05, 0.1), (16, 32), False),
    ]
    for name, B, N, M, radii, ns, coh in cases:
        xyz = jnp.asarray(surface_cloud(rng, B, N))
        if coh:
            ctr = jnp.asarray(coherent_centers(rng, B, M))
        else:
            sel = rng.choice(N, M, replace=False)
            ctr = xyz[:, sel, :]

        flat = lambda x, c: ball_query_multi_pallas(radii, ns, x, c)
        of = flat(xyz, ctr)
        tf = timeit(flat, xyz, ctr)
        line = f"{name:14s} N={N:5d} M={M:5d} flat={tf:7.2f}"
        for tm in (128, 256, 512):
            grp = jax.jit(partial(_ball_query_multi_grouped, radii, ns,
                                  tile_m=tm, w=512))
            try:
                og = grp(xyz, ctr)
                same = all(bool(jnp.all(a == b)) for a, b in zip(of, og))
                tg = timeit(grp, xyz, ctr)
                flag = "" if same else "!MISMATCH"
                line += f"  g512/{tm}={tg:6.2f}{flag}"
            except Exception:
                line += f"  g512/{tm}=OOM"
        print(line, flush=True)


if __name__ == "__main__":
    main()
