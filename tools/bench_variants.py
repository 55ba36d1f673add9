"""Posed-forward throughput for the semantic perf levers, on the real TPU.

The two opt-in levers (Morton spatial sampling, candidate reuse) only pay
off at realistic data-dependent work - trained weights. This tool times the
posed forward at bench shapes for each variant with the same weights
(random-init or a tools/train_synth.py checkpoint) and prints frames/s:

    python tools/bench_variants.py                       # random-init
    python tools/bench_variants.py --weights ckpt_synth/posed_synth.npz
    python tools/bench_variants.py --variants exact reuse

All variants share one parameter tree (the flags change kernels/sampling,
not parameters), so the same weights load into each.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VARIANTS = {
    "exact": {},
    "reuse": {"candidate_reuse_margin": 0.05},
    "spatial": {"spatial_sample": True},
    "spatial+reuse": {"spatial_sample": True, "candidate_reuse_margin": 0.05},
    # MXU expansion-form distances in the grouped body-query kernel with an
    # exact-fallback ambiguity band (bitwise-identical outputs; VERDICT r04
    # #1 lever) - same headline path, phase-1 distances on the MXU.
    "mxu": {"bq_mxu_dist": True},
}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--weights", default=None,
                   help="npz from tools/train_synth.py (default: random init)")
    p.add_argument("--variants", nargs="+", default=list(VARIANTS),
                   choices=list(VARIANTS))
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_garment4d")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from garment4d_tpu import smpl
    from garment4d_tpu.data.synthetic import make_batch
    from garment4d_tpu.models import GarmentAssets, PosedGarmentModel
    from garment4d_tpu.train.step import body_inputs_from_batch

    B, T, N, lbs_k = 8, 10, 6890, 256
    assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)
    body_model = smpl.synthetic_smpl(num_verts=6890)
    batch = make_batch(assets, body_model, batch_size=B, T=T, npoints=N)
    body = body_inputs_from_batch(batch)

    base = PosedGarmentModel(assets=assets, body_faces=body_model.faces,
                             lbs_k=lbs_k, iterations=3)
    variables = jax.jit(base.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["pcd"], body, train=False)
    tag = "random-init"
    if args.weights:
        from garment4d_tpu.train.checkpoint import load_variables_npz

        variables = load_variables_npz(args.weights, variables)
        tag = os.path.basename(args.weights)
    print(f"weights: {tag}", flush=True)

    for name in args.variants:
        model = PosedGarmentModel(assets=assets, body_faces=body_model.faces,
                                  lbs_k=lbs_k, iterations=3,
                                  **VARIANTS[name])

        @jax.jit
        def fwd(pcd, body, model=model):
            return model.apply(variables, pcd, body,
                               train=False).iter_garment_v[-1]

        out = fwd(batch["pcd"], body)
        float(np.asarray(out.ravel()[0]))  # compile + sync
        out = fwd(batch["pcd"], body)
        float(np.asarray(out.ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(batch["pcd"], body)
        float(np.asarray(out.ravel()[0]))
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:14s} {B * T / dt:8.1f} frames/s  ({dt * 1e3:7.1f} ms)",
              flush=True)


if __name__ == "__main__":
    main()
