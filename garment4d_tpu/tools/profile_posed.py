"""Per-op device-time breakdown of the posed-stage forward on the real TPU.

Usage: python -m garment4d_tpu.tools.profile_posed [--train] [--iters N]

Prints the top HLO fusions/custom-calls by device time so kernel work can be
attributed (ball query / gathers / knn / GCN matmuls / LBS einsums). This is
the measurement harness behind PLAN.md's perf ledger.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import re
import tempfile
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true", help="profile the train step")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_garment4d")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from garment4d_tpu import smpl
    from garment4d_tpu.data.synthetic import make_batch
    from garment4d_tpu.models import GarmentAssets, PosedGarmentModel
    from garment4d_tpu.train.step import body_inputs_from_batch

    B, T, N = args.batch, 10, 6890
    assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)  # Vg=2000
    body_model = smpl.synthetic_smpl(num_verts=6890)
    model = PosedGarmentModel(
        assets=assets, body_faces=body_model.faces, lbs_k=256, iterations=3)

    batch = make_batch(assets, body_model, batch_size=B, T=T, npoints=N)
    body = body_inputs_from_batch(batch)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["pcd"], body, train=False)

    if args.train:
        from garment4d_tpu.train.step import make_posed_steps, make_state_for
        state = make_state_for(model, variables, assets, lr=1e-3,
                               freeze_canonical=True)
        train_step, _ = make_posed_steps(model, assets, body_model.faces)

        def run():
            nonlocal state
            state, loss = train_step(state, batch, jax.random.PRNGKey(1))
            return loss["total_loss"]
    else:
        @jax.jit
        def forward(pcd, body):
            return model.apply(variables, pcd, body, train=False).iter_garment_v[-1]

        def run():
            return forward(batch["pcd"], body)

    def sync(x):
        leaf = jax.tree_util.tree_leaves(x)[0]
        return float(np.asarray(leaf.ravel()[0]))

    sync(run())  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        sync(run())
    dt = (time.perf_counter() - t0) / args.iters
    print(f"step time: {dt * 1e3:.1f} ms  ({B * T / dt:.1f} frames/s)")

    log_dir = tempfile.mkdtemp(prefix="g4d_trace_")
    with jax.profiler.trace(log_dir):
        for _ in range(args.iters):
            sync(run())

    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace captured")
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    # keep only events on TPU device tracks (XLA Ops), aggregate by op name
    pid_names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e.get("args", {}).get("name", "")
    per_op = collections.Counter()
    total = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") != "X" or not e.get("dur"):
            continue
        track = pid_names.get(e.get("pid"), "")
        if "TPU" not in track and "/device" not in track.lower():
            continue
        name = e.get("name", "")
        # purely-numeric names are XLA region/parent events that contain
        # (and double-count) their child ops; skip them
        if name.isdigit() or name.startswith("jit_"):
            continue
        per_op[name] += e["dur"] / 1e3
        total += e["dur"] / 1e3
    print(f"total device time in trace: {total / args.iters:.1f} ms/step")
    print(f"{'ms/step':>9}  op")
    for name, ms in per_op.most_common(args.top):
        print(f"{ms / args.iters:9.2f}  {name[:140]}")


if __name__ == "__main__":
    main()
