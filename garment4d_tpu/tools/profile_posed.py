"""Per-op device-time breakdown of the flagship pipelines on the real TPU.

Usage: python -m garment4d_tpu.tools.profile_posed [posed|canonical|train]
                                                   [--iters N] [--top N]

Prints steady-state step time, then the top HLO fusions/custom-calls by
device time so kernel work can be attributed (ball query / gathers / knn /
GCN matmuls / LBS einsums). This is the measurement harness behind PLAN.md's
perf ledger; the profiler's "XLA Modules" envelope is the true device time
per step (see CLAUDE.md timing recipe).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import tempfile
import time


def summarize_trace(log_dir: str, iters: int, top: int = 40) -> None:
    """Aggregate a jax.profiler trace's TPU-track events by op name."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    if not paths:
        print("no trace captured")
        return
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
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
    print(f"total device time in trace: {total / iters:.1f} ms/step")
    print(f"{'ms/step':>9}  op")
    for name, ms in per_op.most_common(top):
        print(f"{ms / iters:9.2f}  {name[:140]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("which", nargs="?", default="posed",
                    choices=("posed", "canonical", "train"))
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--weights", default=None,
                    help="npz variables to load (default: the checked-in "
                         "ckpt_synth/posed_synth.npz when present, matching "
                         "bench.py's operating point; 'random' disables). "
                         "Hit densities are data-dependent, so profiles at "
                         "random-init weights mis-rank the query kernels.")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_garment4d")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import numpy as np

    from garment4d_tpu import smpl
    from garment4d_tpu.data.synthetic import make_batch
    from garment4d_tpu.models import (
        CanonicalGarmentModel,
        GarmentAssets,
        PosedGarmentModel,
    )
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

    import os

    weights = args.weights or os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__)))), "ckpt_synth", "posed_synth.npz")
    if args.weights not in (None, "random") and not os.path.exists(weights):
        raise FileNotFoundError(f"--weights {weights!r} does not exist")
    load_weights = args.weights != "random" and os.path.exists(weights)

    if args.which in ("posed", "train"):
        if load_weights:
            from garment4d_tpu.train.checkpoint import load_variables_npz

            variables = load_variables_npz(weights, variables)
            print(f"weights: {os.path.basename(weights)}")
        else:
            print("weights: random-init")

    if args.which == "train":
        from garment4d_tpu.train.step import make_posed_steps, make_state_for
        tb = make_batch(assets, body_model, batch_size=4, T=T, npoints=N,
                        seed=1)
        state = make_state_for(model, variables, assets, lr=1e-3,
                               freeze_canonical=True)
        train_step, _ = make_posed_steps(model, assets, body_model.faces)
        rng = jax.random.PRNGKey(1)
        holder = {"state": state}

        def run():
            holder["state"], losses = train_step(holder["state"], tb, rng)
            return losses["total_loss"]
    elif args.which == "canonical":
        canon = CanonicalGarmentModel(assets=assets)
        cv = jax.jit(canon.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["pcd"], train=False)
        if load_weights:
            # the posed checkpoint carries the (frozen) canonical encoder as
            # the `canonical/` submodule; the standalone model's tree is the
            # same with that prefix stripped
            from flax import traverse_util

            with np.load(weights) as data:
                flat = {k: data[k] for k in data.files
                        if k.split("/", 2)[1] == "canonical"}
            if not flat:
                raise ValueError(
                    f"--weights {weights!r} has no canonical/ subtree")
            tree = traverse_util.unflatten_dict(
                {f"{k.split('/', 2)[0]}/{k.split('/', 2)[2]}": v
                 for k, v in flat.items()}, sep="/")
            cv = dict(cv)
            for coll in ("params", "batch_stats"):
                if coll in tree and coll in cv:
                    cv[coll] = jax.tree_util.tree_map(
                        lambda old, new: np.asarray(
                            new, np.asarray(old).dtype),
                        cv[coll], tree[coll])
            print(f"weights: {os.path.basename(weights)} (canonical/ subtree)")
        else:
            print("weights: random-init")

        @jax.jit
        def _canon(pcd):
            return canon.apply(cv, pcd, train=False).tpose_garment

        def run():
            return _canon(batch["pcd"])
    else:
        @jax.jit
        def forward(pcd, body):
            return model.apply(variables, pcd, body,
                               train=False).iter_garment_v[-1]

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
    frames = (4 if args.which == "train" else B) * T
    print(f"step time: {dt * 1e3:.1f} ms  ({frames / dt:.1f} frames/s)")

    log_dir = tempfile.mkdtemp(prefix=f"g4d_trace_{args.which}_")
    with jax.profiler.trace(log_dir):
        for _ in range(args.iters):
            sync(run())
    summarize_trace(log_dir, args.iters, args.top)


if __name__ == "__main__":
    main()
