"""Per-op device profile of the flagship pipelines on the real TPU.

Usage: python tools/profile_posed.py [posed|canonical|train] [top]
Prints the top-N HLO ops by device time from a jax.profiler trace of a few
steady-state steps.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_garment4d")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import collections
import glob
import gzip
import json
import re

import numpy as np

from garment4d_tpu import smpl
from garment4d_tpu.data.synthetic import make_batch
from garment4d_tpu.models import (
    CanonicalGarmentModel,
    GarmentAssets,
    PosedGarmentModel,
)
from garment4d_tpu.train.step import (
    body_inputs_from_batch,
    make_posed_steps,
    make_state_for,
)


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return float(np.asarray(leaf.ravel()[0]))


def detail_trace(log_dir, top=40):
    """Top individual HLO ops (not kind-aggregated) by device time."""
    paths = sorted(glob.glob(f"{log_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(paths[-1]) as f:
        data = json.load(f)
    groups = collections.Counter()
    for e in data.get("traceEvents", []):
        name = e.get("name", "")
        dur = e.get("dur", 0)
        if re.fullmatch(r"[a-zA-Z_\-0-9\.]+", name) and dur:
            groups[name] += dur / 1e3
    total = sum(groups.values())
    print(f"total device op-ms (3 steps): {total:.1f}")
    for name, ms in groups.most_common(top):
        print(f"  {ms / 3:9.2f} ms  {name}")


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "posed"
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 40

    B, T, N = 8, 10, 6890
    assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)
    body_model = smpl.synthetic_smpl(num_verts=6890)
    model = PosedGarmentModel(
        assets=assets, body_faces=body_model.faces, lbs_k=256, iterations=3)
    batch = make_batch(assets, body_model, batch_size=B, T=T, npoints=N)
    body = body_inputs_from_batch(batch)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["pcd"], body, train=False)

    if which == "posed":
        @jax.jit
        def _posed(pcd, body):
            return model.apply(variables, pcd, body,
                               train=False).iter_garment_v[-1]

        def run():
            return _posed(batch["pcd"], body)
    elif which == "canonical":
        canon = CanonicalGarmentModel(assets=assets)
        cv = jax.jit(canon.init, static_argnames=("train",))(
            jax.random.PRNGKey(0), batch["pcd"], train=False)

        @jax.jit
        def _canon(pcd):
            return canon.apply(cv, pcd, train=False).tpose_garment

        def run():
            return _canon(batch["pcd"])
    else:  # train
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

    _sync(run())  # compile
    _sync(run())
    log_dir = f"/tmp/g4d_trace_{which}"
    with jax.profiler.trace(log_dir):
        for _ in range(3):
            _sync(run())
    detail_trace(log_dir, top=top)


if __name__ == "__main__":
    main()
