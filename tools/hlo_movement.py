"""HLO data-movement audit of the posed forward.

Usage: python tools/hlo_movement.py
Compiles the flagship posed forward and lists the largest copy / pad /
transpose / concatenate instructions by byte volume, with their source
op_name - the tool that located the ~6.2 GB/forward movement tail fixed in
round 2 (gather relayouts, GCN-input concat+pad, FP interpolation slices).
"""

import sys, re, collections
import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_garment4d")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import numpy as np
from garment4d_tpu import smpl
from garment4d_tpu.data.synthetic import make_batch
from garment4d_tpu.models import GarmentAssets, PosedGarmentModel
from garment4d_tpu.train.step import body_inputs_from_batch

B, T, N = 8, 10, 6890
assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)
body_model = smpl.synthetic_smpl(num_verts=N)
model = PosedGarmentModel(assets=assets, body_faces=body_model.faces,
                          lbs_k=256, iterations=3)
batch = make_batch(assets, body_model, batch_size=B, T=T, npoints=N)
body = body_inputs_from_batch(batch)
variables = jax.jit(model.init, static_argnames=("train",))(
    jax.random.PRNGKey(0), batch["pcd"], body, train=False)

def fwd(pcd, body):
    return model.apply(variables, pcd, body, train=False).iter_garment_v[-1]

txt = jax.jit(fwd).lower(batch["pcd"], body).compile().as_text()

def nbytes(shape_str):
    m = re.match(r"(f32|s32|u32|pred|bf16|s8)\[([0-9,]*)\]", shape_str)
    if not m:
        return 0
    dt = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "bf16": 2, "s8": 1}[m.group(1)]
    dims = [int(x) for x in m.group(2).split(",") if x]
    n = dt
    for d in dims:
        n *= d
    return n

rows = []
for line in txt.splitlines():
    mm = re.match(r"\s*%?([a-z_\-0-9\.]+) = (\S+) (copy|pad|transpose|concatenate)\(", line)
    if mm:
        name, shape, op = mm.groups()
        src = ""
        sm = re.search(r'op_name="([^"]*)"', line)
        if sm:
            src = sm.group(1)[-90:]
        rows.append((nbytes(shape), op, shape[:40], src))
rows.sort(reverse=True)
tot = collections.Counter()
for b, op, shape, src in rows:
    tot[op] += b
for k, v in tot.items():
    print(f"total {k}: {v/1e6:.0f} MB")
for b, op, shape, src in rows[:22]:
    print(f"{b/1e6:8.1f} MB {op:12s} {shape:40s} {src}")
