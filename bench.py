"""Benchmark: posed-stage inference throughput in CLOTH3D frames/sec/chip.

Runs the flagship posed-stage forward (stage-1 canonical encoder + LBS +
3-iteration GCN refinement) at the reference's production shapes (T=10 frames,
N=6890 points/frame, 6890-vertex body, ~2k-vertex garment, K=256 skinning
neighbours; reference `cfgs/skirt.yaml` + `scripts/test/test_skirt.sh`) and
prints one JSON line.

Baseline: the reference publishes no throughput numbers (SURVEY.md section 6).
`vs_baseline` is measured frames/sec/chip divided by BASELINE_FPS, an
estimate of the PyTorch+CUDA per-GPU inference throughput of the reference
implementation (PointNet++ CUDA + chamferdist at the same shapes on the
2019-era hardware it shipped with).
"""

import json
import os
import sys
import time

BASELINE_FPS = 100.0  # estimated reference frames/sec/GPU (see module docstring)


def main():
    import jax
    import numpy as np

    from garment4d_tpu import smpl
    from garment4d_tpu.data.synthetic import make_batch
    from garment4d_tpu.models import GarmentAssets, PosedGarmentModel
    from garment4d_tpu.train.step import body_inputs_from_batch

    B, T, N = 8, 10, 6890
    assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)  # Vg=2000
    body_model = smpl.synthetic_smpl(num_verts=6890)
    model = PosedGarmentModel(
        assets=assets,
        body_faces=body_model.faces,
        lbs_k=256, iterations=3)

    batch = make_batch(assets, body_model, batch_size=B, T=T, npoints=N)
    body = body_inputs_from_batch(batch)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), batch["pcd"], body, train=False)

    @jax.jit
    def forward(pcd, body):
        return model.apply(variables, pcd, body, train=False).iter_garment_v[-1]

    def run_once(pcd):
        out = forward(pcd, body)
        # force completion with a host fetch (block_until_ready is unreliable
        # through the axon relay); fetch cost ~30 ms, negligible vs the step
        return float(np.asarray(out[0, 0, 0, 0]))

    run_once(batch["pcd"])  # warm-up / compile

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        run_once(batch["pcd"])
    dt = (time.perf_counter() - t0) / iters

    frames_per_sec = B * T / dt
    print(json.dumps({
        "metric": "posed_stage_frames_per_sec_per_chip",
        "value": round(frames_per_sec, 2),
        "unit": "frames/s",
        "vs_baseline": round(frames_per_sec / BASELINE_FPS, 3),
    }))


if __name__ == "__main__":
    main()
