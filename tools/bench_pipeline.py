"""Input-pipeline throughput proof (VERDICT r04 #6).

Writes a production-shaped mini-CLOTH3D fixture tree to disk
(`data/fixture.py`; same on-disk format the reference consumes,
README.md:58-72), then measures how many frames/s
`ParallelItemLoader` + `Cloth3dDataset.raw_item` (+ optional
`finalize_batch` device completion) can sustain — the reference's hot loop
is the 8-worker pinned-memory `DataLoader` over the same reads
(`/root/reference/utils/dataloader.py:122-260`, `train_temporal.py:85-107`).

Compare the printed loader frames/s against the device step rate
(bench.py: ~277 f/s posed inference, ~180 f/s train at B=8/T=10): the loader
must exceed the device rate for the input pipeline to never starve the chip.

    python tools/bench_pipeline.py                # loader-only, tmp fixture
    python tools/bench_pipeline.py --finalize     # + on-device finalize
    python tools/bench_pipeline.py --workers 0    # synchronous baseline
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=None,
                    help="fixture dir (default: a fresh tmp dir)")
    ap.add_argument("--num-seqs", type=int, default=4)
    ap.add_argument("--frames-per-seq", type=int, default=60)
    ap.add_argument("--garment-points", type=int, default=7000,
                    help="points per frame .bin (CLOTH3D frames are ~5-9k)")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--T", type=int, default=10)
    ap.add_argument("--npoints", type=int, default=6890)
    ap.add_argument("--workers", type=int, default=8)
    ap.add_argument("--batches", type=int, default=12,
                    help="measured batches (indices cycle over the windows)")
    ap.add_argument("--finalize", action="store_true",
                    help="also run finalize_batch (3 SMPL fwds) per batch")
    args = ap.parse_args(argv)

    from garment4d_tpu.data.cloth3d import (
        Cloth3dDataset,
        Cloth3dPaths,
        finalize_batch,
    )
    from garment4d_tpu.data.fixture import write_fixture
    from garment4d_tpu.data.pipeline import ParallelItemLoader
    from garment4d_tpu.models import GarmentAssets

    root = args.root or tempfile.mkdtemp(prefix="g4d_pipe_bench_")
    assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)  # Vg=2000
    t0 = time.perf_counter()
    lists = write_fixture(root, assets, num_seqs=args.num_seqs,
                          frames_per_seq=args.frames_per_seq,
                          garment_points=args.garment_points)
    print(f"fixture: {root} ({args.num_seqs} seqs x {args.frames_per_seq} "
          f"frames x {args.garment_points} pts, "
          f"{time.perf_counter() - t0:.1f}s to write)")

    paths = Cloth3dPaths(root=root,
                         template_prefix=os.path.join(root,
                                                      "CLOTH3D_template"))
    ds = Cloth3dDataset(paths, lists["train"], "Skirt", T=args.T,
                        npoints=args.npoints,
                        rng=np.random.RandomState(0))
    n_win = len(ds)
    print(f"dataset: {n_win} train windows of T={args.T}")

    idx_batches = [
        [(b * args.batch + j) % n_win for j in range(args.batch)]
        for b in range(args.batches + 1)  # +1 warm-up batch
    ]
    warmup_batch, idx_batches = idx_batches[0], idx_batches[1:]

    body = None
    sync = None
    if args.finalize:
        import jax

        from garment4d_tpu import smpl

        body = {k: smpl.synthetic_smpl(num_verts=6890)
                for k in ("male", "female")}

        def sync(batch):
            leaf = jax.tree_util.tree_leaves(batch)[0]
            return float(np.asarray(leaf.ravel()[0]))

    # warm-up on its OWN loader: pools, per-sequence caches, and the
    # finalize compile. The measured loader below is created after t_start,
    # so its prefetch head start (up to prefetch+1 batches already in the
    # pool before the first yield) is paid INSIDE the timed window - the
    # previous arrangement set the clock after batch 0 of a shared loader
    # and credited ~2-3 prefetched batches of free work, overstating
    # frames/s by up to ~25% at the default --batches 12.
    warm = ParallelItemLoader(ds.raw_item, num_workers=args.workers)
    for items in warm.map_batches([warmup_batch]):
        batch = ds.collate(items)
        if args.finalize:
            sync(finalize_batch(batch, body))
    warm.close()

    frames = 0
    t_start = time.perf_counter()
    loader = ParallelItemLoader(ds.raw_item, num_workers=args.workers)
    for items in loader.map_batches(idx_batches):
        batch = ds.collate(items)
        if args.finalize:
            sync(finalize_batch(batch, body))
        frames += args.batch * args.T
    dt = time.perf_counter() - t_start
    loader.close()

    fps = frames / dt
    rec = {
        "metric": "input_pipeline_frames_per_sec",
        "value": round(fps, 1),
        "unit": "frames/s",
        "extra": {
            "workers": args.workers,
            "finalize": bool(args.finalize),
            "batch": args.batch, "T": args.T,
            "garment_points": args.garment_points,
            "batches": args.batches,
        },
    }
    print(json.dumps(rec))
    return 0


if __name__ == "__main__":
    sys.exit(main())
