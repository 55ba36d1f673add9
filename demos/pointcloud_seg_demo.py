#!/usr/bin/env python
"""Standalone PointNet++ segmentation demo on synthetic shapes.

Equivalent of the reference's vendored KITTI foreground-segmentation harness
(`modules/pointnet2/tools/train_and_eval.py`, SURVEY.md 2.8): exercises the
backbone + geometry ops end-to-end on public-format data - here a generated
two-class shape dataset (points on a sphere = class 1, ambient noise = 0) so
it runs anywhere without datasets.

Usage: python demos/pointcloud_seg_demo.py [--steps 30] [--npoints 2048]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--npoints", type=int, default=2048)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    import optax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from garment4d_tpu.losses import sem_seg_loss
    from garment4d_tpu.models.backbone import PointNet2SegBackbone

    def make_batch(rng, B, N):
        n_fg = N // 3
        pts = rng.randn(B, N, 3).astype(np.float32)
        sphere = rng.randn(B, n_fg, 3)
        sphere /= np.linalg.norm(sphere, axis=-1, keepdims=True)
        pts[:, :n_fg] = sphere * 0.5
        labels = np.zeros((B, N), np.int32)
        labels[:, :n_fg] = 1
        perm = rng.permutation(N)
        return jnp.asarray(pts[:, perm]), jnp.asarray(labels[:, perm])

    rng = np.random.RandomState(0)
    model = PointNet2SegBackbone(num_classes=2, global_feat=False)
    pcd, labels = make_batch(rng, args.batch, args.npoints)
    variables = jax.jit(model.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), pcd, train=False)
    tx = optax.adam(1e-3)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, batch_stats, opt_state, pcd, labels, rng_key):
        def loss_fn(p):
            out, mut = model.apply(
                {"params": p, "batch_stats": batch_stats}, pcd, train=True,
                rngs={"dropout": rng_key}, mutable=["batch_stats"])
            return sem_seg_loss(out.sem_logits, labels), (out, mut["batch_stats"])

        (loss, (out, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(out.sem_logits, -1) == labels)
        return params, new_stats, opt_state, loss, acc

    params, batch_stats = variables["params"], variables["batch_stats"]
    for i in range(args.steps):
        pcd, labels = make_batch(rng, args.batch, args.npoints)
        params, batch_stats, opt_state, loss, acc = step(
            params, batch_stats, opt_state, pcd, labels,
            jax.random.PRNGKey(i))
        if i % 5 == 0 or i == args.steps - 1:
            print(f"step {i:3d}  loss {float(loss):.4f}  acc {float(acc):.3f}")
    assert float(acc) > 0.8, "demo should reach >80% accuracy"
    print("OK")


if __name__ == "__main__":
    main()
