#!/usr/bin/env python
"""SMPL body-model demo: sample a shape, run the forward, export the mesh.

Equivalent of the reference's vendored `smplx/examples/demo.py:26-80` and the
`vis_*_vertices.py` scripts (SURVEY.md 2.8): build a body model, sample betas,
run LBS forward, print vertex/joint shapes, then export the artifacts the
reference's interactive pyrender/open3d viewers would show - an OBJ of the
body, a PLY of the joints (`--plot-joints`), and a software-rasterised
preview image - so it runs headless without GL deps.

Usage:
  python demos/smpl_demo.py                          # synthetic model
  python demos/smpl_demo.py --model-file SMPL_N.pkl  # released pickle/npz
  python demos/smpl_demo.py --pose random --out /tmp/smpl_demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-file", default=None,
                    help="released SMPL .pkl/.npz; synthetic when omitted")
    ap.add_argument("--num-betas", type=int, default=10)
    ap.add_argument("--sample-shape", action="store_true", default=True)
    ap.add_argument("--no-sample-shape", dest="sample_shape",
                    action="store_false")
    ap.add_argument("--plot-joints", action="store_true", default=False)
    ap.add_argument("--pose", choices=["zero", "random"], default="zero")
    ap.add_argument("--out", default="demo_out/smpl")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from garment4d_tpu import smpl
    from garment4d_tpu.data.export import (
        render_mesh,
        save_image,
        write_ply_pointcloud,
    )
    from garment4d_tpu.data.obj_io import write_obj

    if args.model_file:
        model = smpl.load_smpl(args.model_file)
    else:
        model = smpl.synthetic_smpl(num_verts=890, seed=args.seed)
    print(f"SMPL model: {model.num_verts} vertices, "
          f"{model.parents.shape[0]} joints, "
          f"{'loaded ' + args.model_file if args.model_file else 'synthetic'}")

    rng = np.random.RandomState(args.seed)
    betas = np.zeros((1, smpl.NUM_BETAS), np.float32)
    if args.sample_shape:
        betas[:, :args.num_betas] = rng.randn(1, args.num_betas)
    pose = np.zeros((1, smpl.NUM_JOINTS * 3), np.float32)
    if args.pose == "random":
        pose = (rng.randn(1, smpl.NUM_JOINTS * 3) * 0.2).astype(np.float32)

    fwd = jax.jit(model.forward_axis_angle)
    vertices, joints = fwd(jnp.asarray(betas), jnp.asarray(pose))
    vertices = np.asarray(vertices)[0]
    joints = np.asarray(joints)[0]
    print("Vertices shape =", vertices.shape)
    print("Joints shape =", joints.shape)

    os.makedirs(args.out, exist_ok=True)
    write_obj(os.path.join(args.out, "body.obj"), vertices, model.faces)
    save_image(os.path.join(args.out, "body_preview.png"),
               render_mesh(vertices, model.faces))
    if args.plot_joints:
        write_ply_pointcloud(os.path.join(args.out, "joints.ply"), joints)
    print(f"wrote {args.out}/body.obj, body_preview.png"
          + (", joints.ply" if args.plot_joints else ""))


if __name__ == "__main__":
    main()
