#!/usr/bin/env python
"""Garment4D-TPU training / evaluation entry point.

Same CLI surface as the reference's `train_temporal.py` (flags from
`utils/config.py:91-118`, stage selection per `train_temporal.py:108-116`):

  --GarmentPCA 1     canonical stage (PCAGarmentEncoderSeg equivalent)
  --GarmentPCALBS 1  posed stage (PCALBSGarmentUseSegEncoderSeg equivalent)
  --MGN 1            MGN baseline variant
  --only_seg 1       segmentation-only training
  --fix_PCA 1        freeze the canonical encoder (posed stage)
  --only_eval 1      evaluation only (loads --pretrained_model)

With --synthetic_data 1 it runs on the generated mini-CLOTH3D fixture, so the
full pipeline is exercisable without the real dataset or SMPL weights.
"""

import os
import sys


def main(argv=None):
    from garment4d_tpu.utils.config import parse_args

    args, cfg = parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp

    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from garment4d_tpu import losses, smpl
    from garment4d_tpu.models import (
        CanonicalGarmentModel,
        GarmentAssets,
        PosedGarmentModel,
    )
    from garment4d_tpu.models.mgn import MgnGarmentModel
    from garment4d_tpu.parallel.mesh import check_batch_divisible, make_mesh, shard_batch
    from garment4d_tpu.train import checkpoint as ckpt_lib
    from garment4d_tpu.train.loop import fit, eval_one_epoch, make_logger
    from garment4d_tpu.train.step import (
        make_canonical_steps,
        make_posed_steps,
        make_state_for,
    )

    os.makedirs(args.output_dir, exist_ok=True)
    logger = make_logger(args.output_dir)
    for key, val in sorted(vars(args).items()):
        logger.info(f"{key:20} {val}")

    # ---------------- assets / body model ----------------
    if args.synthetic_data:
        assets = GarmentAssets.synthetic(name=cfg.GARMENT.NAME,
                                         num_rings=12, ring_size=16)
        body_models = {g: smpl.synthetic_smpl(num_verts=400, seed=s)
                       for s, g in enumerate(("male", "female"))}
        npoints = min(args.npoints, 2048)
    else:
        assets = GarmentAssets.from_files(
            cfg.GARMENT.NAME, cfg.GARMENT.TEMPLATE, cfg.GARMENT.PCACOMPONENTSFILE,
            pca_dim=cfg.GARMENT.PCADIM)
        body_models = {}
        for gender in ("male", "female"):
            for ext in ("npz", "pkl"):
                p = os.path.join(args.smpl_model_dir, f"SMPL_{gender.upper()}.{ext}")
                if os.path.exists(p):
                    body_models[gender] = smpl.load_smpl(p)
                    break
            else:
                raise FileNotFoundError(
                    f"SMPL_{gender.upper()} not found in {args.smpl_model_dir}")
        npoints = cfg.NETWORK.NPOINTS
    body_model = body_models["male"]
    body_faces_t = body_model.faces  # (F, 3) int array

    # ---------------- data ----------------
    import math

    n_dev = math.gcd(args.batch_size, len(jax.devices()))
    mesh = make_mesh(jax.devices()[:n_dev])
    if n_dev != len(jax.devices()):
        logger.info(f"batch {args.batch_size}: using {n_dev} of "
                    f"{len(jax.devices())} devices for dp")
    check_batch_divisible(args.batch_size, mesh)

    if args.synthetic_data:
        from garment4d_tpu.data.synthetic import make_batch

        def batches_fn(split_seed):
            def gen(epoch):
                for i in range(2):
                    b = make_batch(assets, body_model, batch_size=args.batch_size,
                                   T=args.T, npoints=npoints,
                                   seed=split_seed * 1000 + epoch * 10 + i)
                    yield shard_batch(b, mesh)
            return gen
        train_batches, eval_batches = batches_fn(0), batches_fn(1)
    else:
        from garment4d_tpu.data.cloth3d import (
            Cloth3dDataset,
            Cloth3dPaths,
            finalize_batch,
        )

        paths = Cloth3dPaths(
            root=cfg.DATASET.ROOT_FOLDER,
            cloth3d_folder=cfg.DATASET.CLOTH3D_FOLDER,
            garment_folder=cfg.DATASET.GARMENT_FOLDER,
            template_prefix=cfg.DATASET.GARMENT_TEMPLATE_T_POSE_PREFIX)
        ds_train = Cloth3dDataset(
            paths, cfg.DATASET.TRAIN_F_LIST, cfg.GARMENT.NAME, T=args.T,
            npoints=npoints, pca_dim=cfg.GARMENT.PCADIM, is_train=True,
            exclude_list=cfg.DATASET.EXCLUDE_SEQ_LIST or None,
            body_verts=body_model.num_verts)
        ds_eval = Cloth3dDataset(
            paths, cfg.DATASET.EVAL_F_LIST, cfg.GARMENT.NAME, T=args.T,
            npoints=npoints, pca_dim=cfg.GARMENT.PCADIM, is_train=False,
            exclude_list=cfg.DATASET.EXCLUDE_SEQ_LIST or None,
            body_verts=body_model.num_verts)
        logger.info(f"train windows: {len(ds_train)}  eval windows: {len(ds_eval)}")

        from garment4d_tpu.data.pipeline import ParallelItemLoader
        from garment4d_tpu.parallel.mesh import local_batch_indices

        def make_gen(ds, shuffle, drop_last):
            # --num_workers threads overlap the per-item disk reads with
            # device compute (reference DataLoader(num_workers=8),
            # `train_temporal.py:85-107`); 0 = synchronous
            loader = ParallelItemLoader(ds.raw_item,
                                        num_workers=args.num_workers)

            def gen(epoch):
                order = np.arange(len(ds))
                if shuffle:
                    np.random.RandomState(epoch).shuffle(order)
                bs = args.batch_size
                stop = len(order) - bs + 1 if drop_last else len(order)
                metas = []
                for i in range(0, stop, bs):
                    idxs = list(order[i:i + bs])
                    # pad the eval tail with repeats (reference eval sampler
                    # pads, `utils/train_utils.py:12-31`); the mask excludes
                    # the duplicates from eval metric means
                    n_real = len(idxs)
                    while len(idxs) < bs:
                        idxs.append(idxs[-1])
                    mask = (np.arange(bs) < n_real).astype(np.float32)
                    # multi-host: each process reads only its slice of the
                    # global batch; shard_batch assembles the global arrays
                    metas.append((local_batch_indices(idxs),
                                  mask if (not shuffle and n_real < bs)
                                  else None))
                for (_, mask), items in zip(
                        metas, loader.map_batches([m[0] for m in metas])):
                    raw = ds.collate(items)
                    batch = finalize_batch(raw, body_models)
                    if mask is not None:
                        batch["valid_mask"] = local_batch_indices(mask)
                    yield shard_batch(batch, mesh)
            return gen
        train_batches = make_gen(ds_train, True, drop_last=True)
        eval_batches = make_gen(ds_eval, False, drop_last=False)

    # ---------------- model ----------------
    example = next(train_batches(0))
    compute_dtype = jnp.bfloat16 if args.bf16 else None
    if args.GarmentPCALBS and args.MGN:
        model = MgnGarmentModel(assets=assets, body_faces=body_faces_t)
    elif args.GarmentPCALBS:
        model = PosedGarmentModel(
            assets=assets, body_faces=body_faces_t,
            lbs_k=cfg.NETWORK.LBSK, iterations=cfg.NETWORK.ITERATION,
            remat=bool(args.remat), compute_dtype=compute_dtype,
            spatial_sample=bool(args.spatial_sample),
            candidate_reuse_margin=float(args.candidate_reuse_margin))
    elif args.GarmentPCA:
        model = CanonicalGarmentModel(assets=assets, only_seg=bool(args.only_seg),
                                      compute_dtype=compute_dtype)
    else:
        raise SystemExit("select a stage: --GarmentPCA 1 or --GarmentPCALBS 1")

    from garment4d_tpu.train.step import body_inputs_from_batch

    init_rng = jax.random.PRNGKey(0)
    if args.GarmentPCALBS:
        variables = jax.jit(model.init, static_argnames=("train",))(
            init_rng, example["pcd"], body_inputs_from_batch(example), train=False)
    else:
        variables = jax.jit(model.init, static_argnames=("train",))(
            init_rng, example["pcd"], train=False)

    # checkpoint restore paths (parity with train_temporal.py:136-178)
    if args.pretrained_model:
        variables, report = ckpt_lib.load_pretrained(args.pretrained_model, variables)
        logger.info(f"loaded {len(report['loaded'])} tensors from "
                    f"{args.pretrained_model}; skipped {len(report['skipped'])}")
    if args.GarmentPCA_pretrain:
        canon_vars, report = ckpt_lib.load_pretrained(
            args.GarmentPCA_pretrain,
            {"params": variables["params"].get("canonical", {}),
             "batch_stats": variables.get("batch_stats", {}).get("canonical", {})})
        variables = ckpt_lib.bootstrap_canonical(canon_vars, variables)
        logger.info(f"bootstrapped canonical encoder from {args.GarmentPCA_pretrain}")

    state = make_state_for(model, variables, assets, lr=args.lr,
                           freeze_canonical=bool(args.fix_PCA))

    # auto-resume from an existing checkpoint in output_dir (parity with the
    # reference's build(), `train_temporal.py:136-156`)
    start_epoch = 0
    auto_ckpt = os.path.join(args.output_dir, "ckpt", args.ckpt_name)
    if os.path.isdir(auto_ckpt) and not args.only_eval:
        state, start_epoch, other = ckpt_lib.restore_checkpoint(auto_ckpt, state)
        logger.info(f"auto-resumed from {auto_ckpt} at epoch {start_epoch} "
                    f"(best {other.get('best_v_l2')})")

    weights = cfg.LOSS
    if args.GarmentPCALBS:
        train_step, eval_step = make_posed_steps(
            model, assets, body_model.faces, weights)
        eval_metric = "lbs_garment_msre"
    else:
        train_step, eval_step = make_canonical_steps(
            model, assets, body_model.faces, weights,
            only_seg=bool(args.only_seg))
        eval_metric = "garment_msre" if not args.only_seg else "total_loss"

    ckpt_dir = os.path.join(args.output_dir, "ckpt", args.ckpt_name)

    if args.only_eval:
        if args.vis:
            _export_predictions(args, model, state, eval_batches(0), assets,
                                body_model, logger)
        means = eval_one_epoch(state, eval_batches(0), eval_step, logger=logger)
        logger.info(f"EVAL RESULT: {eval_metric}={means.get(eval_metric):.6f}")
        print({k: round(v, 6) for k, v in sorted(means.items())})
        return means

    def save_fn(st, epoch, best):
        ckpt_lib.save_checkpoint(ckpt_dir, st, epoch, {"best_v_l2": best})

    state, history = fit(
        state, train_batches, eval_batches, train_step, eval_step,
        epochs=args.epoch_num, output_dir=args.output_dir,
        use_plateau=bool(args.lr_sche), eval_metric=eval_metric,
        save_fn=save_fn, logger=logger)
    return history


def _export_predictions(args, model, state, batches, assets, body_model,
                        logger, max_batches: int = 2):
    """--vis: dump per-frame predictions (seg-coloured PLY + OBJs) for the
    first eval batches (working replacement for the reference's unreachable
    aggregation/vis path, SURVEY.md 2.7)."""
    import numpy as np
    import jax

    from garment4d_tpu.data.export import export_frame
    from garment4d_tpu.train.step import body_inputs_from_batch

    vis_dir = os.path.join(args.output_dir, "vis")
    os.makedirs(vis_dir, exist_ok=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "constants": {k: v for k, v in state.constants.items()
                               if k != "loss_lap_adj"}}
    for bi, batch in enumerate(batches):
        if bi >= max_batches:
            break
        if args.GarmentPCALBS:
            out = model.apply(variables, batch["pcd"],
                              body_inputs_from_batch(batch), train=False)
            pred = np.asarray(out.iter_garment_v[-1])  # (B, T, Vg, 3)
        else:
            out = model.apply(variables, batch["pcd"], train=False)
            pred = np.asarray(out.tpose_garment)[:, None]  # (B, 1, Vg, 3)
        pcd = np.asarray(batch["pcd"])
        labels = np.asarray(
            jax.numpy.argmax(out.backbone.sem_logits, -1)
            if not args.GarmentPCALBS
            else jax.numpy.argmax(out.canonical.backbone.sem_logits, -1))
        B, T = pcd.shape[:2]
        labels = labels.reshape(B, T, -1)
        for b in range(B):
            for t in range(min(T, pred.shape[1])):
                export_frame(
                    vis_dir, f"b{bi}_s{b}_f{t}",
                    {"pcd": pcd[b, t], "pcd_labels": labels[b, t],
                     "pred_garment": pred[b, t],
                     "gt_garment": np.asarray(batch["garment"])[b, t]
                     if args.GarmentPCALBS else
                     np.asarray(batch["garment_template_vertices"])[b],
                     "body": np.asarray(batch["smpl_vertices"])[b, t]},
                    garment_faces=assets.faces_tri,
                    body_faces=body_model.faces)
    logger.info(f"wrote visualisations to {vis_dir}")


if __name__ == "__main__":
    main()
