"""Train the pipeline to convergence on synthetic data at BENCH shapes.

Every remaining perf lever (spatial_sample/Morton windows, grouped garment-PE
kernels, candidate reuse across GCN iterations - PLAN round-2 candidates
1a/3) is gated on realistic hit densities that random-init weights don't
produce: an untrained seg head selects near-arbitrary "garment" points, so
the garment-PE queries see near-zero hit density and every window/grouping
optimisation loses to its own overhead. This tool trains canonical (seg +
garment encoder) then posed (GCN refinement) on the same synthetic generator
`bench.py` uses, at the same production shapes (N=6890 body, Vg=2000
garment, T=10), and saves a compact npz the bench loads as its
trained-weights mode.

    python tools/train_synth.py                      # both stages
    python tools/train_synth.py --steps-canonical 600 --steps-posed 300
    python tools/train_synth.py --out ckpt_synth

Outputs (under --out):
    canonical/           orbax dir (stage-1 weights, reusable for bootstrap)
    posed_synth.npz      flattened params+batch_stats of the posed model,
                         loaded by `bench.py` when present (see bench.py)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--steps-canonical", type=int, default=600)
    p.add_argument("--steps-posed", type=int, default=300)
    p.add_argument("--out", default="ckpt_synth")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--log-every", type=int, default=25)
    p.add_argument("--resume-canonical", action="store_true",
                   help="restore <out>/canonical instead of retraining "
                        "stage 1 (posed stage only)")
    args = p.parse_args(argv)

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_garment4d")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp

    from garment4d_tpu import smpl
    from garment4d_tpu.data.synthetic import make_batch
    from garment4d_tpu.models import (
        CanonicalGarmentModel,
        GarmentAssets,
        PosedGarmentModel,
    )
    from garment4d_tpu.train import checkpoint as ckpt_lib
    from garment4d_tpu.train.step import (
        body_inputs_from_batch,
        make_canonical_steps,
        make_posed_steps,
        make_state_for,
    )

    os.makedirs(args.out, exist_ok=True)
    t0 = time.time()

    def log(msg):
        print(f"[train_synth +{time.time() - t0:7.1f}s] {msg}", flush=True)

    # ---- bench shapes (keep in sync with bench.py worker) -----------------
    B, T, N, lbs_k = args.batch_size, 10, 6890, 256
    assets = GarmentAssets.synthetic(num_rings=125, ring_size=16)  # Vg=2000
    body_model = smpl.synthetic_smpl(num_verts=6890)

    log(f"building {8} train + 1 eval synthetic batches (B={B} T={T} N={N})")
    train_batches = [
        make_batch(assets, body_model, batch_size=B, T=T, npoints=N, seed=s)
        for s in range(8)]
    eval_batch = make_batch(assets, body_model, batch_size=B, T=T,
                            npoints=N, seed=100)

    # ================= stage 1: canonical =================================
    canon = CanonicalGarmentModel(assets=assets)
    variables = jax.jit(canon.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), train_batches[0]["pcd"], train=False)
    c_train, c_eval = make_canonical_steps(canon, assets, body_model.faces)
    state = make_state_for(canon, variables, assets, lr=args.lr)

    @jax.jit
    def seg_acc(params, batch_stats, constants, batch):
        out = canon.apply(
            {"params": params, "batch_stats": batch_stats,
             "constants": constants},
            batch["pcd"], train=False)
        pred = jnp.argmax(out.backbone.sem_logits, -1)
        labels = batch["pcd_label"].reshape(pred.shape)
        return jnp.mean((pred == labels).astype(jnp.float32))

    def eval_canonical(state):
        from garment4d_tpu.train.step import _model_constants

        acc = float(seg_acc(state.params, state.batch_stats,
                            _model_constants(state), eval_batch))
        ev = c_eval(state, eval_batch)
        return acc, float(ev["total_loss"]), float(ev["garment_msre"])

    rng = jax.random.PRNGKey(42)

    def snapshot(state):
        return jax.tree_util.tree_map(
            lambda x: jnp.array(x) if isinstance(x, jax.Array) else x, state)

    def run_stage(name, state, steps, train_fn, report_fn):
        """Train `steps` steps with NaN rollback: the synthetic task is
        near-exactly learnable, and late in training a loss spike can blow
        through Adam into NaN params (seen at canonical step ~575). On a
        non-finite train loss, restore the last log-interval snapshot and
        halve the plateau lr_scale instead of aborting.

        The first compile goes through the relay's remote-compile helper,
        which can fail transiently (observed HTTP 500 on the posed train
        step); pre-compile under retry so the persistent cache has the
        artifact before any state is donated."""
        from garment4d_tpu.utils.relay import call_with_retry

        nonlocal rng
        call_with_retry(
            lambda: train_fn.lower(state, train_batches[0],
                                   jax.random.PRNGKey(0)).compile(),
            attempts=3, delay_s=20.0, label=f"{name} train-step compile")
        good = snapshot(state)
        step = 0
        while step < steps:
            rng, drop = jax.random.split(rng)
            batch = train_batches[step % len(train_batches)]
            state, loss_dict = train_fn(state, batch, drop)
            if step % args.log_every == 0 or step == steps - 1:
                loss = float(loss_dict["total_loss"])
                if not np.isfinite(loss):
                    state = good.replace(lr_scale=good.lr_scale * 0.5)
                    good = snapshot(state)
                    log(f"{name} step {step:4d} NON-FINITE loss; rolled "
                        f"back, lr_scale -> {float(state.lr_scale):.4f}")
                    step += 1
                    continue
                log(f"{name} step {step:4d} train_loss={loss:8.4f} "
                    + report_fn(state))
                good = snapshot(state)
            step += 1
        return good  # last known-finite state

    canon_dir = os.path.join(os.path.abspath(args.out), "canonical")
    if args.resume_canonical and os.path.isdir(canon_dir):
        state, _, _ = ckpt_lib.restore_checkpoint(canon_dir, state)
        final_acc, _, _ = eval_canonical(state)
        log(f"canonical restored from {canon_dir}: seg_acc={final_acc:.4f}")
    else:
        log(f"canonical stage: {args.steps_canonical} steps (compiling...)")

        def canon_report(state):
            acc, ev_loss, msre = eval_canonical(state)
            return (f"eval_loss={ev_loss:8.4f} seg_acc={acc:.4f} "
                    f"msre={msre:.4f}")

        state = run_stage("canonical", state, args.steps_canonical, c_train,
                          canon_report)

        ckpt_lib.save_checkpoint(canon_dir, state, epoch=0)
        final_acc, _, _ = eval_canonical(state)
        log(f"canonical done: seg_acc={final_acc:.4f}, saved {canon_dir}")
    canonical_vars = {"params": state.params,
                      "batch_stats": state.batch_stats}

    # ================= stage 2: posed =====================================
    posed = PosedGarmentModel(assets=assets, body_faces=body_model.faces,
                              lbs_k=lbs_k, iterations=3)
    body = body_inputs_from_batch(train_batches[0])
    p_vars = jax.jit(posed.init, static_argnames=("train",))(
        jax.random.PRNGKey(0), train_batches[0]["pcd"], body, train=False)
    p_vars = ckpt_lib.bootstrap_canonical(canonical_vars, p_vars)
    p_train, p_eval = make_posed_steps(posed, assets, body_model.faces)
    p_state = make_state_for(posed, p_vars, assets, lr=args.lr,
                             freeze_canonical=True)

    log(f"posed stage: {args.steps_posed} steps (compiling...)")

    def posed_report(state):
        ev = p_eval(state, eval_batch)
        return (f"eval_loss={float(ev['total_loss']):8.4f} "
                f"msre={float(ev['lbs_garment_msre']):.4f} "
                f"only_lbs={float(ev['only_lbs_garment_msre']):.4f}")

    p_state = run_stage("posed", p_state, args.steps_posed, p_train,
                        posed_report)

    out_npz = os.path.join(args.out, "posed_synth.npz")
    ckpt_lib.save_variables_npz(
        out_npz, {"params": p_state.params,
                  "batch_stats": p_state.batch_stats})
    size_mb = os.path.getsize(out_npz) / 1e6
    log(f"posed done, saved {out_npz} ({size_mb:.1f} MB)")


if __name__ == "__main__":
    main()
