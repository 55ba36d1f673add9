"""Checkpoint save/restore (orbax) + the torch-ckpt import path.

Replaces the reference's torch.save pickles and three load paths
(`utils/train_utils.py:94-211`): full resume (params + optimizer +
other_state), pretrained-weights-only, and stage-1 -> stage-2 bootstrap
(`--GarmentPCA_pretrain`). Checkpoints are orbax PyTree directories; the
torch importer (train/torch_import.py) covers the reference's released
.ckpt files.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import numpy as np

import jax
import orbax.checkpoint as ocp

from garment4d_tpu.train.state import TrainState


def save_checkpoint(ckpt_dir: str, state: TrainState, epoch: int,
                    other_state: Optional[Dict[str, Any]] = None) -> None:
    """Save {params, batch_stats, opt_state, epoch, other_state}."""
    ckpt_dir = os.path.abspath(ckpt_dir)
    payload = {
        "params": jax.device_get(state.params),
        "batch_stats": jax.device_get(state.batch_stats),
        "opt_state": jax.device_get(state.opt_state),
        "meta": {
            "epoch": np.int64(epoch),
            "step": np.asarray(jax.device_get(state.step)),
            "lr_scale": np.asarray(jax.device_get(state.lr_scale)),
            **{f"other_{k}": np.asarray(v)
               for k, v in (other_state or {}).items()},
        },
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(ckpt_dir, payload, force=True)


def restore_checkpoint(ckpt_dir: str, state: TrainState):
    """Full resume: returns (state, epoch, other_state)."""
    ckptr = ocp.PyTreeCheckpointer()
    payload = ckptr.restore(os.path.abspath(ckpt_dir))
    # restore returns plain dicts/lists; rebuild the opt_state pytree structure
    payload["opt_state"] = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(state.opt_state),
        jax.tree_util.tree_leaves(payload["opt_state"]))
    meta = payload["meta"]
    new_state = state.replace(
        params=payload["params"],
        batch_stats=payload["batch_stats"],
        opt_state=payload["opt_state"],
        step=jax.numpy.asarray(meta["step"]),
        lr_scale=jax.numpy.asarray(meta["lr_scale"]),
    )
    other = {k[len("other_"):]: v for k, v in meta.items()
             if k.startswith("other_")}
    return new_state, int(meta["epoch"]), other


def load_pretrained(path: str, variables: dict):
    """Pretrained-weights-only load (tolerant), from either an orbax dir or a
    reference torch .ckpt (parity with `load_pretrained_model`,
    `train_utils.py:123-153`)."""
    if os.path.isdir(path):
        ckptr = ocp.PyTreeCheckpointer()
        payload = ckptr.restore(os.path.abspath(path))
        new_vars = dict(variables)
        new_vars["params"] = jax.tree_util.tree_map(
            lambda old, new: np.asarray(new, dtype=np.asarray(old).dtype),
            variables["params"], payload["params"])
        if "batch_stats" in variables and payload.get("batch_stats"):
            new_vars["batch_stats"] = jax.tree_util.tree_map(
                lambda old, new: np.asarray(new, dtype=np.asarray(old).dtype),
                variables["batch_stats"], payload["batch_stats"])
        return new_vars, {"loaded": ["<orbax full tree>"], "skipped": []}
    from garment4d_tpu.train.torch_import import (
        import_torch_checkpoint,
        load_torch_state_dict,
    )

    state_dict = load_torch_state_dict(path)
    return import_torch_checkpoint(state_dict, variables, strict=False)


def bootstrap_canonical(canonical_vars: dict, posed_vars: dict) -> dict:
    """Stage-1 -> stage-2 bootstrap: graft canonical-stage weights into the
    posed model's `canonical` subtree (reference `--GarmentPCA_pretrain`,
    `train_temporal.py:162-178`)."""
    new_vars = {k: dict(v) for k, v in posed_vars.items()}
    for coll in ("params", "batch_stats"):
        if coll in canonical_vars and coll in new_vars:
            new_vars[coll]["canonical"] = canonical_vars[coll]
    return new_vars


def save_variables_npz(path: str, variables: dict) -> None:
    """Flatten {params, batch_stats} to one compressed npz (the compact
    single-file format for the checked-in synthetic-trained bench weights;
    orbax stays the training-checkpoint format)."""
    from flax import traverse_util

    flat = traverse_util.flatten_dict(
        {"params": variables["params"],
         "batch_stats": variables.get("batch_stats", {})}, sep="/")
    np.savez_compressed(path, **{k: np.asarray(v) for k, v in flat.items()})


def load_variables_npz(path: str, variables: dict) -> dict:
    """Inverse of `save_variables_npz`: graft the saved arrays onto
    `variables` (strict - tree structure and shapes must match, which holds
    when the model was built with the same ctor args)."""
    from flax import traverse_util

    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    tree = traverse_util.unflatten_dict(flat, sep="/")
    new_vars = dict(variables)
    for coll in ("params", "batch_stats"):
        if coll in tree and coll in new_vars:
            new_vars[coll] = jax.tree_util.tree_map(
                lambda old, new: np.asarray(new, np.asarray(old).dtype),
                new_vars[coll], tree[coll])
    return new_vars
