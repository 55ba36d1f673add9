"""Jitted train / eval steps for both stages.

The whole step (forward, losses, backward, Adam update, metric means) is one
XLA program; under a data-parallel mesh the batch axis is sharded and XLA
inserts the gradient/metric all-reduces (replacing the reference's DDP
all-reduce + pickle-file metric merge, `utils/train_utils.py:213-237`).

Model buffers (PCA basis, graph operators, the posed-stage Laplacian) live in
the TrainState's `constants` pytree so they enter the program as runtime
inputs, not multi-MB HLO constants.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional

import numpy as np

import jax
import jax.numpy as jnp

from garment4d_tpu import losses as L
from garment4d_tpu.models import BodyInputs
from garment4d_tpu.train.state import TrainState

Array = jax.Array

LAP_ADJ_KEY = "loss_lap_adj"  # posed-stage Laplacian, stored in constants


def body_inputs_from_batch(batch: Dict[str, Array]) -> BodyInputs:
    return BodyInputs(
        pose=batch["pose"],
        smpl_vertices=batch["smpl_vertices"],
        tpose_vertices=batch["tpose_smpl_vertices"],
        tpose_root_joints=batch["tpose_smpl_root_joints"],
        zeropose_vertices=batch["zeropose_smpl_vertices"],
        J_regressor=batch["J_regressor"],
        lbs_weights=batch["lbs_weights"],
    )


def _model_constants(state: TrainState) -> dict:
    return {k: v for k, v in state.constants.items() if k != LAP_ADJ_KEY}


def make_canonical_steps(model, assets, body_faces: np.ndarray,
                         weights: Optional[L.LossWeights] = None,
                         only_seg: bool = False):
    """Returns (train_step, eval_step) for the canonical stage."""
    weights = weights or L.LossWeights()

    def loss_fn(params, state, batch, dropout_rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats,
             "constants": _model_constants(state)},
            batch["pcd"], train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"])
        loss_dict = L.canonical_stage_loss(
            out, batch, assets.faces_tri, body_faces, weights, only_seg=only_seg)
        return loss_dict["total_loss"], (loss_dict, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, dropout_rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (loss_dict, new_stats)), grads = grad_fn(
            state.params, state, batch, dropout_rng)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_stats)
        return state, loss_dict

    @jax.jit
    def eval_step(state: TrainState, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "constants": _model_constants(state)},
            batch["pcd"], train=False)
        # optional (B,) mask excluding eval-tail padding duplicates from the
        # metric means (the reference's padding sampler never masks them)
        return L.canonical_stage_loss(
            out, batch, assets.faces_tri, body_faces, weights,
            only_seg=only_seg, valid=batch.get("valid_mask"))

    return train_step, eval_step


def make_posed_steps(model, assets, body_faces: np.ndarray,
                     weights: Optional[L.LossWeights] = None):
    """Returns (train_step, eval_step) for the posed stage. The canonical
    encoder's BatchNorm stays in inference mode inside the posed model
    (reference freezes its BN when --fix_PCA, `train_temporal.py:227-233`)."""
    from garment4d_tpu.ops.graph import bandwidth_permutation, cyclic_diagonals

    weights = weights or L.LossWeights()
    # grid/ring-ordered templates: the loss Laplacian is cyclic-banded and
    # the V x V matmuls collapse to shifted multiply-adds (ops/graph.py).
    # Non-grid-coherent vertex orders recover a band via the same RCM
    # relabeling the model's refinement stack uses (exact - the loss means
    # per-vertex norms, which a permutation only reorders); only genuinely
    # wide graphs keep the dense V x V matmul.
    lap_offsets = cyclic_diagonals(np.asarray(assets.lap_adj))
    lap_perm = None
    if lap_offsets is None:
        perm, offs = bandwidth_permutation(np.asarray(assets.lap_adj))
        if offs is not None:
            lap_perm, lap_offsets = jnp.asarray(perm), offs

    def loss_fn(params, state, batch, dropout_rng):
        out, mutated = model.apply(
            {"params": params, "batch_stats": state.batch_stats,
             "constants": _model_constants(state)},
            batch["pcd"], body_inputs_from_batch(batch), train=True,
            rngs={"dropout": dropout_rng},
            mutable=["batch_stats"])
        lap_adj = state.constants[LAP_ADJ_KEY]
        loss_dict = L.posed_stage_loss(out, batch, lap_adj, body_faces,
                                       weights, lap_offsets=lap_offsets,
                                       lap_perm=lap_perm)
        return loss_dict["total_loss"], (loss_dict, mutated["batch_stats"])

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, batch, dropout_rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (_, (loss_dict, new_stats)), grads = grad_fn(
            state.params, state, batch, dropout_rng)
        state = state.apply_gradients(grads)
        state = state.replace(batch_stats=new_stats)
        return state, loss_dict

    @jax.jit
    def eval_step(state: TrainState, batch):
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             "constants": _model_constants(state)},
            batch["pcd"], body_inputs_from_batch(batch), train=False)
        lap_adj = state.constants[LAP_ADJ_KEY]
        return L.posed_stage_loss(out, batch, lap_adj, body_faces, weights,
                                  valid=batch.get("valid_mask"),
                                  lap_offsets=lap_offsets,
                                  lap_perm=lap_perm)

    return train_step, eval_step


def make_state_for(model, variables, assets, lr: float,
                   freeze_canonical: bool = False) -> TrainState:
    """Build a TrainState from freshly-initialised flax variables, wiring the
    model's constants collection (plus the loss-side Laplacian) through."""
    from garment4d_tpu.train.state import create_train_state

    constants = dict(variables.get("constants", {}))
    constants[LAP_ADJ_KEY] = jnp.asarray(assets.lap_adj)
    return create_train_state(
        variables["params"], variables.get("batch_stats", {}),
        lr=lr, freeze_canonical=freeze_canonical, constants=constants)
