"""Training state: optimizer, plateau schedule, parameter freezing.

Replaces the reference's torch Adam + ReduceLROnPlateau + DDP param-group
machinery (`train_temporal.py:124-187`):

  * Adam with the torch defaults the reference relies on (eps 1e-8,
    betas (0.9, 0.999)),
  * `fix_PCA`-style freezing via `optax.masked` zero-updates on the
    `canonical` subtree (instead of DDP find_unused_parameters),
  * ReduceLROnPlateau(patience=8, factor=0.1) as a host-driven LR scale
    carried in the state (the reference steps the scheduler with the eval
    loss once per epoch - inherently host-side logic).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    constants: Any  # non-trainable model buffers (PCA basis, graph operators)
    opt_state: Any
    lr_scale: jax.Array  # plateau-schedule multiplier
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        updates = jax.tree_util.tree_map(lambda u: u * self.lr_scale, updates)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def make_optimizer(lr: float, freeze_canonical: bool = False
                   ) -> optax.GradientTransformation:
    """Adam; optionally zero out updates to the frozen stage-1 encoder
    (reference `--fix_PCA`, `train_temporal.py:143-152`)."""
    tx = optax.adam(lr, b1=0.9, b2=0.999, eps=1e-8)
    if freeze_canonical:
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()},
            lambda params: jax.tree_util.tree_map_with_path(
                lambda path, _: "freeze"
                if jax.tree_util.keystr(path).startswith("['canonical']")
                else "train",
                params),
        )
    return tx


def create_train_state(params, batch_stats, lr: float,
                       freeze_canonical: bool = False,
                       constants=None) -> TrainState:
    tx = make_optimizer(lr, freeze_canonical=freeze_canonical)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        constants=constants if constants is not None else {},
        opt_state=tx.init(params),
        lr_scale=jnp.ones(()),
        tx=tx,
    )


@dataclasses.dataclass
class PlateauScheduler:
    """Host-side ReduceLROnPlateau with full torch semantics.

    The reference builds `ReduceLROnPlateau(optimizer, 'min', patience=8)`
    (`train_temporal.py:131`), which carries torch's defaults: factor 0.1,
    relative improvement threshold 1e-4 (`a < best * (1 - threshold)`),
    cooldown 0, min_lr 0, and the eps=1e-8 update guard. All are replicated;
    `threshold_mode`/`cooldown` matter only off the defaults but keep the
    scheduler drop-in comparable against recorded torch LR traces.
    """

    patience: int = 8
    factor: float = 0.1
    threshold: float = 1e-4
    threshold_mode: str = "rel"  # 'rel' | 'abs'
    cooldown: int = 0
    min_lr_scale: float = 0.0
    eps: float = 1e-8
    best: float = float("inf")
    num_bad: int = 0
    cooldown_counter: int = 0
    scale: float = 1.0

    def _is_better(self, a: float) -> bool:
        if self.threshold_mode == "rel":
            return a < self.best * (1.0 - self.threshold)
        return a < self.best - self.threshold

    def update(self, metric: float) -> float:
        if self._is_better(metric):
            self.best = metric
            self.num_bad = 0
        else:
            self.num_bad += 1
        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad = 0
        if self.num_bad > self.patience:
            new_scale = max(self.scale * self.factor, self.min_lr_scale)
            if self.scale - new_scale > self.eps:  # torch's update guard
                self.scale = new_scale
            self.cooldown_counter = self.cooldown
            self.num_bad = 0
        return self.scale
