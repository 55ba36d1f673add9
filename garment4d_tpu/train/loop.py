"""Training driver: epoch loops, metric accumulation, logging, best-ckpt save.

Replaces the reference's `train_temporal.py` runtime (build / train_one_epoch /
eval_one_epoch / main loops, `train_temporal.py:23-422`):

  * one jitted step per batch; metrics come back as device scalars and are
    accumulated host-side (the reference's 15-key acc_list,
    `train_temporal.py:206-222`),
  * cross-device metric reduction happens inside the jitted step via XLA
    (replacing the pickle-file `merge_results`, `utils/train_utils.py:213-237`),
  * TensorBoard scalars with the reference's tag scheme
    (`Train/{i}_{loss}`, `LR`, `Eval/01_v_sqrt_l2_loss`,
    `train_temporal.py:273-278,351`),
  * ReduceLROnPlateau stepped with the eval total loss, best-checkpoint save
    on eval improvement (`train_temporal.py:394-405`).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Iterable, Optional

import numpy as np

import jax

from garment4d_tpu.train.state import PlateauScheduler, TrainState


def make_logger(output_dir: Optional[str] = None, name: str = "garment4d_tpu"):
    logger = logging.getLogger(name)
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fmt = logging.Formatter("%(asctime)s | %(levelname)s | %(message)s")
        sh = logging.StreamHandler()
        sh.setFormatter(fmt)
        logger.addHandler(sh)
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            fh = logging.FileHandler(os.path.join(output_dir, "log.txt"))
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    return logger


class MetricWriter:
    """TensorBoard + JSONL scalar writer (rank-0 style, single controller)."""

    def __init__(self, output_dir: Optional[str]):
        self._tb = None
        self._jsonl = None
        if output_dir:
            os.makedirs(os.path.join(output_dir, "summary"), exist_ok=True)
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(output_dir, "summary"))
            except Exception:
                self._tb = None
            self._jsonl = open(os.path.join(output_dir, "metrics.jsonl"), "a")

    def scalar(self, tag: str, value: float, step: int):
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)
        if self._jsonl is not None:
            self._jsonl.write(json.dumps(
                {"tag": tag, "value": float(value), "step": int(step)}) + "\n")
            self._jsonl.flush()

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._jsonl is not None:
            self._jsonl.close()


class MetricAccumulator:
    def __init__(self):
        self.sums: Dict[str, float] = {}
        self.count = 0.0

    def add(self, loss_dict: Dict[str, jax.Array], weight: float = 1.0):
        """`weight` is the batch's valid-sample count when eval-tail padding
        masks are in play, so duplicated samples don't skew dataset means."""
        host = {k: np.asarray(v) for k, v in loss_dict.items()
                if np.asarray(v).ndim == 0}
        for k, v in host.items():
            self.sums[k] = self.sums.get(k, 0.0) + float(v) * weight
        self.count += weight

    def means(self) -> Dict[str, float]:
        return {k: v / max(self.count, 1e-12) for k, v in self.sums.items()}


def train_one_epoch(state: TrainState, batches: Iterable, train_step,
                    rng: jax.Array, writer: Optional[MetricWriter] = None,
                    epoch: int = 0, steps_per_epoch: Optional[int] = None,
                    logger=None, progress: bool = False):
    """Runs one epoch; returns (state, mean_losses)."""
    acc = MetricAccumulator()
    t0 = time.time()
    if progress:  # live loss postfix (reference `train_temporal.py:255-272`)
        try:
            from tqdm import tqdm

            batches = tqdm(batches, desc=f"epoch {epoch}", leave=False)
        except ImportError:
            pass
    for i, batch in enumerate(batches):
        rng, step_rng = jax.random.split(rng)
        state, loss_dict = train_step(state, batch, step_rng)
        acc.add(loss_dict)
        if writer is not None:
            step = epoch * (steps_per_epoch or 0) + i
            for j, (k, v) in enumerate(sorted(
                    (k, v) for k, v in loss_dict.items()
                    if np.asarray(v).ndim == 0)):
                writer.scalar(f"Train/{j:02d}_{k}", float(np.asarray(v)), step)
    means = acc.means()
    if logger is not None:
        span = time.time() - t0
        loss_str = " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
        logger.info(f"epoch {epoch} train [{span:.1f}s] {loss_str}")
    return state, means


def eval_one_epoch(state: TrainState, batches: Iterable, eval_step,
                   writer: Optional[MetricWriter] = None, epoch: int = 0,
                   logger=None) -> Dict[str, float]:
    acc = MetricAccumulator()
    for batch in batches:
        # weight each batch by its valid-sample count so padded tail
        # duplicates don't skew the dataset means (full batches weigh their
        # batch size; masked tail batches weigh the number of real samples)
        mask = batch.get("valid_mask") if isinstance(batch, dict) else None
        if mask is not None:
            weight = float(np.sum(np.asarray(mask)))
        elif isinstance(batch, dict) and "pcd" in batch:
            weight = float(batch["pcd"].shape[0])
        else:
            weight = 1.0
        acc.add(eval_step(state, batch), weight=weight)
    means = acc.means()
    if writer is not None:
        key = ("lbs_garment_msre" if "lbs_garment_msre" in means
               else "garment_msre" if "garment_msre" in means else "total_loss")
        writer.scalar("Eval/01_v_sqrt_l2_loss", means.get(key, 0.0), epoch)
    if logger is not None:
        loss_str = " ".join(f"{k}={v:.4f}" for k, v in sorted(means.items()))
        logger.info(f"epoch {epoch} eval {loss_str}")
    return means


def fit(state: TrainState, train_batches_fn, eval_batches_fn, train_step,
        eval_step, *, epochs: int, output_dir: Optional[str] = None,
        use_plateau: bool = False, eval_metric: str = "total_loss",
        save_fn: Optional[Callable] = None, seed: int = 0, logger=None):
    """Full fit loop with plateau LR schedule and best-checkpoint saving.

    `train_batches_fn(epoch)` / `eval_batches_fn(epoch)` yield batch dicts;
    `save_fn(state, epoch, best)` persists the best checkpoint.
    """
    logger = logger or make_logger(output_dir)
    writer = MetricWriter(output_dir)
    plateau = PlateauScheduler()
    rng = jax.random.PRNGKey(seed)
    best = float("inf")
    history = []
    for epoch in range(epochs):
        rng, ep_rng = jax.random.split(rng)
        state, train_means = train_one_epoch(
            state, train_batches_fn(epoch), train_step, ep_rng,
            writer=writer, epoch=epoch, logger=logger)
        eval_means = eval_one_epoch(
            state, eval_batches_fn(epoch), eval_step,
            writer=writer, epoch=epoch, logger=logger)
        metric = eval_means.get(eval_metric, eval_means.get("total_loss", 0.0))
        if use_plateau:
            scale = plateau.update(metric)
            state = state.replace(lr_scale=jax.numpy.asarray(scale))
            writer.scalar("LR", scale, epoch)
        if metric < best:
            best = metric
            if save_fn is not None:
                save_fn(state, epoch, best)
            logger.info(f"epoch {epoch}: new best {eval_metric}={best:.4f}")
        history.append({"epoch": epoch, "train": train_means, "eval": eval_means})
    writer.close()
    return state, history
