"""Losses and metrics for both stages, pure JAX.

Parity with reference `smplx/loss/temporal_loss.py` and
`smplx/loss/laplacian.py`: segmentation CE, PCA-coefficient MSE, vertex
L2/MSRE, body-garment interpenetration, cotangent-Laplacian matching,
uniform-Laplacian regularisation, temporal smoothness and acceleration error.
The CPU round-trips of the reference (scipy CSR per call, torch_scatter,
openmesh) are all replaced by on-device segment-sum formulations.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from garment4d_tpu import ops

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class LossWeights:
    """The 9 lambdas of cfg.LOSS (reference `cfgs/*.yaml`)."""

    sem_seg: float = 0.05
    garment_l2: float = 40.0
    garment_lap: float = 1.0
    interpenetration: float = 50.0
    garment_pca_coeff_l2: float = 0.001
    lbs_garment_l2: float = 20.0
    lbs_garment_lap: float = 10.0
    lbs_interpenetration: float = 100.0
    temporal_constraint: float = 5.0


def sem_seg_loss(logits: Array, labels: Array) -> Array:
    """Cross-entropy over the 7 point classes (reference
    `temporal_loss.py:76-81`). logits: (..., C), labels: (...) int."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return -jnp.mean(picked)


def shape_l2_loss(pred: Array, target: Array) -> Array:
    """Plain MSE (reference `calc_shape_l2_loss`, `temporal_loss.py:12-15`)."""
    return jnp.mean((pred - target) ** 2)


def vertex_l2_loss(pred: Array, target: Array) -> Array:
    """Summed-per-vertex squared L2, averaged (reference
    `temporal_loss.py:97`)."""
    return jnp.mean(jnp.sum((pred - target) ** 2, axis=-1))


def vertex_msre(pred: Array, target: Array) -> Array:
    """Mean per-vertex euclidean error - the headline mm metric (reference
    `temporal_loss.py:98,163-165`)."""
    return jnp.mean(jnp.sqrt(jnp.sum((pred - target) ** 2, axis=-1)))


def interpenetration_penalties(garment_v: Array, body_v: Array,
                               body_vn: Array) -> Array:
    """relu(-n_b . (g - b)) per garment vertex against its nearest body
    vertex (reference `temporal_loss.py:20-46`). garment_v: (B, Vg, 3),
    body_v / body_vn: (B, Vb, 3) -> (B, Vg). The SINGLE copy of the
    formula - the exported loss and both stage bundles reduce this."""
    nn = ops.knn_points(garment_v, body_v, K=1)
    b = ops.group_points(body_v, nn.idx)[:, :, 0, :]   # (B, Vg, 3)
    n = ops.group_points(body_vn, nn.idx)[:, :, 0, :]
    return jax.nn.relu(-jnp.sum(n * (garment_v - b), axis=-1))  # (B, Vg)


def interpenetration_loss(garment_v: Array, body_v: Array, body_vn: Array,
                          reduce: str = "sum") -> Array:
    """Reduced `interpenetration_penalties`. reduce='sum' (the default)
    sums over vertices then means over batch - the reference HELPER's form
    (`temporal_loss.py:20-46`); NOTE both training stages use 'mean'
    (everything meaned) via the stage bundles, which pair it with the
    reference's lambda values - pass reduce='mean' to match training."""
    pen = interpenetration_penalties(garment_v, body_v, body_vn)
    if reduce == "sum":
        return jnp.mean(jnp.sum(pen, axis=-1))
    if reduce == "mean":
        return jnp.mean(pen)
    raise ValueError(reduce)


def cot_laplacian_residuals(pred_v: Array, gt_v: Array,
                            faces_tri: np.ndarray) -> Array:
    """| ||L(pred) pred|| - ||L(gt) gt|| | per vertex (the single formula
    copy; reference `laplacian.py:454-467` + `temporal_loss.py:48-58`):
    each side's Laplacian is built from its own vertices; weights are
    constants w.r.t. autodiff (the custom backward applies only L^T g)."""
    lx_pred = ops.cot_laplacian_apply(pred_v, pred_v, faces_tri)
    lx_gt = ops.cot_laplacian_apply(gt_v, gt_v, faces_tri)
    n_pred = jnp.linalg.norm(lx_pred, axis=-1)
    n_gt = jax.lax.stop_gradient(jnp.linalg.norm(lx_gt, axis=-1))
    return jnp.abs(n_pred - n_gt)


def cot_laplacian_loss(pred_v: Array, gt_v: Array, faces_tri: np.ndarray) -> Array:
    """mean of `cot_laplacian_residuals`."""
    return jnp.mean(cot_laplacian_residuals(pred_v, gt_v, faces_tri))


def uniform_laplacian_norms(pred_v: Array, lap_adj: Array,
                            lap_offsets=None) -> Array:
    """||(I - norm(A)) v|| per vertex (reference `temporal_loss.py:127-131`).
    pred_v: (..., V, 3), lap_adj: (V, V). `lap_offsets` (from
    `ops.graph.cyclic_diagonals(lap_adj)`) selects the banded fast path."""
    if lap_offsets is not None:
        lap = ops.graph.graph_matmul_banded(lap_adj, pred_v, lap_offsets)
    else:
        lap = ops.graph_matmul(lap_adj, pred_v)
    return jnp.linalg.norm(lap, axis=-1)


def uniform_laplacian_regularizer(pred_v: Array, lap_adj: Array,
                                  lap_offsets=None) -> Array:
    """mean of `uniform_laplacian_norms`."""
    return jnp.mean(uniform_laplacian_norms(pred_v, lap_adj, lap_offsets))


def temporal_diff_norms(pred_v: Array) -> Array:
    """||v_t - v_{t+1}|| per vertex pair (reference
    `temporal_loss.py:121-125`). pred_v: (B, T, V, 3) -> (B, T-1, V)."""
    diff = pred_v[:, :-1] - pred_v[:, 1:]
    return jnp.sqrt(jnp.sum(diff ** 2, axis=-1))


def temporal_constraint_loss(pred_v: Array) -> Array:
    """mean of `temporal_diff_norms`."""
    return jnp.mean(temporal_diff_norms(pred_v))


def acceleration_error(pred_v: Array, gt_v: Array, fps: float = 30.0) -> Array:
    """Finite-difference acceleration error metric (reference
    `temporal_loss.py:133-145`). pred_v, gt_v: (B, T, V, 3).
    Needs T >= 3 (returns 0 otherwise; the reference NaNs on the mean of an
    empty tensor)."""
    if pred_v.shape[1] < 3:
        return jnp.zeros(())
    dt = 1.0 / fps

    def accel(v):
        vel = (v[:, 1:] - v[:, :-1]) / dt
        return (vel[:, 1:] - vel[:, :-1]) / dt

    err = jnp.sqrt(jnp.sum((accel(pred_v) - accel(gt_v)) ** 2, axis=-1))
    return jnp.mean(err)


# ---------------------------------------------------------------------------
# stage-level loss bundles
# ---------------------------------------------------------------------------


def _bmean(x: Array, batch: int, valid: Array) -> Array:
    """Masked batch mean: per-sample means of x (leading dim `batch` or a
    multiple of it, i.e. B*T), weighted by the (B,) validity mask. Used to
    exclude eval-tail padding duplicates from metric means (the reference's
    padding sampler, `utils/train_utils.py:12-31`, never masks them out)."""
    per = x.reshape(batch, -1).mean(axis=1)  # (B,) per-sample means
    w = valid.astype(per.dtype)
    return jnp.sum(per * w) / jnp.maximum(jnp.sum(w), 1.0)


def canonical_stage_loss(output, batch: Dict[str, Array], faces_tri: np.ndarray,
                         body_faces: np.ndarray, weights: LossWeights,
                         only_seg: bool = False,
                         valid: Array = None) -> Dict[str, Array]:
    """All canonical-stage losses (reference `temporal_loss_PCA`,
    `temporal_loss.py:60-119`). `output` is a CanonicalOutput; `batch` uses the
    data-pipeline keys (SURVEY.md 2.5). `valid` is an optional (B,) mask
    excluding eval-tail padding duplicates; None keeps the reference's
    plain means bit-for-bit."""
    B, T = batch["pose"].shape[:2]
    losses: Dict[str, Array] = {}
    total = 0.0

    def mean(x):
        return jnp.mean(x) if valid is None else _bmean(x, B, valid)

    logits = output.backbone.sem_logits.reshape(B * T, -1, logits_dim(output))
    labels = batch["pcd_label"].reshape(B * T, -1).astype(jnp.int32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    picked = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    l_seg = mean(-picked.reshape(B, -1))
    losses["sem_seg_loss"] = l_seg
    total = total + l_seg * weights.sem_seg

    if only_seg:
        losses["total_loss"] = total
        return losses

    l_pca = mean((output.pca_coeff - batch["pca_coeff"]) ** 2)
    losses["garment_pca_coeff_l2"] = l_pca
    total = total + l_pca * weights.garment_pca_coeff_l2

    gt_garment = batch["garment_template_vertices"]  # (B, V, 3)
    pred = output.tpose_garment
    sq = jnp.sum((pred - gt_garment) ** 2, axis=-1)
    losses["garment_l2_loss"] = mean(sq)
    losses["garment_msre"] = mean(jnp.sqrt(sq))
    total = total + losses["garment_l2_loss"] * weights.garment_l2

    tpose_body = batch["tpose_smpl_vertices"]  # (B, 6890, 3)
    body_vn = ops.vertex_normals(tpose_body, body_faces)
    garment_rooted = pred + batch["tpose_smpl_root_joints"][:, None, :]
    l_pen = mean(interpenetration_penalties(garment_rooted, tpose_body,
                                            body_vn))
    losses["interpenetration_loss"] = l_pen
    total = total + l_pen * weights.interpenetration

    l_lap = mean(cot_laplacian_residuals(pred, gt_garment, faces_tri))
    losses["garment_lap_loss"] = l_lap
    total = total + l_lap * weights.garment_lap

    losses["total_loss"] = total
    return losses


def posed_stage_loss(output, batch: Dict[str, Array], lap_adj: Array,
                     body_faces: np.ndarray, weights: LossWeights,
                     valid: Array = None, lap_offsets=None,
                     lap_perm=None) -> Dict[str, Array]:
    """All posed-stage losses (reference `temporal_loss_PCA_LBS`,
    `temporal_loss.py:147-201`). `output` is a PosedOutput. `valid` is an
    optional (B,) mask excluding eval-tail padding duplicates. `lap_offsets`
    (see `uniform_laplacian_norms`) enables the banded Laplacian;
    `lap_perm` (V,) applies a band-recovering vertex relabeling first
    (exact: ||P L P^T (P x)|| = P ||L x||, and the mean is
    permutation-invariant - see `ops.graph.bandwidth_permutation`)."""
    B, T = batch["pose"].shape[:2]
    losses: Dict[str, Array] = {}
    total = 0.0

    def mean(x):
        return jnp.mean(x) if valid is None else _bmean(x, B, valid)

    root = batch["smpl_root_joints"].reshape(B, T, 1, 3)
    gt_garment = batch["garment"] + root  # (B, T, Vg, 3)

    l2_acc = 0.0
    for i, pred in enumerate(output.iter_garment_v):
        l2_acc = l2_acc + mean(jnp.sum((pred - gt_garment) ** 2, axis=-1))
        if i == len(output.iter_garment_v) - 1:
            per_frame = jnp.mean(
                jnp.sqrt(jnp.sum((pred - gt_garment) ** 2, axis=-1)), axis=-1)
            losses["lbs_garment_msre"] = mean(per_frame)
            losses["lbs_garment_msre_list"] = per_frame  # (B, T)
    losses["only_lbs_garment_msre"] = mean(jnp.sqrt(jnp.sum(
        (output.lbs.posed_garment - gt_garment) ** 2, axis=-1)))
    losses["lbs_garment_l2_loss"] = l2_acc
    total = total + l2_acc * weights.lbs_garment_l2

    la = lap_adj
    if lap_perm is not None:
        la = jnp.take(jnp.take(lap_adj, lap_perm, axis=0), lap_perm, axis=1)
    lap_acc = 0.0
    for pred in output.iter_garment_v:
        p = pred if lap_perm is None else jnp.take(pred, lap_perm, axis=-2)
        lap_acc = lap_acc + mean(uniform_laplacian_norms(p, la, lap_offsets))
    losses["lbs_garment_lap_loss"] = lap_acc
    total = total + lap_acc * weights.lbs_garment_lap

    body_v = batch["smpl_vertices"].reshape(B * T, -1, 3)
    body_vn = ops.vertex_normals(body_v, body_faces)
    pen_acc = 0.0
    for pred in output.iter_garment_v:
        pen = interpenetration_penalties(pred.reshape(B * T, -1, 3), body_v,
                                         body_vn)
        pen_acc = pen_acc + mean(pen.reshape(B, -1))
    losses["lbs_interpenetration_loss"] = pen_acc
    total = total + pen_acc * weights.lbs_interpenetration

    last = output.iter_garment_v[-1]
    l_temp = mean(temporal_diff_norms(last))
    losses["temporal_constraint_loss"] = l_temp
    total = total + l_temp * weights.temporal_constraint

    losses["acceleration_error"] = _accel_err(last, gt_garment, mean)
    losses["only_lbs_acceleration_error"] = _accel_err(
        output.lbs.posed_garment, gt_garment, mean)

    losses["total_loss"] = total
    return losses


def _accel_err(pred_v: Array, gt_v: Array, mean, fps: float = 30.0) -> Array:
    if pred_v.shape[1] < 3:
        return jnp.zeros(())
    dt = 1.0 / fps

    def accel(v):
        vel = (v[:, 1:] - v[:, :-1]) / dt
        return (vel[:, 1:] - vel[:, :-1]) / dt

    return mean(jnp.sqrt(jnp.sum((accel(pred_v) - accel(gt_v)) ** 2, axis=-1)))


def logits_dim(output) -> int:
    return output.backbone.sem_logits.shape[-1]
