"""Interpolated linear-blend-skinning of the canonical garment.

Parity with reference `modules/mesh_encoder.py:312-410`
(`lbs_garment_interpolation`): K-NN transfer of SMPL skinning weights from
the T-pose body to the garment vertices, un-pose to zero-pose, re-pose to
every frame; the reference's 100-iteration sparse weight-smoothing loop is
applied as one precomputed dense matmul (`ops.graph.smoothing_operator`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np

import jax
import jax.numpy as jnp

from garment4d_tpu import ops
from garment4d_tpu.smpl import (
    batch_rigid_transform,
    batch_rodrigues,
    vertices2joints_b,
)

Array = jax.Array

_MM = dict(preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)


class LbsResult(NamedTuple):
    posed_garment: Array      # (B, T, Vg, 3)
    nn_idx: Array             # (B, Vg, 1) nearest body vertex (diagnostics)
    unposed_garment: Array    # (B, T, Vg, 3) stage-1 zero-pose garment


def _inverse_template_pose(batch: int) -> Array:
    """The fixed 'template pose' inverse: root x-rot -pi/2, hips +/-0.15
    (reference `mesh_encoder.py:326-330`)."""
    pose = jnp.zeros((batch, 24, 3))
    pose = pose.at[:, 0, 0].set(-np.pi / 2)
    pose = pose.at[:, 1, 1].set(0.15)
    pose = pose.at[:, 2, 1].set(-0.15)
    return pose


def _normalize_inf_zeroed(w: Array) -> Array:
    """The reference's interpolation-weight inf handling
    (`mesh_encoder.py:341-345,374-378`): zero infs, normalise, zero infs.
    ONE copy of the semantics - used by both the plain and the masked
    (K-NN-selected) weight forms."""
    w = jnp.where(jnp.isinf(w), 0.0, w)
    w = w / jnp.sum(w, axis=-1, keepdims=True)
    return jnp.where(jnp.isinf(w), 0.0, w)


def _interp_weights(dists: Array) -> Array:
    """1/d^2 interpolation weights with the reference's inf handling."""
    return _normalize_inf_zeroed(1.0 / dists)  # dists are squared knn dists


def _kth_smallest_bits(bits: Array, k: int) -> Array:
    """Per-row k-th smallest of non-negative-f32 bit patterns (int32), by
    31-step binary search on the value. bits: (..., N) -> (..., 1).

    Non-negative IEEE-754 floats compare like their bit patterns, so the
    k-th smallest squared distance is found with compare+reduce passes
    instead of a full sort (`lax.top_k` lowers to an O(N log N) sort costing
    ~80 ms/forward at K=256 over 6890 points)."""
    lo = jnp.zeros((*bits.shape[:-1], 1), jnp.int32)
    hi = jnp.full((*bits.shape[:-1], 1), jnp.int32(0x7F7FFFFF))  # f32 max

    def step(carry, _):
        lo, hi = carry
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((bits <= mid).astype(jnp.int32), axis=-1, keepdims=True)
        found = cnt >= k  # k-th smallest is <= mid
        return (jnp.where(found, lo, mid + 1), jnp.where(found, mid, hi)), None

    (lo, _), _ = jax.lax.scan(step, (lo, hi), None, length=31)
    return lo


def _masked_weight_transfer(d2: Array, w0: Array, k: int):
    """Order-invariant K-NN skinning-weight transfer as one masked matmul.

    d2: (B, Vg, N) squared garment->body distances, w0: (B, N, J) body
    skinning weights. Selects each garment vertex's exact k nearest body
    vertices (ties at the k-th boundary broken towards lower index, matching
    chamferdist), forms the reference's 1/d^2 interpolation weights
    (`mesh_encoder.py:341-345`), and contracts them against w0 on the MXU:
    nn_W[b,v,:] = sum_n iw[b,v,n] * w0[b,n,:]. The weighted sum is invariant
    to neighbour order, so no sort and no (Vg, K, J) gather are needed -
    replaces chamferdist `knn_points` + `grouping` (`mesh_encoder.py:321-347`).
    """
    bits = jax.lax.bitcast_convert_type(jnp.maximum(d2, 0.0), jnp.int32)
    t = _kth_smallest_bits(bits, k)
    below = bits < t
    tie = bits == t
    extra = k - jnp.sum(below.astype(jnp.int32), axis=-1, keepdims=True)
    cum_tie = jnp.cumsum(tie.astype(jnp.int32), axis=-1)
    sel = jnp.logical_or(below, jnp.logical_and(tie, cum_tie <= extra))

    w = _normalize_inf_zeroed(jnp.where(sel, 1.0 / jnp.maximum(d2, 0.0), 0.0))
    return jnp.einsum("bvn,bnj->bvj", w, w0, **_MM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _knn_transfer(garment: Array, body: Array, w0: Array, k: int, k64: int):
    """(nn_W_k, nn_W_k64, nn1_idx): fused Pallas kernel on TPU (the XLA
    formulation re-reads the (B, Vg, N) distance matrix from HBM on every
    binary-search step, ~73 ms/forward), XLA fallback elsewhere. Backward
    recomputes through the XLA path (DCE'd when inputs are stop-gradient'd,
    which the posed stage always does, `posed.py` / mesh_encoder.py:416)."""
    return _knn_transfer_impl(garment, body, w0, k, k64)


def _knn_transfer_impl(garment, body, w0, k, k64):
    if jax.default_backend() == "tpu":
        from garment4d_tpu.ops.pallas.knn_transfer import (
            knn_weight_transfer_pallas,
        )

        return knn_weight_transfer_pallas(garment, body, w0, k, k64)
    return _knn_transfer_xla(garment, body, w0, k, k64)


def _knn_transfer_xla(garment, body, w0, k, k64):
    # exact=True: coordinate differences on the VPU, like the Pallas kernel
    # and the reference's chamferdist scan. The default expansion form
    # (|a|^2+|b|^2-2ab) cancels catastrophically at small distances - d2
    # drifts ~1e-3 relative for near neighbours, which feeds 1/d^2 weights
    # and put 10% of transferred weights outside 2e-5 of the kernel's.
    d2 = ops.pairwise_sqdist(garment, body, exact=True)
    nn1_idx = jnp.argmin(d2, axis=-1)[..., None].astype(jnp.int32)
    nn_w_k = _masked_weight_transfer(d2, w0, k)
    nn_w_64 = nn_w_k if k64 == k else _masked_weight_transfer(d2, w0, k64)
    return nn_w_k, nn_w_64, nn1_idx


def _knn_transfer_fwd(garment, body, w0, k, k64):
    return _knn_transfer_impl(garment, body, w0, k, k64), (garment, body, w0)


def _knn_transfer_bwd(k, k64, res, cots):
    garment, body, w0 = res
    _, vjp = jax.vjp(lambda g, b, w: _knn_transfer_xla(g, b, w, k, k64),
                     garment, body, w0)
    return vjp(cots)


_knn_transfer.defvjp(_knn_transfer_fwd, _knn_transfer_bwd)


def lbs_garment_interpolation(
    pred_template_garment_v: Array,   # (B, Vg, 3)
    tpose_vertices: Array,            # (B, 6890, 3)
    tpose_root_joints: Array,         # (B, 3)
    zeropose_vertices: Array,         # (B, T, 6890, 3)
    gt_pose: Array,                   # (B, T, 72) axis-angle
    T_J_regressor: Array,             # (B, T, 24, 6890)
    T_lbs_weights: Array,             # (B, T, 6890, 24)
    parents: np.ndarray,              # (24,) static
    smooth_op: Array,                 # (Vg, Vg) precomputed diffusion operator
    K: int,
) -> LbsResult:
    B, Vg, _ = pred_template_garment_v.shape
    T = gt_pose.shape[1]
    J = T_J_regressor.shape[2]
    BT = B * T

    pose_mat = batch_rodrigues(gt_pose.reshape(BT, J, 3))

    root_garment = pred_template_garment_v + tpose_root_joints[:, None, :]
    K64 = min(64, K)
    # the K-, K64- and 1-NN queries of the reference (`mesh_encoder.py:321-324`)
    # are consumed only through order-invariant weighted sums, so the whole
    # transfer is one fused selection + MXU contraction (no sort, no
    # (Vg, K, J) gathers), see `_knn_transfer`
    w0 = T_lbs_weights[:, 0]  # (B, 6890, J)
    nn_W, inv_nn_W, nn1_idx = _knn_transfer(
        root_garment, tpose_vertices, w0, K, K64)

    # ---- un-pose: invert the fixed template pose -------------------------
    inv_pose_mat = batch_rodrigues(_inverse_template_pose(B))
    inv_J = vertices2joints_b(T_J_regressor[:, 0], tpose_vertices)
    _, inv_A = batch_rigid_transform(inv_pose_mat, inv_J, parents)

    inv_T = jnp.einsum("bvj,bjpq->bvpq", inv_nn_W, inv_A, **_MM)
    unposed = (
        jnp.einsum("bvpq,bvq->bvp", inv_T[:, :, :3, :3], root_garment, **_MM)
        + inv_T[:, :, :3, 3]
    )  # (B, Vg, 3)

    # ---- re-pose to every frame -----------------------------------------
    zero_v = zeropose_vertices.reshape(BT, -1, 3)
    J_pos = vertices2joints_b(T_J_regressor.reshape(BT, J, -1), zero_v)
    _, A = batch_rigid_transform(pose_mat, J_pos, parents)

    # The K-NN selection and the skinning weights are frame-independent (the
    # reference always feeds per-frame copies of the same gender's
    # lbs_weights, `dataloader.py:204-212`), so the weight transfer and the
    # diffusion run once per *sequence*; per-frame work is just one small
    # MXU matmul against each frame's joint transforms. This is
    # mathematically identical to the reference's per-frame gathers
    # (`mesh_encoder.py:380-393`) at 1/T the traffic.
    if K > 1:
        # 100-step weight diffusion == one precomputed dense operator
        nn_W = jnp.einsum("vw,bwj->bvj", smooth_op, nn_W, **_MM)

    A_bt = A.reshape(B, T, J, 16)
    T_mat = jnp.einsum("bvj,btjq->btvq", nn_W, A_bt, **_MM).reshape(B, T, Vg, 4, 4)
    posed = (
        jnp.einsum("btvpq,bvq->btvp", T_mat[..., :3, :3], unposed, **_MM)
        + T_mat[..., :3, 3]
    )

    return LbsResult(
        posed_garment=posed,
        nn_idx=nn1_idx,
        unposed_garment=jnp.broadcast_to(unposed[:, None], (B, T, Vg, 3)),
    )


def lbs_garment_single_nn(
    pred_garment_v: Array,            # (B, T, Vg, 3) per-frame canonical + disp
    tpose_vertices: Array,            # (B, 6890, 3)
    tpose_root_joints: Array,         # (B, 3)
    zeropose_vertices: Array,         # (B, T, 6890, 3)
    gt_pose: Array,                   # (B, T, 72)
    T_J_regressor: Array,             # (B, T, 24, 6890)
    T_lbs_weights: Array,             # (B, T, 6890, 24)
    parents: np.ndarray,
) -> LbsResult:
    """K=1 MGN-baseline variant (reference `mesh_encoder.py:529-585`):
    per-vertex transform of the single nearest body vertex, no interpolation,
    no smoothing; the garment input is per-frame (canonical + displacement)."""
    B, T, Vg, _ = pred_garment_v.shape
    J = T_J_regressor.shape[2]
    BT = B * T

    pose_mat = batch_rodrigues(gt_pose.reshape(BT, J, 3))
    root_garment = (pred_garment_v + tpose_root_joints[:, None, None, :]).reshape(BT, Vg, 3)
    tpose_bt = jnp.broadcast_to(
        tpose_vertices[:, None], (B, T, *tpose_vertices.shape[1:])).reshape(BT, -1, 3)
    nn1 = ops.knn_points(root_garment, tpose_bt, K=1)

    inv_pose_mat = batch_rodrigues(_inverse_template_pose(BT))
    inv_J = vertices2joints_b(T_J_regressor.reshape(BT, J, -1), tpose_bt)
    _, inv_A = batch_rigid_transform(inv_pose_mat, inv_J, parents)

    w_bt = T_lbs_weights.reshape(BT, -1, J)
    inv_T_all = jnp.einsum("bvj,bjpq->bvpq", w_bt, inv_A, **_MM)  # (BT, 6890, 4, 4)
    inv_T = ops.group_points(
        inv_T_all.reshape(BT, -1, 16), nn1.idx).reshape(BT, Vg, 4, 4)
    unposed = (
        jnp.einsum("bvpq,bvq->bvp", inv_T[:, :, :3, :3], root_garment, **_MM)
        + inv_T[:, :, :3, 3]
    )

    zero_v = zeropose_vertices.reshape(BT, -1, 3)
    J_pos = vertices2joints_b(T_J_regressor.reshape(BT, J, -1), zero_v)
    _, A = batch_rigid_transform(pose_mat, J_pos, parents)
    T_all = jnp.einsum("bvj,bjpq->bvpq", w_bt, A, **_MM)
    T_nn = ops.group_points(
        T_all.reshape(BT, -1, 16), nn1.idx).reshape(BT, Vg, 4, 4)
    posed = (
        jnp.einsum("bvpq,bvq->bvp", T_nn[:, :, :3, :3], unposed, **_MM)
        + T_nn[:, :, :3, 3]
    )
    return LbsResult(
        posed_garment=posed.reshape(B, T, Vg, 3),
        nn_idx=nn1.idx,
        unposed_garment=unposed.reshape(B, T, Vg, 3),
    )
