"""Point-cloud geometry primitives, pure-XLA implementations.

These replace the reference's CUDA extension (`modules/pointnet2/pointnet2/src/`,
see SURVEY.md section 2.1) with TPU-idiomatic XLA programs:

  * pairwise distances ride the MXU as a matmul (or the VPU for the exact
    variant),
  * gathers/groupings are `take_along_axis` (grad = deterministic scatter-add,
    unlike the reference's `atomicAdd` scatters),
  * ball-query reproduces the CUDA first-hit slot-filling semantics
    (reference `src/ball_query_gpu.cu:29-44`) with a rank-scatter instead of a
    sequential scan,
  * three-NN / kNN are `lax.top_k` over chunked distance tiles.

All shapes are static; every function is jit/vmap/grad-safe.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array

# ---------------------------------------------------------------------------
# pairwise squared distances
# ---------------------------------------------------------------------------


def pairwise_sqdist(a: Array, b: Array, exact: bool = False) -> Array:
    """Squared euclidean distances between two point sets.

    a: (..., M, 3), b: (..., N, 3) -> (..., M, N)

    By default uses the |a|^2 + |b|^2 - 2<a,b> expansion so the inner product
    runs on the MXU. ``exact=True`` computes coordinate differences on the VPU
    (matches a sequential scan bit-for-bit, at higher memory cost).
    """
    if exact:
        d = a[..., :, None, :] - b[..., None, :, :]
        return jnp.sum(d * d, axis=-1)
    a2 = jnp.sum(a * a, axis=-1)  # (..., M)
    b2 = jnp.sum(b * b, axis=-1)  # (..., N)
    # HIGHEST: full-f32 accumulation - the default (bf16-pass) matmul precision
    # loses ~1e-1 absolute on squared distances, which breaks radius thresholds
    ab = jnp.einsum("...mc,...nc->...mn", a, b,
                    preferred_element_type=jnp.float32,
                    precision=lax.Precision.HIGHEST)
    d2 = a2[..., :, None] + b2[..., None, :] - 2.0 * ab
    return jnp.maximum(d2, 0.0)


# ---------------------------------------------------------------------------
# furthest point sampling
# ---------------------------------------------------------------------------


def furthest_point_sample(xyz: Array, npoint: int, use_pallas: Optional[bool] = None) -> Array:
    """Iterative furthest point sampling.

    xyz: (B, N, 3) float32 -> (B, npoint) int32 indices.

    Matches the reference semantics (`src/sampling_gpu.cu`
    `furthest_point_sampling_kernel`): deterministic, always starts at index 0,
    running min-distance array, argmax each step. Non-differentiable.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    xyz = lax.stop_gradient(xyz)  # non-diff (`pointnet2_utils.py:31-33`)
    if use_pallas:
        from garment4d_tpu.ops.pallas.fps import fps_pallas

        return fps_pallas(xyz, npoint)
    return _fps_xla(xyz, npoint)


@functools.partial(jax.jit, static_argnums=(1,))
def _fps_xla(xyz: Array, npoint: int) -> Array:
    B, N, _ = xyz.shape
    xyz = lax.stop_gradient(xyz)

    def step(carry, _):
        mindist, last = carry  # (B, N), (B,)
        last_xyz = jnp.take_along_axis(xyz, last[:, None, None], axis=1)  # (B,1,3)
        d = xyz - last_xyz
        d2 = jnp.sum(d * d, axis=-1)  # (B, N)
        mindist = jnp.minimum(mindist, d2)
        nxt = jnp.argmax(mindist, axis=-1).astype(jnp.int32)  # (B,)
        return (mindist, nxt), nxt

    init = (jnp.full((B, N), 1e10, dtype=jnp.float32), jnp.zeros((B,), jnp.int32))
    if npoint == 1:
        return jnp.zeros((B, 1), jnp.int32)
    (_, _), rest = lax.scan(step, init, None, length=npoint - 1)
    first = jnp.zeros((B, 1), jnp.int32)
    return jnp.concatenate([first, rest.T], axis=1)


# ---------------------------------------------------------------------------
# gather / grouping
# ---------------------------------------------------------------------------


@jax.custom_vjp
def _gather_rows(points: Array, idx: Array) -> Array:
    """points (B, N, C), idx (B, R) -> (B, R, C) with a Pallas forward on
    TPU (XLA's row gather is ~3x slower at these table sizes, see
    `ops/pallas/gather.py`) and XLA's deterministic scatter-add backward
    (replacing the reference's nondeterministic atomicAdd,
    `src/group_points_gpu.cu:24`)."""
    return _gather_rows_fwd_impl(points, idx)


def _gather_rows_fwd_impl(points: Array, idx: Array) -> Array:
    B, N, C = points.shape
    if jax.default_backend() == "tpu":
        from garment4d_tpu.ops.pallas.gather import (
            gather_rows_pallas,
            gather_supported,
        )

        if gather_supported(N, C) and points.dtype == jnp.float32:
            return gather_rows_pallas(points, idx)
    return jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1)


def _gather_rows_fwd(points, idx):
    return _gather_rows_fwd_impl(points, idx), (idx, points.shape)


def _gather_rows_bwd(res, g):
    idx, (B, N, C) = res
    if jax.default_backend() == "tpu":
        from garment4d_tpu.ops.pallas.gather import gather_supported
        from garment4d_tpu.ops.pallas.scatter import scatter_add_rows_pallas

        # XLA's TPU scatter lowers to a sequential per-row loop (~170 ms per
        # big grouping grad in the posed train step); the one-hot MXU
        # scatter kernel is deterministic and ~30x faster
        if gather_supported(N, C):
            return scatter_add_rows_pallas(
                g.astype(jnp.float32), idx.astype(jnp.int32), N), None
    zeros = jnp.zeros((B, N, C), g.dtype)
    # deterministic scatter-add (the transpose XLA itself derives for
    # take_along_axis)
    grad = zeros.at[
        jnp.arange(B, dtype=jnp.int32)[:, None], idx.astype(jnp.int32)
    ].add(g)
    return grad, None


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


@jax.custom_vjp
def _gather_rows_cf(points: Array, idx: Array) -> Array:
    """points (B, N, C), idx (B, R) -> (B, C, R) CHANNEL-FIRST.

    The Pallas gather kernel's natural output layout; skipping the row-major
    relayout saves a (B, R, C)-sized copy per neighbourhood gather (the
    biggest pure-data-movement cost of the posed forward). Backward
    transposes the cotangent once and reuses the standard deterministic
    scatter-add."""
    return _gather_rows_cf_fwd_impl(points, idx)


def _gather_rows_cf_fwd_impl(points: Array, idx: Array) -> Array:
    B, N, C = points.shape
    if jax.default_backend() == "tpu":
        from garment4d_tpu.ops.pallas.gather import (
            gather_rows_pallas_cf,
            gather_supported,
        )

        if gather_supported(N, C) and points.dtype == jnp.float32:
            return gather_rows_pallas_cf(points, idx)
    return jnp.transpose(
        jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1),
        (0, 2, 1))


def _gather_rows_cf_fwd(points, idx):
    return _gather_rows_cf_fwd_impl(points, idx), (idx, points.shape)


def _gather_rows_cf_bwd(res, g):
    return _gather_rows_bwd(res, jnp.transpose(g, (0, 2, 1)))


_gather_rows_cf.defvjp(_gather_rows_cf_fwd, _gather_rows_cf_bwd)


@jax.custom_vjp
def _gather_rows_cf_pad(points: Array, idx: Array) -> Array:
    """Like `_gather_rows_cf` but returns the gather kernel's raw
    (B, C_pad, R_pad) tile-padded output - no `[:, :C, :R]` slice, which is
    a full relayout copy when R isn't a tile multiple. Consumers lane-slice
    the regions they need (those reads fuse); cotangents of the pad regions
    are zero by construction, so the backward slices them off and reuses
    the deterministic scatter-add."""
    return _gather_rows_cf_pad_impl(points, idx)


def _gather_rows_cf_pad_impl(points: Array, idx: Array) -> Array:
    B, N, C = points.shape
    R = idx.shape[1]
    if jax.default_backend() == "tpu":
        from garment4d_tpu.ops.pallas.gather import (
            gather_rows_pallas_cf,
            gather_supported,
        )

        if gather_supported(N, C) and points.dtype == jnp.float32:
            return gather_rows_pallas_cf(points, idx, True)
    from garment4d_tpu.ops.pallas.gather import _R_TILE

    out = jnp.transpose(
        jnp.take_along_axis(points, idx[..., None].astype(jnp.int32), axis=1),
        (0, 2, 1))
    c_pad = ((C + 7) // 8) * 8
    r_pad = ((R + _R_TILE - 1) // _R_TILE) * _R_TILE
    return jnp.pad(out, ((0, 0), (0, c_pad - C), (0, r_pad - R)))


def _gather_rows_cf_pad_fwd(points, idx):
    return _gather_rows_cf_pad_impl(points, idx), (idx, points.shape)


def _gather_rows_cf_pad_bwd(res, g):
    idx, (B, N, C) = res
    R = idx.shape[1]
    return _gather_rows_bwd(res, jnp.transpose(g[:, :C, :R], (0, 2, 1)))


_gather_rows_cf_pad.defvjp(_gather_rows_cf_pad_fwd, _gather_rows_cf_pad_bwd)


def group_points_cf(points: Array, idx: Array) -> Array:
    """points: (B, N, C), idx: (B, M, S) int -> (B, C, M, S) channel-first.

    Same neighbourhoods as `group_points`, in the gather kernel's native
    layout (see `_gather_rows_cf`)."""
    B, N, C = points.shape
    _, M, S = idx.shape
    flat = _gather_rows_cf(points, idx.reshape(B, M * S).astype(jnp.int32))
    return flat.reshape(B, C, M, S)


def gather_points(points: Array, idx: Array) -> Array:
    """points: (B, N, C), idx: (B, M) int -> (B, M, C).

    Channel-last equivalent of the reference `gather_points_wrapper`
    (`src/sampling_gpu.cu:8-40`); gradient is XLA's deterministic scatter-add.
    """
    return _gather_rows(points, idx.astype(jnp.int32))


def group_points(points: Array, idx: Array) -> Array:
    """points: (B, N, C), idx: (B, M, S) int -> (B, M, S, C).

    Channel-last equivalent of `group_points_wrapper`
    (`src/group_points_gpu.cu`).
    """
    B, N, C = points.shape
    _, M, S = idx.shape
    flat = _gather_rows(points, idx.reshape(B, M * S).astype(jnp.int32))
    return flat.reshape(B, M, S, C)


# ---------------------------------------------------------------------------
# ball query
# ---------------------------------------------------------------------------


def ball_query(radius: float, nsample: int, xyz: Array, new_xyz: Array,
               chunk: int = 1024, use_pallas: Optional[bool] = None,
               prefix: int = 0, grouped: bool = False) -> Array:
    """For each center, indices of the first `nsample` points within `radius`.

    xyz: (B, N, 3), new_xyz: (B, M, 3) -> idx (B, M, nsample) int32.

    Replicates the CUDA slot-filling semantics (`src/ball_query_gpu.cu:29-44`):
    on the first in-radius hit every slot is pre-filled with that index, later
    hits overwrite slots in order; centers with no in-radius point keep the
    zero-initialised indices. Implemented as mask -> prefix-sum rank ->
    unique-slot scatter (no sequential scan, no atomics).

    `prefix` > 0 is a pure performance hint for the TPU kernel: scan only
    the first `prefix` points, falling back to a full rescan for center
    tiles that don't find `nsample` hits there. Results are identical for
    any value; enable where hit density >> nsample.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from garment4d_tpu.ops.pallas.ball_query import ball_query_pallas

        # non-differentiable (reference `pointnet2_utils.py:224-226`); the
        # stop_gradient also keeps autodiff from trying to differentiate
        # through the pallas_call
        if grouped and xyz.shape[1] > 1024:
            # group-bounded kernel: a win when centers are tile-coherent
            # (garment-mesh vertices in ring order) AND hits are dense
            # enough that the first-S hits land in the leading lane groups
            from garment4d_tpu.ops.pallas.ball_query import (
                ball_query_multi_pallas,
            )

            return ball_query_multi_pallas(
                (radius,), (nsample,), lax.stop_gradient(xyz),
                lax.stop_gradient(new_xyz), grouped=True)[0]
        return ball_query_pallas(radius, nsample, lax.stop_gradient(xyz),
                                 lax.stop_gradient(new_xyz), prefix)

    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    r2 = jnp.float32(radius * radius)

    targets = jnp.arange(1, nsample + 1, dtype=jnp.int32)

    def one_chunk(centers):  # (B, Cm, 3) -> (B, Cm, nsample)
        # exact diff-form distances: bit-identical to the CUDA kernel and the
        # Pallas TPU kernel, so radius-boundary membership never flips
        # between backends (the MXU-form expansion is ~1e-6 off, enough to
        # flip ~1e-5 of slots at production shapes)
        d2 = pairwise_sqdist(centers, xyz, exact=True)  # (B, Cm, N)
        mask = d2 < r2
        # cumulative hit count is monotone, so "index of the (s+1)-th hit" is
        # searchsorted(cum, s+1): log(N) binary-search steps per slot and
        # (B, Cm, N) peak memory - the dense (B, Cm, N, nsample) comparison
        # formulation blows memory at production shapes (this path is the
        # CPU/golden fallback; the TPU path is the chunked Pallas kernel)
        cum = jnp.cumsum(mask.astype(jnp.int32), axis=-1)  # (B, Cm, N)
        idx = jax.vmap(jax.vmap(
            lambda c: jnp.searchsorted(c, targets, side="left")))(
                cum).astype(jnp.int32)  # (B, Cm, nsample)
        cnt = cum[..., -1]  # hits per center
        first_hit = jnp.where(cnt > 0, jnp.argmax(mask, axis=-1), 0).astype(jnp.int32)
        # slots beyond the hit count replicate the first hit (CUDA semantics);
        # centers with no hits keep index 0
        return jnp.where(targets[None, None, :] <= cnt[..., None],
                         idx, first_hit[..., None])

    if M <= chunk:
        return one_chunk(new_xyz)
    M_pad = ((M + chunk - 1) // chunk) * chunk
    padded = jnp.pad(new_xyz, ((0, 0), (0, M_pad - M), (0, 0)))
    centers = padded.reshape(B, M_pad // chunk, chunk, 3).transpose(1, 0, 2, 3)
    out = lax.map(one_chunk, centers)  # (M_pad//chunk, B, chunk, nsample)
    return out.transpose(1, 0, 2, 3).reshape(B, M_pad, nsample)[:, :M]


def ball_query_multi(radii, nsamples, xyz: Array, new_xyz: Array,
                     use_pallas: Optional[bool] = None, prefix: int = 0):
    """Several ball queries over the same (xyz, new_xyz): returns a tuple of
    idx arrays. On TPU the distance matrix is shared across radii in one
    fused Pallas kernel. `prefix` as in `ball_query`."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from garment4d_tpu.ops.pallas.ball_query import ball_query_multi_pallas

        return ball_query_multi_pallas(
            tuple(float(r) for r in radii), tuple(int(s) for s in nsamples),
            lax.stop_gradient(xyz), lax.stop_gradient(new_xyz), prefix)
    return tuple(ball_query(r, s, xyz, new_xyz, use_pallas=False)
                 for r, s in zip(radii, nsamples))


def query_group_pruned_multi(radii, nsamples, xyz: Array, new_xyz: Array,
                             features: Array, cap_frac: float = 0.72,
                             use_pallas: Optional[bool] = None,
                             channel_first: bool = False):
    """Fused multi-radius ball query + feature grouping with candidate
    compaction: returns a tuple of grouped features (B, M, S_i, C), exactly
    `group_points(features, ball_query_multi(...)[i])` - or their (B, C, M,
    S_i) channel-first form when `channel_first` (the gather kernel's native
    layout; saves a large relayout copy per radius).

    The query kernel's scan cost is linear in the point count, but only the
    points within max(radii) of ANY center can ever be selected (~50-65% of
    the body on garment-on-body geometry). So: compute the coverage mask
    (Pallas kernel), compact the point set order-preservingly (ascending
    index sort of selected indices - first-S-hits semantics survive
    compaction unchanged), run query + gathers in COMPACT space, and fix up
    the reference's no-hit convention (slots stay at index 0, i.e. gather
    FULL-space row 0, `src/ball_query_gpu.cu:35-42`) with a per-center
    where. If any frame's candidate count exceeds the static cap, a
    lax.cond falls back to the full-space path - results are identical
    either way, compaction is purely a performance path.
    """
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    S_total = tuple(int(s) for s in nsamples)
    cap = ((max(int(N * cap_frac), 256) + 127) // 128) * 128
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    group_fn = group_points_cf if channel_first else group_points
    if not use_pallas or cap >= N or N < 1024:
        idxs = ball_query_multi(radii, nsamples, xyz, new_xyz,
                                use_pallas=use_pallas)
        return tuple(group_fn(features, i) for i in idxs)

    from garment4d_tpu.ops.pallas.ball_query import ball_query_multi_pallas
    from garment4d_tpu.ops.pallas.coverage import covered_mask_pallas

    xyz_s = lax.stop_gradient(xyz)
    cent_s = lax.stop_gradient(new_xyz)
    r_max = float(max(radii))
    cover = covered_mask_pallas(xyz_s, cent_s, r_max)  # (B, N) int32
    counts = jnp.sum(cover, axis=1)  # (B,) covered points per frame
    overflow = jnp.any(counts > cap)

    iota = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32)[None], (B, N))
    keys = jnp.where(cover > 0, iota, jnp.int32(1) << 30)
    compact_idx = lax.sort(keys, dimension=1)[:, :cap]  # ascending = index order
    valid = compact_idx < N
    safe_idx = jnp.where(valid, compact_idx, 0)
    cxyz = _gather_rows(xyz, safe_idx)
    # padding rows sit at +inf-ish so they can never fall inside a ball
    cxyz = jnp.where(valid[..., None], cxyz, jnp.float32(1e9))
    cfeat = _gather_rows(features, safe_idx)

    def _group_all(feats, idxs):
        # one fused gather for all radii (per-call fixed costs paid once),
        # split back into the per-radius neighbourhoods
        cat = jnp.concatenate([i.reshape(B, -1) for i in idxs], axis=1)
        outs, off = [], 0
        if channel_first:
            flat = _gather_rows_cf(feats, cat)  # (B, C, M * sum(S))
            for s in S_total:
                outs.append(flat[:, :, off:off + M * s].reshape(B, -1, M, s))
                off += M * s
            return outs
        flat = _gather_rows(feats, cat)  # (B, M * sum(S), C)
        for s in S_total:
            outs.append(flat[:, off:off + M * s, :].reshape(B, M, s, -1))
            off += M * s
        return outs

    def compact_branch(xyz_full, centers, feats_full, cxyz, cfeat):
        # grouped=True: centers are garment-mesh vertices (tile-coherent)
        # and hits are dense, the group-bounded kernel's winning regime.
        # n_valid_dyn: real candidates occupy the leading counts[b] rows of
        # the compacted table; the kernel skips the sentinel tail's groups
        idxs = ball_query_multi_pallas(
            tuple(float(r) for r in radii), S_total,
            lax.stop_gradient(cxyz), centers, grouped=True,
            n_valid_dyn=jnp.minimum(counts, cap))
        if channel_first:
            row0 = feats_full[:, 0, :][:, :, None, None]  # (B, C, 1, 1)
        else:
            row0 = feats_full[:, 0:1, None, :]  # (B, 1, 1, C) full-space row 0
        d0 = jnp.sum((centers - lax.stop_gradient(cxyz)[:, 0:1, :]) ** 2,
                     axis=-1)  # (B, M) dist to compact row 0
        outs = []
        for r, s, idx, grouped in zip(radii, S_total, idxs,
                                      _group_all(cfeat, idxs)):
            # no-hit centers: compact slot 0 without an actual first hit at
            # compact row 0 -> the reference gathers FULL row 0
            no_hit = jnp.logical_and(idx[:, :, 0] == 0,
                                     ~(d0 < jnp.float32(float(r) ** 2)))
            mask = (no_hit[:, None, :, None] if channel_first
                    else no_hit[..., None, None])
            outs.append(jnp.where(mask, row0, grouped))
        return tuple(outs)

    def full_branch(xyz_full, centers, feats_full, cxyz, cfeat):
        idxs = ball_query_multi_pallas(
            tuple(float(r) for r in radii), S_total,
            lax.stop_gradient(xyz_full), centers, grouped=True)
        return tuple(_group_all(feats_full, idxs))

    return lax.cond(overflow, full_branch, compact_branch,
                    xyz, cent_s, features, cxyz, cfeat)


class QueryAndGroupResult(NamedTuple):
    features: Array  # (B, M, S, 3 + C) or (B, M, S, 3)
    idx: Array  # (B, M, S)


def query_and_group(radius: float, nsample: int, xyz: Array, new_xyz: Array,
                    features: Optional[Array] = None, use_xyz: bool = True) -> Array:
    """Ball-query then group, returning centred xyz (+ features), channel-last.

    Reference: `pointnet2_utils.py:232-265` (QueryAndGroup). Output layout is
    (B, M, S, 3+C) instead of the reference's (B, 3+C, M, S).
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)
    if features is not None:
        if use_xyz:
            # single wide gather instead of separate xyz + feature gathers
            # (row-gather cost is per-row, so merging nearly halves it)
            packed = jnp.concatenate([xyz, features], axis=-1)
            grouped = group_points(packed, idx)
            centred = grouped[..., :3] - new_xyz[:, :, None, :]
            return jnp.concatenate([centred, grouped[..., 3:]], axis=-1)
        return group_points(features, idx)
    assert use_xyz, "cannot have no features and not use xyz"
    return group_points(xyz, idx) - new_xyz[:, :, None, :]


def group_all(xyz: Array, features: Optional[Array] = None, use_xyz: bool = True) -> Array:
    """Group the whole set as a single neighbourhood: (B, 1, N, 3 + C).

    Reference: `pointnet2_utils.py:268-291` (GroupAll).
    """
    grouped = xyz[:, None, :, :]
    if features is not None:
        feats = features[:, None, :, :]
        if use_xyz:
            return jnp.concatenate([grouped, feats], axis=-1)
        return feats
    return grouped


# ---------------------------------------------------------------------------
# k nearest neighbours / three-NN interpolation
# ---------------------------------------------------------------------------


class KnnResult(NamedTuple):
    dists: Array  # (B, M, K) squared distances (pytorch3d/chamferdist convention)
    idx: Array  # (B, M, K) int32


def knn_points(query: Array, points: Array, K: int = 1, chunk: int = 2048,
               exact: bool = False, use_pallas=None) -> KnnResult:
    """K nearest neighbours of `query` in `points`.

    query: (B, M, 3), points: (B, N, 3) -> dists (B, M, K) SQUARED distances,
    idx (B, M, K). Matches chamferdist/pytorch3d `knn_points` used by the
    reference (`modules/mesh_encoder.py:18,321-324`): returns squared
    distances, ties broken towards lower index.

    K=1 on TPU takes the fused nn1 Pallas kernel for mid-size tables
    (exact diff-form f32 - i.e. what `exact=True` requests; same tie rule;
    XLA's fused distance+argmin lowering runs ~6x slower - see
    ops/pallas/nn1.py). Tables past ~8k points fall back to the
    query-chunked XLA path: the kernel holds a (128, N) distance block
    plus temporaries in the 16 MB scoped VMEM, which bounds N.
    """
    B, M, _ = query.shape
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if K == 1 and use_pallas and 512 <= points.shape[1] <= 8192:
        from garment4d_tpu.ops.pallas.nn1 import nn1_pallas

        d2, idx = nn1_pallas(query, points)
        return KnnResult(d2[..., None], idx[..., None])

    def one_chunk(q):
        d2 = pairwise_sqdist(q, points, exact=exact)
        if K == 1:
            # argmin instead of top_k: top_k lowers to a full sort on TPU
            # (the TPU hot path takes the fused nn1 Pallas kernel above and
            # never reaches this; a min + first-index-where-equal two-reduce
            # rewrite of this XLA form was MEASURED SLOWER than the variadic
            # argmin - 10.7 vs 7.8 ms at (40, 2000, 6890) - both lose to
            # the kernel's 1.x ms, so the fallback keeps the simple form)
            best = jnp.min(d2, axis=-1, keepdims=True)
            idx = jnp.argmin(d2, axis=-1)[..., None].astype(jnp.int32)
            return KnnResult(best, idx)
        neg, idx = lax.top_k(-d2, K)
        return KnnResult(-neg, idx.astype(jnp.int32))

    if M <= chunk:
        return one_chunk(query)
    M_pad = ((M + chunk - 1) // chunk) * chunk
    padded = jnp.pad(query, ((0, 0), (0, M_pad - M), (0, 0)))
    qs = padded.reshape(B, M_pad // chunk, chunk, 3).transpose(1, 0, 2, 3)
    out = lax.map(one_chunk, qs)
    dists = out.dists.transpose(1, 0, 2, 3).reshape(B, M_pad, K)[:, :M]
    idx = out.idx.transpose(1, 0, 2, 3).reshape(B, M_pad, K)[:, :M]
    return KnnResult(dists, idx)


def three_nn(unknown: Array, known: Array,
             use_pallas: Optional[bool] = None) -> tuple[Array, Array]:
    """Exact 3 nearest neighbours of `unknown` in `known`.

    unknown: (B, N, 3), known: (B, M, 3) -> (dist (B, N, 3) EUCLIDEAN
    distances, idx (B, N, 3)). The sqrt matches the reference wrapper
    (`pointnet2_utils.py:98`), the underlying CUDA kernel keeps squared
    distances (`src/interpolate_gpu.cu:30-51`).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    # non-differentiable in the reference (`pointnet2_utils.py:100-102`:
    # backward returns None for both dists and idx)
    unknown = lax.stop_gradient(unknown)
    known = lax.stop_gradient(known)
    if use_pallas:
        from garment4d_tpu.ops.pallas.three_nn import three_nn_pallas

        dist2, idx = three_nn_pallas(unknown, known)
        return jnp.sqrt(dist2), idx
    res = knn_points(unknown, known, K=3, exact=True)
    return jnp.sqrt(res.dists), res.idx


def three_interpolate(features: Array, idx: Array, weight: Array,
                      use_cf: Optional[bool] = None) -> Array:
    """Weighted interpolation of 3-NN features, channel-last.

    features: (B, M, C), idx: (B, N, 3), weight: (B, N, 3) -> (B, N, C).
    Differentiable w.r.t. `features` (and `weight`); the reference grad
    scatter (`src/interpolate_gpu.cu:115-160`) becomes XLA's deterministic
    gather transpose.

    On TPU the gather runs K-MAJOR and CHANNEL-FIRST: the row-major
    formulation's (B, N*3, C) gather forces a (B, N*3, C) relayout copy
    (~850 MB per FP1 call at production shapes). K-major indices make the
    (B, C, 3*Np) -> (B, C, 3, Np) split layout-free (Np 128-aligned), the
    weighted K-sum fuses into the gather output read, and only the final
    (B, C, N) -> (B, N, C) result - a third of the volume - is transposed.
    """
    B, N, K = idx.shape
    C = features.shape[-1]
    if use_cf is None:
        use_cf = jax.default_backend() == "tpu"
    if use_cf and C % 8 == 0:
        n_pad = ((N + 127) // 128) * 128
        idx_p = idx.astype(jnp.int32)
        w_p = weight
        if n_pad != N:
            idx_p = jnp.pad(idx_p, ((0, 0), (0, n_pad - N), (0, 0)))
            w_p = jnp.pad(w_p, ((0, 0), (0, n_pad - N), (0, 0)))
        idx_km = jnp.transpose(idx_p, (0, 2, 1)).reshape(B, K * n_pad)
        # tile-padded gather output: the per-neighbour lane slices below
        # fuse into the weighted sum, so neither the (B, C, K*n_pad) slice
        # nor any reshape of the gathered block ever materialises
        g = _gather_rows_cf_pad(features, idx_km)  # (B, C, >=K*n_pad)
        w_cf = jnp.transpose(w_p, (0, 2, 1))  # (B, K, n_pad)
        out_cf = None
        for k in range(K):
            term = g[:, :C, k * n_pad:(k + 1) * n_pad] * w_cf[:, k:k + 1, :]
            out_cf = term if out_cf is None else out_cf + term
        return jnp.transpose(out_cf, (0, 2, 1))[:, :N]
    gathered = group_points(features, idx)  # (B, N, 3, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def interp_weights_from_dists(dist: Array, eps: float = 1e-8) -> Array:
    """Inverse-distance weights, normalised; reference `pointnet2_modules.py:139-143`."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
