"""Fused ball-query Pallas kernel.

The XLA counting formulation materialises a (B, M, N, nsample) comparison
tensor in HBM (~12 GB accessed per call at production shapes). This kernel
keeps everything in VMEM: per 8-center sublane tile it computes squared
distances to all N points (lanes), the in-radius mask, a lane-axis prefix
sum, and then each slot's index as `searchsorted(cum, s+1) == sum(cum < s+1)`
- one (8, N) compare+reduce per slot. HBM traffic is just the xyz read and
the (M, nsample) index write.

Semantics match the reference CUDA kernel (`src/ball_query_gpu.cu:29-44`):
first `nsample` in-radius indices in index order, tail slots replicate the
first hit, centers with no hit keep index 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _bq_multi_kernel(xyz_ref, centers_ref, *out_refs, radii2, nsamples,
                     n_valid: int, tile_m: int):
    """Multi-radius variant: shares d2 across radii (one output per radius).

    Used when several ball queries hit the same (points, centers) pair with
    different radii (the 3-scale body queries of the refinement,
    reference `mesh_encoder.py:451-457`).
    """
    n_pad = xyz_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (tile_m, n_pad), dimension=1)
    valid = lane < n_valid

    x = xyz_ref[0, 0:1, :]
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    cx = centers_ref[0, :, 0:1]
    cy = centers_ref[0, :, 1:2]
    cz = centers_ref[0, :, 2:3]
    d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2  # (Tm, Np)

    for r2, nsample, out_ref in zip(radii2, nsamples, out_refs):
        mask = jnp.logical_and(d2 < r2, valid)
        cum = mask.astype(jnp.int32)
        shift = 1
        while shift < n_pad:
            rolled = pltpu.roll(cum, shift, axis=1)
            cum = cum + jnp.where(lane >= shift, rolled, 0)
            shift *= 2
        cnt = cum[:, -1:]  # padded lanes hold cum == cnt (see _bq_kernel)
        slots = []
        for s in range(nsample):
            below = cum < s + 1
            slots.append(jnp.sum(below.astype(jnp.int32), axis=-1, keepdims=True))
        idx = jnp.concatenate(slots, axis=-1)
        first_hit = idx[:, 0:1]
        s_iota = lax.broadcasted_iota(jnp.int32, (tile_m, nsample), dimension=1)
        idx = jnp.where(s_iota < cnt, idx, first_hit)
        idx = jnp.where(cnt > 0, idx, 0)
        s_pad = out_ref.shape[-1]
        if s_pad != nsample:
            idx = jnp.pad(idx, ((0, 0), (0, s_pad - nsample)))
        out_ref[0] = idx


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_multi_pallas(radii, nsamples, xyz: jax.Array,
                            new_xyz: jax.Array):
    """Several ball queries over the same (xyz, new_xyz) pair.

    radii/nsamples: tuples; returns a tuple of (B, M, nsample_i) int32."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    TILE_M = 32
    n_pad = _round_up(N, 128)
    m_pad = _round_up(M, TILE_M)
    s_pads = [_round_up(s, 128) for s in nsamples]

    xyz_t = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))
    centers = new_xyz.astype(jnp.float32)
    if m_pad != M:
        centers = jnp.pad(centers, ((0, 0), (0, m_pad - M), (0, 0)))

    kernel = functools.partial(
        _bq_multi_kernel, radii2=tuple(float(r) ** 2 for r in radii),
        nsamples=tuple(nsamples), n_valid=N, tile_m=TILE_M)
    outs = pl.pallas_call(
        kernel,
        grid=(B, m_pad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, TILE_M, sp), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM) for sp in s_pads),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, m_pad, sp), jnp.int32) for sp in s_pads),
    )(xyz_t, centers)
    return tuple(o[:, :M, :s] for o, s in zip(outs, nsamples))


def _bq_kernel(xyz_ref, centers_ref, out_ref, *, radius2: float, nsample: int,
               n_valid: int, tile_m: int):
    # xyz_ref: (1, 3, Np); centers_ref: (1, Tm, 3); out_ref: (1, Tm, Sp)
    n_pad = xyz_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (tile_m, n_pad), dimension=1)
    valid = lane < n_valid

    x = xyz_ref[0, 0:1, :]  # (1, Np)
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]
    cx = centers_ref[0, :, 0:1]  # (Tm, 1)
    cy = centers_ref[0, :, 1:2]
    cz = centers_ref[0, :, 2:3]

    d2 = (x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2  # (Tm, Np)
    mask = jnp.logical_and(d2 < radius2, valid)

    # lane-axis prefix sum via log-step rolls (cumsum has no Mosaic lowering)
    cum = mask.astype(jnp.int32)
    shift = 1
    while shift < n_pad:
        rolled = pltpu.roll(cum, shift, axis=1)
        cum = cum + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    # padded lanes hold cum == cnt after the prefix (their mask is False), so
    # for any live slot s < cnt they satisfy cum >= s+1 and never count; for
    # dead slots the value is overwritten below. The valid-mask AND can
    # therefore be dropped from the hot counting loop.
    cnt = cum[:, -1:]  # (Tm, 1)

    slots = []
    for s in range(nsample):
        below = cum < s + 1
        idx_s = jnp.sum(below.astype(jnp.int32), axis=-1, keepdims=True)  # (Tm, 1)
        slots.append(idx_s)
    idx = jnp.concatenate(slots, axis=-1)  # (Tm, nsample)

    first_hit = idx[:, 0:1]
    s_iota = lax.broadcasted_iota(jnp.int32, (tile_m, nsample), dimension=1)
    idx = jnp.where(s_iota < cnt, idx, first_hit)
    idx = jnp.where(cnt > 0, idx, 0)

    s_pad = out_ref.shape[-1]
    if s_pad != nsample:
        idx = jnp.pad(idx, ((0, 0), (0, s_pad - nsample)))
    out_ref[0] = idx


@functools.partial(jax.jit, static_argnums=(0, 1))
def ball_query_pallas(radius: float, nsample: int, xyz: jax.Array,
                      new_xyz: jax.Array) -> jax.Array:
    """xyz: (B, N, 3), new_xyz: (B, M, 3) -> (B, M, nsample) int32."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    TILE_M = 64  # 8 sublane groups per block: fewer grid steps, same VPU work
    n_pad = _round_up(N, 128)
    m_pad = _round_up(M, TILE_M)
    s_pad = _round_up(nsample, 128)

    xyz_t = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))
    centers = new_xyz.astype(jnp.float32)
    if m_pad != M:
        centers = jnp.pad(centers, ((0, 0), (0, m_pad - M), (0, 0)))

    kernel = functools.partial(
        _bq_kernel, radius2=float(radius) ** 2, nsample=nsample,
        n_valid=N, tile_m=TILE_M)
    out = pl.pallas_call(
        kernel,
        grid=(B, m_pad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_M, s_pad), lambda b, m: (b, m, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, m_pad, s_pad), jnp.int32),
    )(xyz_t, centers)
    return out[:, :M, :nsample]
