"""Fused 3-nearest-neighbour Pallas kernel.

The XLA path (chunked exact distances + top_k) spends its time in serialized
chunk loops and sorts. Here each 32-query sublane tile computes squared
distances to all M reference points (lanes) in VMEM and extracts the best 3
by three rounds of (min, argmin-via-iota, mask-out) - ~15 vector passes
total, no sort, no HBM intermediates.

Matches the reference CUDA scan semantics (`src/interpolate_gpu.cu:30-51`):
ascending distances, ties broken towards the lower index.
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


_BIG = 1e30  # python float: jnp constants would be captured as kernel consts


def _three_nn_kernel(known_ref, query_ref, dist_ref, idx_ref, *,
                     m_valid: int, tile_q: int):
    # known_ref: (1, 3, Mp); query_ref: (1, Tq, 3);
    # dist_ref/idx_ref: (1, Tq, 128) (first 3 columns used)
    m_pad = known_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (tile_q, m_pad), dimension=1)
    valid = lane < m_valid

    x = known_ref[0, 0:1, :]
    y = known_ref[0, 1:2, :]
    z = known_ref[0, 2:3, :]
    qx = query_ref[0, :, 0:1]
    qy = query_ref[0, :, 1:2]
    qz = query_ref[0, :, 2:3]

    d2 = (x - qx) ** 2 + (y - qy) ** 2 + (z - qz) ** 2  # (Tq, Mp)
    d2 = jnp.where(valid, d2, _BIG)

    dists = []
    idxs = []
    for _ in range(3):
        best = jnp.min(d2, axis=-1, keepdims=True)  # (Tq, 1)
        # lowest index achieving the minimum (tie -> lower index)
        cand = jnp.where(d2 <= best, lane, m_pad)
        bidx = jnp.min(cand, axis=-1, keepdims=True)  # (Tq, 1)
        dists.append(best)
        idxs.append(bidx)
        d2 = jnp.where(lane == bidx, _BIG, d2)

    pad = dist_ref.shape[-1] - 3
    dist_ref[0] = jnp.pad(jnp.concatenate(dists, axis=-1), ((0, 0), (0, pad)))
    idx_ref[0] = jnp.pad(
        jnp.concatenate(idxs, axis=-1).astype(jnp.int32), ((0, 0), (0, pad)))


@jax.jit
def three_nn_pallas(unknown: jax.Array, known: jax.Array):
    """unknown: (B, N, 3), known: (B, M, 3) ->
    (dist2 (B, N, 3) squared distances, idx (B, N, 3) int32)."""
    B, N, _ = unknown.shape
    M = known.shape[1]
    m_pad = _round_up(M, 128)
    # biggest query tile whose ~4 live (Tq, Mp) f32 temporaries stay well
    # inside VMEM; small tiles pay per-grid-step fixed costs (measured: 15.6
    # -> ~3 ms at the fp1 shapes going from Tq=32 to 256)
    TILE_Q = max(32, min(256, (524288 // m_pad) // 32 * 32))
    n_pad = _round_up(N, TILE_Q)

    known_t = jnp.transpose(known, (0, 2, 1)).astype(jnp.float32)
    if m_pad != M:
        known_t = jnp.pad(known_t, ((0, 0), (0, 0), (0, m_pad - M)))
    queries = unknown.astype(jnp.float32)
    if n_pad != N:
        queries = jnp.pad(queries, ((0, 0), (0, n_pad - N), (0, 0)))

    kernel = functools.partial(_three_nn_kernel, m_valid=M, tile_q=TILE_Q)
    dist, idx = pl.pallas_call(
        kernel,
        grid=(B, n_pad // TILE_Q),
        in_specs=[
            pl.BlockSpec((1, 3, m_pad), lambda b, q: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q, 3), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, TILE_Q, 128), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_Q, 128), lambda b, q: (b, q, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, n_pad, 128), jnp.float32),
            jax.ShapeDtypeStruct((B, n_pad, 128), jnp.int32),
        ),
    )(known_t, queries)
    return dist[:, :N, :3], idx[:, :N, :3]
