"""Row-gather Pallas kernel (chunked lane dynamic_gather).

XLA's TPU row gather is row-count-bound (~7 ns/row regardless of row width
- measured: a 6-channel and a 35-channel gather of the same row count cost
within 7% of each other), which makes the neighbourhood gathers the single
largest cost class of the posed forward. This kernel replaces it with
vectorised VPU work: the table sits in VMEM transposed to (C, N) with points
on lanes, and each 128-row output group loops over the N/128 lane chunks
doing a hardware `tpu.dynamic_gather` (single-vreg lane shuffle) plus a
chunk-membership select. Cost is ~(N/128)*3 vreg-ops per 128 rows - ~3x
faster than XLA's gather at the model's table sizes (N<=6890), measured
2.8x end-to-end on the (80, 112k rows, 6ch) body-neighbourhood workload.

Replaces the HBM side of reference `group_points_wrapper`
(`src/group_points_gpu.cu`); grouping *semantics* stay in
`ops/pointcloud.py`, which also keeps the deterministic scatter-add
backward - this kernel is forward-only.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _gather_kernel(table_ref, idx_ref, out_ref, *, n_chunks: int, c_pad: int,
                   j_groups: int):
    """table_ref (1, C_pad, N_pad); idx_ref (1, R_tile/128, 128);
    out_ref (1, C_pad, R_tile). Per 128-row group: one single-vreg lane
    gather per source chunk, accumulated by chunk-membership select."""
    for j in range(j_groups):
        idxj = jnp.broadcast_to(idx_ref[0, j:j + 1, :], (c_pad, 128))
        chunk_id = idxj // 128
        local = idxj - chunk_id * 128
        out = jnp.zeros((c_pad, 128), jnp.float32)
        for c in range(n_chunks):
            chunk = table_ref[0, :, c * 128:(c + 1) * 128]
            g = jnp.take_along_axis(chunk, local, axis=1)
            out = jnp.where(chunk_id == c, g, out)
        out_ref[0, :, j * 128:(j + 1) * 128] = out


# table VMEM budget for the (C_pad, N_pad) resident block; beyond this the
# XLA gather is likely the better trade anyway (huge tables amortise its
# per-row cost over more useful bytes)
_MAX_TABLE_BYTES = 4 * 1024 * 1024
_R_TILE = 4096


def gather_supported(n: int, c: int) -> bool:
    """Whether the Pallas path handles (and likely wins at) this table."""
    n_pad = _round_up(n, 128)
    c_pad = _round_up(c, 8)
    if c_pad * n_pad * 4 > _MAX_TABLE_BYTES:
        return False
    # measured crossover: XLA's ~7ns/row vs our ~(chunks * c_pad/8) vreg-ops
    # per row-group; stay well inside the winning region
    return (n_pad // 128) * max(c_pad // 8, 1) <= 1024


@functools.partial(jax.jit, static_argnums=(2,))
def gather_rows_pallas_cf(table: jax.Array, idx: jax.Array,
                          keep_pad: bool = False) -> jax.Array:
    """table: (B, N, C) f32, idx: (B, R) int32 in [0, N) -> (B, C, R)
    CHANNEL-FIRST: out[b, :, r] = table[b, idx[b, r], :].

    This is the kernel's natural output layout (channels on sublanes, rows
    on lanes); returning it directly saves the (B, R, C) relayout copy -
    ~1.4 GB / 3 ms per big neighbourhood gather at production shapes.
    Forward-only (wrap in a custom_vjp for differentiable consumers).

    `keep_pad` returns the raw (B, C_pad, R_pad) tile-padded output: when R
    is not a tile multiple the `[:, :C, :R]` slice is a full relayout copy
    of the result (~850 MB for the FP1 interpolation gather); consumers
    that lane-slice the region they need (e.g. `three_interpolate`'s
    per-neighbour slices) fuse those reads and never pay it.
    """
    B, N, C = table.shape
    R = idx.shape[1]
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 8)
    r_pad = _round_up(R, _R_TILE)

    t = jnp.transpose(table, (0, 2, 1)).astype(jnp.float32)
    t = jnp.pad(t, ((0, 0), (0, c_pad - C), (0, n_pad - N)))
    ix = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, r_pad - R)))
    ix = ix.reshape(B, r_pad // 128, 128)

    kern = functools.partial(_gather_kernel, n_chunks=n_pad // 128,
                             c_pad=c_pad, j_groups=_R_TILE // 128)
    out = pl.pallas_call(
        kern,
        grid=(B, r_pad // _R_TILE),
        in_specs=[
            pl.BlockSpec((1, c_pad, n_pad), lambda b, r: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _R_TILE // 128, 128), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_pad, _R_TILE), lambda b, r: (b, 0, r),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, c_pad, r_pad), jnp.float32),
    )(t, ix)
    if keep_pad:
        return out
    return out[:, :C, :R]


@jax.jit
def gather_rows_pallas(table: jax.Array, idx: jax.Array) -> jax.Array:
    """table: (B, N, C) f32, idx: (B, R) int32 in [0, N) -> (B, R, C).

    out[b, r, :] = table[b, idx[b, r], :]. Forward-only (wrap in a
    custom_vjp for differentiable consumers).
    """
    return jnp.transpose(gather_rows_pallas_cf(table, idx), (0, 2, 1))
