"""Deterministic row scatter-add Pallas kernel (one-hot MXU matmul).

The backward of a row gather is a scatter-add: out[idx[r]] += g[r]. XLA's
TPU scatter lowers to a sequential per-row loop - measured ~170 ms per
(40, 112k rows) scatter in the posed train step, three of which dominated
the whole backward. Here each 128-row input group builds its one-hot
index matrix O (128, N) with a single iota compare and accumulates
O^T @ payload on the MXU into a VMEM-resident (C, N) output block:
~500 GFLOP of matmul replaces half a second of serial scatter.

Deterministic by construction (fixed reduction order), like the XLA
scatter it replaces (reference CUDA used nondeterministic atomicAdd,
`src/group_points_gpu.cu:24`); float summation ORDER differs from XLA's
scatter, so results match to roundoff, not bitwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_R_TILE = 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(grads_ref, idx_ref, out_ref, *, c_pad: int, n_pad: int,
            j_groups: int):
    """grads_ref (1, R_tile/128, 128, C_pad); idx_ref (1, R_tile/128, 128);
    out_ref (1, C_pad, N_pad), accumulated across the r grid dimension."""

    @pl.when(pl.program_id(1) == 0)
    def _zero():
        out_ref[0] = jnp.zeros((c_pad, n_pad), jnp.float32)

    lane_n = lax.broadcasted_iota(jnp.int32, (128, n_pad), dimension=1)

    # contract each 128-row input group: (C_pad, N_pad) partial sum on the
    # MXU. The default single-pass bf16 multiply truncates the payload to
    # bf16 even against an exact 0/1 one-hot operand (caught on-chip by
    # tools/verify_tpu.py: 3.5% of sums off by up to 0.034, vs the
    # reference's full-f32 atomicAdd). Fix: split the payload into 3
    # exactly-bf16-representable terms (8 mantissa bits each = all 24) and
    # run 3 DEFAULT-precision dots - every product is exact (the one-hot is
    # exact in bf16), accumulation stays f32, so the result matches
    # full-f32 products to accumulation rounding. (HIGHEST would do the
    # same in 6 passes but its temporaries blow the 16 MB scoped-vmem
    # stack; Mosaic does not implement precision=HIGH.) fori_loop, not an
    # unrolled python loop: unrolled, the 8 groups' (128, N_pad) one-hot
    # temporaries all stay live and blow scoped vmem at body-size N -
    # the compile helper dies before any numerics run.
    def jbody(j, _):
        idxj = idx_ref[0, j, :].reshape(128, 1)  # (128, 1)
        onehot = (lane_n == idxj).astype(jnp.bfloat16)  # (128, N_pad)
        payload = grads_ref[0, j]  # (128, C_pad) f32
        hi = payload.astype(jnp.bfloat16)
        mid_f = payload - hi.astype(jnp.float32)
        mid = mid_f.astype(jnp.bfloat16)
        lo = (mid_f - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = out_ref[0]
        for part in (hi, mid, lo):
            acc = acc + lax.dot_general(
                part, onehot, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        out_ref[0] = acc
        return 0

    lax.fori_loop(0, j_groups, jbody, 0)


@functools.partial(jax.jit, static_argnums=(2,))
def scatter_add_rows_pallas(grads: jax.Array, idx: jax.Array,
                            n: int) -> jax.Array:
    """grads (B, R, C), idx (B, R) int32 in [0, n) -> (B, n, C) with
    out[b, i] = sum over r with idx[b, r] == i of grads[b, r]."""
    B, R, C = grads.shape
    n_pad = _round_up(n, 128)
    c_pad = _round_up(C, 8)
    r_pad = _round_up(R, _R_TILE)

    g = grads.astype(jnp.float32)
    if c_pad != C or r_pad != R:
        g = jnp.pad(g, ((0, 0), (0, r_pad - R), (0, c_pad - C)))
    # padding rows scatter to a sacrificial out-of-range lane
    ix = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, r_pad - R)),
                 constant_values=jnp.int32(n_pad))
    # route any out-of-range index off every valid lane (matches jnp.ndarray
    # .at[].add with default mode="fill"/drop semantics for OOB)
    ix = jnp.where((ix >= 0) & (ix < n), ix, jnp.int32(n_pad))
    ix = ix.reshape(B, r_pad // 128, 128)
    g = g.reshape(B, r_pad // 128, 128, c_pad)

    kern = functools.partial(_kernel, c_pad=c_pad, n_pad=n_pad,
                             j_groups=_R_TILE // 128)
    out = pl.pallas_call(
        kern,
        grid=(B, r_pad // _R_TILE),
        in_specs=[
            pl.BlockSpec((1, _R_TILE // 128, 128, c_pad),
                         lambda b, r: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _R_TILE // 128, 128), lambda b, r: (b, r, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_pad, n_pad), lambda b, r: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, c_pad, n_pad), jnp.float32),
    )(g, ix)
    return jnp.transpose(out[:, :C, :n], (0, 2, 1))
