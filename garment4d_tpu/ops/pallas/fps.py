"""Furthest point sampling as a Pallas TPU kernel.

The reference hides FPS's sequential nature inside a CUDA block reduction
(`src/sampling_gpu.cu` `furthest_point_sampling_kernel`). On TPU the whole
batch of point sets fits in VMEM (B x N floats, ~1.1 MB for 40x6890), so the
kernel keeps the coordinates and the running min-distance array resident
on-chip and runs the npoint-step loop once for ALL batch rows in parallel -
the fixed per-step loop overhead amortises across the batch (sublane) axis.

Layout: coordinates are fed transposed as (3, B, N): batch on sublanes,
points on lanes. Semantics match the CUDA kernel: start at index 0, running
min-distance, argmax per step (ties -> lowest index).
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


def _fps_kernel(xyz_ref, out_ref, temp_ref, *, n_valid: int, npoint: int):
    # xyz_ref: (3, Bp, Np); out_ref: (Bp, Mp) int32; temp_ref: (Bp, Np) f32
    n_pad = xyz_ref.shape[-1]
    b_pad = xyz_ref.shape[1]
    m_pad = out_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (b_pad, n_pad), dimension=1)
    valid = lane < n_valid

    x = xyz_ref[0]  # (Bp, Np)
    y = xyz_ref[1]
    z = xyz_ref[2]

    temp_ref[...] = jnp.where(valid, 1e10, -1.0)
    out_slot = lax.broadcasted_iota(jnp.int32, (b_pad, m_pad), dimension=1)
    out_ref[...] = jnp.zeros((b_pad, m_pad), jnp.int32)

    def body(j, last):
        # last: (Bp, 1) per-row index of the previously selected point
        onehot = (lane == last).astype(jnp.float32)
        lx = jnp.sum(x * onehot, axis=-1, keepdims=True)  # (Bp, 1)
        ly = jnp.sum(y * onehot, axis=-1, keepdims=True)
        lz = jnp.sum(z * onehot, axis=-1, keepdims=True)
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        t = jnp.minimum(temp_ref[...], jnp.where(valid, d2, -1.0))
        temp_ref[...] = t
        best = jnp.max(t, axis=-1, keepdims=True)
        nxt = jnp.min(jnp.where(t >= best, lane, n_pad), axis=-1,
                      keepdims=True)  # lowest index attaining the max
        out_ref[...] = jnp.where(out_slot == j, nxt, out_ref[...])
        return nxt

    lax.fori_loop(1, npoint, body, jnp.zeros((b_pad, 1), jnp.int32))


@functools.partial(jax.jit, static_argnums=(1,))
def fps_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """xyz: (B, N, 3) f32 -> (B, npoint) int32."""
    B, N, _ = xyz.shape
    n_pad = _round_up(N, 128)
    b_pad = _round_up(B, 8)
    m_pad = _round_up(npoint, 128)
    xyz_t = jnp.transpose(xyz, (2, 0, 1)).astype(jnp.float32)  # (3, B, N)
    xyz_t = jnp.pad(xyz_t, ((0, 0), (0, b_pad - B), (0, n_pad - N)))

    kernel = functools.partial(_fps_kernel, n_valid=N, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b_pad, m_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((b_pad, n_pad), jnp.float32)],
    )(xyz_t)
    return out[:B, :npoint]
