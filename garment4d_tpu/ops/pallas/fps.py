"""Furthest point sampling as a Pallas TPU kernel.

The reference hides FPS's sequential nature inside a CUDA block reduction
(`src/sampling_gpu.cu` `furthest_point_sampling_kernel`). On TPU the whole
point set (N x 3 floats, ~83 KB for N=6890) fits in VMEM, so the kernel keeps
the coordinates and the running min-distance array resident on-chip and runs
the npoint-step loop without touching HBM.

Layout: coordinates are fed transposed as (B, 3, N) so the point axis lands on
the 128-wide lane dimension of the VPU; the per-step distance update and
argmax are then full-width vector ops.

Semantics match the CUDA kernel: start at index 0, running min-distance,
argmax per step (ties -> lowest index).
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
    # xyz_ref: (1, 3, Np) VMEM; out_ref: (1, 1, Mp) int32; temp_ref: (1, Np) f32
    n_pad = xyz_ref.shape[-1]
    m_pad = out_ref.shape[-1]
    lane = lax.broadcasted_iota(jnp.int32, (1, n_pad), dimension=1)
    valid = lane < n_valid

    x = xyz_ref[0, 0:1, :]  # (1, Np)
    y = xyz_ref[0, 1:2, :]
    z = xyz_ref[0, 2:3, :]

    temp_ref[:] = jnp.where(valid, 1e10, -1.0)
    out_slot = lax.broadcasted_iota(jnp.int32, (1, m_pad), dimension=1)
    out_ref[0] = jnp.zeros((1, m_pad), jnp.int32)

    def body(j, last):
        onehot = (lane == last).astype(jnp.float32)
        lx = jnp.sum(x * onehot)
        ly = jnp.sum(y * onehot)
        lz = jnp.sum(z * onehot)
        d2 = (x - lx) ** 2 + (y - ly) ** 2 + (z - lz) ** 2
        t = jnp.minimum(temp_ref[:], jnp.where(valid, d2, -1.0))
        temp_ref[:] = t
        nxt = jnp.argmax(t, axis=-1)[0].astype(jnp.int32)
        out_ref[0] = jnp.where(out_slot == j, nxt, out_ref[0])
        return nxt

    lax.fori_loop(1, npoint, body, jnp.int32(0))


@functools.partial(jax.jit, static_argnums=(1,))
def fps_pallas(xyz: jax.Array, npoint: int) -> jax.Array:
    """xyz: (B, N, 3) f32 -> (B, npoint) int32."""
    B, N, _ = xyz.shape
    n_pad = _round_up(N, 128)
    xyz_t = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)  # (B, 3, N)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))

    m_pad = _round_up(npoint, 128)
    kernel = functools.partial(_fps_kernel, n_valid=N, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[pl.BlockSpec((1, 3, n_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, 1, m_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, m_pad), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, n_pad), jnp.float32)],
    )(xyz_t)
    return out[:, 0, :npoint]
