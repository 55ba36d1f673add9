"""Morton (Z-order) spatial ordering for point tables.

The reference's ball query returns the first `nsample` in-radius points in
INDEX order (`src/ball_query_gpu.cu:29-44`). Point index order is arbitrary:
the dataloader shuffles body vertices per frame (reference
`utils/dataloader.py:215-232`), so the selected subset is effectively a
random in-radius sample. The exact-parity TPU kernels replicate index-order
semantics, but the slot-extraction scan then has to cover the whole index
range, because a spatial neighbourhood's hits scatter uniformly across it.

Sorting a point table by Morton code makes each spatial neighbourhood a
narrow contiguous index window, which the group-bounded ball-query kernel
exploits exactly (its [lo, bound) group window collapses from "most of the
table" to a few 512-lane groups, see `ops/pallas/ball_query.py`). The
returned first-`nsample`-in-Morton-order subset is a *different but equally
arbitrary* in-radius sample. For the pcd-derived garment tables the swap is
statistically interchangeable with the reference's sample (the dataloader
shuffles pcd point order per frame, `utils/dataloader.py:215-232`); for the
SMPL-vertex body tables, which sit in fixed SMPL topology order, it merely
swaps one deterministic arbitrary subset for another. Neither is
checkpoint-parity-exact, so callers expose it behind an opt-in flag
(`PosedGarmentModel(spatial_sample=True)`) and the default path keeps the
reference semantics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

_BITS = 10  # 10 bits/axis -> 30-bit codes in int32


def _part1by2(x: Array) -> Array:
    """Spread the low 10 bits of x so there are two zero bits between each
    (the classic Morton magic-number expansion), int32 in, int32 out."""
    x = x & 0x3FF
    x = (x | (x << 16)) & 0x30000FF
    x = (x | (x << 8)) & 0x300F00F
    x = (x | (x << 4)) & 0x30C30C3
    x = (x | (x << 2)) & 0x9249249
    return x


def morton_codes(xyz: Array) -> Array:
    """Per-frame Morton codes. xyz (B, N, 3) -> (B, N) int32.

    Coordinates are quantised to 10 bits over each frame's own bounding box
    (degenerate axes quantise to 0), then bit-interleaved x|y<<1|z<<2.
    """
    lo = jnp.min(xyz, axis=1, keepdims=True)
    hi = jnp.max(xyz, axis=1, keepdims=True)
    span = jnp.maximum(hi - lo, 1e-12)
    q = (xyz - lo) / span * ((1 << _BITS) - 1)
    q = jnp.clip(q, 0, (1 << _BITS) - 1).astype(jnp.int32)
    return (_part1by2(q[..., 0]) | (_part1by2(q[..., 1]) << 1)
            | (_part1by2(q[..., 2]) << 2))


def spatial_order(xyz: Array) -> Array:
    """Permutation sorting each frame's points by Morton code (stable, ties
    by original index). xyz (B, N, 3) -> (B, N) int32 with
    xyz[b, perm[b]] in Z-order."""
    codes = morton_codes(jax.lax.stop_gradient(xyz))
    return jnp.argsort(codes, axis=1, stable=True).astype(jnp.int32)
