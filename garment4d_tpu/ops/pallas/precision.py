"""Exact-f32 MXU dots for Mosaic kernels via 3-term bf16 splits.

TPU MXU dots at DEFAULT precision run ONE bf16 x bf16 pass: operands are
truncated to 8 mantissa bits, which drifts geometry-critical outputs ~1e-3
relative (caught on-chip by tools/verify_tpu.py; the reference computes
these in full f32 CUDA, e.g. `modules/pygcn/layers.py:44-58`). Mosaic's
precision=HIGHEST fixes the numerics with an internal 6-pass expansion, but
its temporaries land on the 16 MB scoped-vmem stack and blow it at
production shapes (measured 21.2 MB in the scatter kernel; 16.01 MB in the
fused GCN stack at the 323-wide attention iteration - the round-3 bench
regression). Mosaic does not implement precision=HIGH.

The explicit equivalent here keeps the math and drops the temporaries under
our control: split each f32 operand into 3 exactly-representable bf16 terms
(8 mantissa bits each cover all 24), run the 6 term products with combined
magnitude >= 2^-24 at DEFAULT precision, and accumulate in f32. Every
bf16 x bf16 product is exact (16 mantissa bits < f32's 24) and the 3
omitted products (hi*lo of the small terms) are below f32 rounding of the
result, so this matches precision=HIGHEST to accumulation-order roundoff.

`split3` is IN-KERNEL (Mosaic) ONLY: Mosaic lowers the convert round-trips
literally. XLA-traced code must use `split3_xla` - the axon terminal
compiles with --xla_allow_excess_precision=true, whose simplifier cancels
f32(bf16(x)) back to x, collapsing mid/lo to ZERO (caught on-chip: weights
drifted 2e-3 relative when the convert form was traced by XLA).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def split3(x):
    """f32 -> 3 exactly-representable bf16 terms summing to x (in-kernel)."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def split3_xla(x):
    """Excess-precision-proof 3-term bf16 split for XLA-traced (host-side)
    code: `lax.reduce_precision` rounds in-dtype, so the simplifier cannot
    cancel it against the full-precision input."""
    hi_f = lax.reduce_precision(x, 8, 7)
    r1 = x - hi_f
    mid_f = lax.reduce_precision(r1, 8, 7)
    lo_f = lax.reduce_precision(r1 - mid_f, 8, 7)
    return (hi_f.astype(jnp.bfloat16), mid_f.astype(jnp.bfloat16),
            lo_f.astype(jnp.bfloat16))


def dot_f32_presplit(a, b_split):
    """(M, K) f32 @ pre-split (K, N) -> (M, N) f32, HIGHEST-equivalent.

    `b_split` is the (hi, mid, lo) bf16 triple of the right operand -
    precompute it (host-side via `split3_xla`, or once per kernel) when b is
    large or reused so only a's 3 small terms hit the vmem stack."""
    bh, bm, bl = b_split
    ah, am, al = split3(a)
    acc = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
    for x, y in ((ah, bm), (am, bh), (ah, bl), (al, bh), (am, bm)):
        acc = acc + jnp.dot(x, y, preferred_element_type=jnp.float32)
    return acc


def dot_f32(a, b):
    """(M, K) f32 @ (K, N) f32 -> (M, N) f32 on the MXU, matching
    precision=HIGHEST to accumulation roundoff, with explicit (small)
    temporaries: 3 bf16 terms per operand + one f32 accumulator."""
    return dot_f32_presplit(a, split3(b))
