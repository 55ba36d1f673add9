"""Fused K-NN skinning-weight transfer kernel.

Computes, for each garment vertex, the reference's 1/d^2-weighted average of
the K (and K64) nearest body vertices' skinning weights plus the 1-NN index
(`mesh_encoder.py:321-347`) in ONE kernel: squared distances, per-row
K-th-smallest thresholds (binary search on the monotone f32 bit patterns),
index-ordered tie selection at the threshold (chamferdist tie order), weight
normalisation, and the (Vg, N) x (N, J) contraction on the MXU - everything
VMEM-resident per tile.

Why: the XLA formulation materialises the (B, Vg, N) distance matrix in HBM
(441 MB at production shapes) and every binary-search step re-reads it -
~73 ms/forward of pure HBM traffic. Here the distance tile never leaves
VMEM; HBM traffic is just xyz + the skinning-weight table + (Vg, J) outputs.

Forward-only: `models/skinning.py` wraps it with the XLA fallback as the
differentiable path (the posed stage stop-gradients its inputs, so the
backward is DCE'd in practice).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from garment4d_tpu.ops.pallas.precision import (
    dot_f32_presplit,
    split3_xla as _split3_xla,
)

_J_PAD = 128    # lane padding of the J=24 joint axis
# garment vertices per tile. 64 measured 3.3x faster than 32 at production
# shapes (B=8, Vg=2000, N=6890): the binary-search compare+reduce passes and
# the (Tm, N) x (N, J) MXU contraction amortise over twice the rows while
# the ~7 (Tm, N) f32 temporaries (~12 MB at 64) still fit VMEM; 128 measured
# equal to 64 with less headroom.
_TILE_M = 64


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kth_bits(bits, k: int, lo, hi, steps: int = 31):
    """Per-row k-th smallest int32 value (non-negative) by binary search.
    bits: (Tm, N); lo/hi: (Tm, 1) inclusive bounds containing the answer."""

    def body(_, carry):
        lo, hi = carry
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((bits <= mid).astype(jnp.int32), axis=1, keepdims=True)
        found = cnt >= k
        return jnp.where(found, lo, mid + 1), jnp.where(found, mid, hi)

    lo, hi = lax.fori_loop(0, steps, body, (lo, hi))
    return lo


def _prefix_lanes(x, n: int):
    """Inclusive prefix sum along lanes via log-step rolls."""
    lane = lax.broadcasted_iota(jnp.int32, x.shape, dimension=1)
    shift = 1
    while shift < n:
        rolled = pltpu.roll(x, shift, axis=1)
        x = x + jnp.where(lane >= shift, rolled, 0)
        shift *= 2
    return x


def _select_weights(bits, d2, t, k: int, tile_m: int):
    """Exact-k selection mask at threshold t (ties -> lower index), then the
    reference's 1/d^2 weights (`mesh_encoder.py:341-345`), row-normalised."""
    below = bits < t
    c_lt = jnp.sum(below.astype(jnp.int32), axis=1, keepdims=True)
    tie = bits == t
    cum_tie = _prefix_lanes(tie.astype(jnp.int32), bits.shape[1])
    sel = jnp.logical_or(below, jnp.logical_and(tie, cum_tie <= (k - c_lt)))
    w = jnp.where(sel, 1.0 / d2, 0.0)
    w = jnp.where(jnp.isinf(w), 0.0, w)
    w = w / jnp.sum(w, axis=1, keepdims=True)
    return jnp.where(jnp.isinf(w), 0.0, w)


def _dot_f32(wk, w0h, w0m, w0l):
    """f32-accurate (Tm, N) @ (N, Jp) on the MXU without precision=HIGHEST.

    Skinning weights are geometry-critical: the default single-pass bf16
    multiply drifts ~1e-3 relative from the HIGHEST-precision XLA fallback
    (caught on-chip by tools/verify_tpu.py: 20% of weights outside 2e-5).
    But precision=HIGHEST here makes the Mosaic backend compiler crash
    (tpu_compile_helper exit 1 - its 6-pass expansion temporaries on top of
    the kernel's ~12 MB of (Tm, Np) f32 live values). Equivalent math,
    explicit (ops/pallas/precision.py): w0's split is precomputed host-side
    so only wk's 3 small terms hit the vmem stack."""
    return dot_f32_presplit(wk, (w0h, w0m, w0l))


def _kernel(body_ref, garment_ref, w0h_ref, w0m_ref, w0l_ref, outk_ref,
            out64_ref, idx_ref, *, k: int, k64: int, n_valid: int,
            tile_m: int):
    """body_ref (1, 3, Np); garment_ref (1, Tm, 3); w0{h,m,l}_ref
    (1, Np, Jp) bf16 split terms; outk/out64 (1, Tm, Jp); idx_ref
    (1, Tm, 128)."""
    n_pad = body_ref.shape[-1]
    cx = garment_ref[0, :, 0:1]
    cy = garment_ref[0, :, 1:2]
    cz = garment_ref[0, :, 2:3]
    xs = body_ref[0]
    d2 = ((xs[0:1, :] - cx) ** 2 + (xs[1:2, :] - cy) ** 2
          + (xs[2:3, :] - cz) ** 2)  # (Tm, Np)
    lane = lax.broadcasted_iota(jnp.int32, (tile_m, n_pad), dimension=1)
    d2 = jnp.where(lane < n_valid, d2, jnp.float32(jnp.inf))
    bits = jax.lax.bitcast_convert_type(jnp.maximum(d2, 0.0), jnp.int32)

    minb = jnp.min(bits, axis=1, keepdims=True)
    maxb = jnp.max(jnp.where(lane < n_valid, bits, 0), axis=1, keepdims=True)

    # 1-NN index, ties -> lowest index (chamferdist order)
    at_min = bits == minb
    nn1 = jnp.min(jnp.where(at_min, lane, n_pad), axis=1, keepdims=True)
    idx_ref[0] = jnp.broadcast_to(nn1, (tile_m, 128))

    t_k = _kth_bits(bits, k, minb, maxb)
    w0h, w0m, w0l = w0h_ref[0], w0m_ref[0], w0l_ref[0]  # (Np, Jp) bf16
    wk = _select_weights(bits, d2, t_k, k, tile_m)
    outk_ref[0] = _dot_f32(wk, w0h, w0m, w0l)

    if k64 == k:
        out64_ref[0] = outk_ref[0]
    else:
        t_64 = _kth_bits(bits, k64, minb, t_k)  # k64 < k => t_64 <= t_k
        w64 = _select_weights(bits, d2, t_64, k64, tile_m)
        out64_ref[0] = _dot_f32(w64, w0h, w0m, w0l)


@functools.partial(jax.jit, static_argnums=(3, 4))
def knn_weight_transfer_pallas(garment: jax.Array, body: jax.Array,
                               w0: jax.Array, k: int, k64: int):
    """garment (B, Vg, 3), body (B, N, 3), w0 (B, N, J) ->
    (nnw_k (B, Vg, J), nnw_k64 (B, Vg, J), nn1_idx (B, Vg, 1) int32)."""
    B, Vg, _ = garment.shape
    N = body.shape[1]
    J = w0.shape[2]
    n_pad = _round_up(N, 128)
    m_pad = _round_up(Vg, _TILE_M)

    body_t = jnp.transpose(body, (0, 2, 1)).astype(jnp.float32)
    body_t = jnp.pad(body_t, ((0, 0), (0, 0), (0, n_pad - N)))
    cent = garment.astype(jnp.float32)
    if m_pad != Vg:
        cent = jnp.pad(cent, ((0, 0), (0, m_pad - Vg), (0, 0)))
    w0p = jnp.pad(w0.astype(jnp.float32),
                  ((0, 0), (0, n_pad - N), (0, _J_PAD - J)))
    w0hi, w0mid, w0lo = _split3_xla(w0p)  # host-side exact 3-term split

    w0_spec = pl.BlockSpec((1, n_pad, _J_PAD), lambda b, m: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    kern = functools.partial(_kernel, k=int(k), k64=int(k64), n_valid=N,
                             tile_m=_TILE_M)
    outk, out64, idx = pl.pallas_call(
        kern,
        grid=(B, m_pad // _TILE_M),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_M, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            w0_spec, w0_spec, w0_spec,
        ],
        out_specs=(
            pl.BlockSpec((1, _TILE_M, _J_PAD), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_M, _J_PAD), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TILE_M, 128), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, m_pad, _J_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, m_pad, _J_PAD), jnp.float32),
            jax.ShapeDtypeStruct((B, m_pad, 128), jnp.int32),
        ),
    )(body_t, cent, w0hi, w0mid, w0lo)
    return (outk[:, :Vg, :J], out64[:, :Vg, :J], idx[:, :Vg, 0:1])
