"""Fused banded-GCN stack Pallas kernel.

The posed stage's per-iteration refinement is a 4-layer GCN over the
ring-ordered garment template (reference `modules/mesh_encoder.py:450-485`,
`modules/pygcn/layers.py:15-58`): h <- adj @ (h @ W_l) + b_l (+ ReLU on all
but the last layer). Run unfused that is 8 HBM-bound ops per layer; worse,
the banded `adj @ .` kernel in channel-LAST layout rolls the (V, C) tile
along SUBLANES, which Mosaic lowers to cross-sublane permutes ~8x off the
VPU's lane-roll speed (~2.1 ms per multiply at production shapes).

This kernel runs the WHOLE stack channel-first and VMEM-resident per batch
element: the weight matmuls are MXU `(F, C) @ (C, V)` contractions, the
banded multiply is D cyclic LANE rolls (cheap), and no intermediate ever
reaches HBM. The input arrives as the UNCONCATENATED feature pieces
([xyz, 6 PE blocks, temporal-attention mix], reference
`mesh_encoder.py:465-476`): the first layer's matmul distributes over the
concatenation, `W0^T @ concat(p_i) == sum_i W0_i^T @ p_i`, so each piece is
contracted against its row-slice of W0 straight from its channel-LAST
layout - the (B, V, 323) concatenated feature and its lane-padded copy
(~0.5 GB of HBM writes per forward) never exist. HBM traffic: the pieces
(read once), weights/diags, and the two outputs (final layer + the
post-ReLU 3rd-layer feature that temporal attention consumes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from garment4d_tpu.ops.pallas.precision import dot_f32


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _banded_cf(h, vals_ref, offsets, v_valid: int):
    """Channel-first banded multiply: h (F, Vp) -> (F, Vp) with
    out[:, i] = sum_d vals[d, i] * h[:, (i + o_d) mod v_valid]."""
    F, v_pad = h.shape
    lanecol = lax.broadcasted_iota(jnp.int32, (F, v_pad), dimension=1)
    acc = None
    for d, o in enumerate(offsets):
        w = vals_ref[d:d + 1, :]  # (1, Vp)
        if o == 0:
            shifted = h
        else:
            a = pltpu.roll(h, v_pad - o, axis=1)            # h[i + o - v_pad]
            b = pltpu.roll(h, v_pad - o + v_valid, axis=1)  # h[i + o - v_valid]
            shifted = jnp.where(lanecol < v_valid - o, a, b)
        term = shifted * w
        acc = term if acc is None else acc + term
    return acc


def _stack_kernel(vals_ref, *refs, offsets, relus, v_valid: int, v_pad: int,
                  n_pieces: int, n_weights: int, hidden_layer: int):
    """vals_ref (Dp, Vp); refs = piece refs (1, C_i, V) CHANNEL-FIRST
    (channel-last blocks would pad each piece's C_i lanes to 128 - 1 MB of
    VMEM per 32-wide piece; channel-first they tile to C_i/8 sublane rows),
    then layer-0 weight slices (F0, C_i) (one per piece, = W0[rows of piece
    i]^T), b0 (F0, 1), then [w_l (F_l, F_{l-1}), b_l (F_l, 1)] for l >= 1,
    then out_ref (1, F_last_p, Vp) and hidden_ref (1, F_hidden, Vp)."""
    x_refs = refs[:n_pieces]
    w0_refs = refs[n_pieces:2 * n_pieces]
    rest = refs[2 * n_pieces:]
    b0_ref = rest[0]
    w_refs = rest[1:1 + 2 * (n_weights - 1)]
    out_ref, hidden_ref = rest[1 + 2 * (n_weights - 1):]

    # layer 0: contract each channel-first piece against its W0 row-slice
    support = None
    for i in range(n_pieces):
        xi = x_refs[i][0]       # (C_i, V) channel-first
        wi = w0_refs[i][...]    # (F0, C_i)
        # exact-f32 dots on the layer matmuls (here and below): the GCN
        # emits geometry (vertex offsets); the default single-pass bf16
        # multiply drifts the fused stack from the HIGHEST-precision XLA
        # path (tools/verify_tpu.py caught 3e-4 forward deviations). The
        # explicit 6-pass bf16 split, NOT precision=HIGHEST: Mosaic's
        # HIGHEST expansion temporaries blow the 16 MB scoped-vmem stack at
        # the 323-wide attention-iteration input (the round-3 bench
        # regression: "Scoped allocation with size 16.01M ... exceeded").
        t = dot_f32(wi, xi)  # (F0, V)
        support = t if support is None else support + t
    if v_pad != v_valid:
        support = jnp.pad(support, ((0, 0), (0, v_pad - v_valid)))
    h = _banded_cf(support, vals_ref, offsets, v_valid) + b0_ref[...]
    if relus[0]:
        h = jnp.maximum(h, 0.0)
    if hidden_layer == 0:
        hidden_ref[0] = h

    for l in range(1, n_weights):
        wt = w_refs[2 * (l - 1)][...]     # (F_l, F_{l-1})
        b = w_refs[2 * (l - 1) + 1][...]  # (F_l, 1)
        support = dot_f32(wt, h)
        h = _banded_cf(support, vals_ref, offsets, v_valid) + b
        if relus[l]:
            h = jnp.maximum(h, 0.0)
        if l == hidden_layer:
            hidden_ref[0] = h
    out_ref[0] = h


def gcn_stack_cf_pallas(xs, weights, biases, vals: jax.Array,
                        offsets, relus, hidden_layer: int):
    """xs: tuple of (B, V, C_i) channel-last f32 feature pieces (their
    concatenation is the stack input); weights: list of (C_in, C_out) with
    weights[0] taking sum(C_i) rows; biases: (C_out,); vals: (D, V)
    cyclic-diagonal values of the adjacency; offsets/relus: static tuples;
    hidden_layer: index of the layer whose post-activation output is
    returned alongside (the temporal-attention feed).
    Returns (out (B, V, C_last), hidden (B, V, C_hidden))."""
    B, V, _ = xs[0].shape
    L = len(weights)
    D = len(offsets)
    v_pad = _round_up(V, 128)
    d_pad = _round_up(D, 8)
    f_hidden = weights[hidden_layer].shape[1]
    f_last = weights[-1].shape[1]
    f_last_p = _round_up(f_last, 8)
    assert V % 8 == 0  # full-block piece reads need 8-aligned sublanes

    valsp = jnp.pad(vals.astype(jnp.float32),
                    ((0, d_pad - D), (0, v_pad - V)))

    # layer-0 weight, split by piece rows, transposed (F0, C_i)
    f0 = weights[0].shape[1]
    piece_args, piece_specs = [], []
    w0_args, w0_specs = [], []
    off = 0
    for x in xs:
        c_i = x.shape[-1]
        # channel-first piece: (1, C_i, V) blocks tile compactly in VMEM
        piece_args.append(jnp.transpose(x.astype(jnp.float32), (0, 2, 1)))
        piece_specs.append(
            pl.BlockSpec((1, c_i, V), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM))
        w0_args.append(
            jnp.transpose(weights[0][off:off + c_i].astype(jnp.float32)))
        w0_specs.append(
            pl.BlockSpec((f0, c_i), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM))
        off += c_i
    assert off == weights[0].shape[0], "piece widths must sum to W0 rows"

    wb_args = [biases[0].astype(jnp.float32)[:, None]]
    wb_specs = [pl.BlockSpec((f0, 1), lambda bb: (0, 0),
                             memory_space=pltpu.VMEM)]
    for i in range(1, L):
        w, b = weights[i], biases[i]
        c_in, c_out = w.shape
        assert i == L - 1 or c_out % 8 == 0, "hidden widths must be 8-aligned"
        f_p = _round_up(c_out, 8) if i == L - 1 else c_out
        wt = jnp.pad(jnp.transpose(w.astype(jnp.float32)),
                     ((0, f_p - c_out), (0, 0)))
        bp = jnp.pad(b.astype(jnp.float32), (0, f_p - c_out))[:, None]
        wb_args += [wt, bp]
        wb_specs += [
            pl.BlockSpec(wt.shape, lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(bp.shape, lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),
        ]

    kernel = functools.partial(
        _stack_kernel, offsets=tuple(int(o) for o in offsets),
        relus=tuple(bool(r) for r in relus), v_valid=V, v_pad=v_pad,
        n_pieces=len(xs), n_weights=L, hidden_layer=hidden_layer)
    out, hidden = pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            pl.BlockSpec((d_pad, v_pad), lambda bb: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + piece_specs + w0_specs + wb_specs,
        out_specs=(
            pl.BlockSpec((1, f_last_p, v_pad), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f_hidden, v_pad), lambda bb: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, f_last_p, v_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, f_hidden, v_pad), jnp.float32),
        ),
    )(valsp, *piece_args, *w0_args, *wb_args)
    out = jnp.transpose(out[:, :f_last, :V], (0, 2, 1))
    hidden = jnp.transpose(hidden[:, :, :V], (0, 2, 1))
    return out, hidden


def stack_supported(V: int, piece_widths, widths, offsets) -> bool:
    """VMEM feasibility of the fused stack at these shapes.

    Two constraints, modelled separately because Mosaic accounts them
    separately: (a) SCOPED allocations (in-kernel temporaries) against the
    16 MB scoped-vmem stack - the budget the round-3 precision=HIGHEST dots
    blew at the 323-wide attention shape; (b) total VMEM (block buffers +
    scoped) against the chip's 128 MB. The scoped model follows the kernel's
    explicit dot_f32 form: per dot site, 3 bf16 split terms of each operand
    (only ONE piece's split is live at a time in the layer-0 loop) plus one
    f32 product and the f32 accumulators; the banded multiply adds the int32
    lane iota and up to 3 roll/select temporaries per offset step. Margins:
    verified on-chip at the production call-site widths (cin=195
    no-attention and cin=323 attention, V=2000) by tools/verify_tpu.py."""
    if offsets is None or len(offsets) > 16 or V % 8 != 0:
        return False
    v_pad = _round_up(V, 128)
    c0_pad = _round_up(sum(int(c) for c in piece_widths), 8)
    cmax = max(int(c) for c in piece_widths)
    fmax = max(int(w) for w in widths)
    lane_f32 = v_pad * 4
    # widest-layer f32 accumulator + product + support/h (3 rows of fmax),
    # the widest live right-operand's 3-term bf16 split (1.5), and the
    # banded-multiply temporaries (lane iota + rolls + select, ~5)
    scoped = int(8 * fmax + 1.5 * max(cmax, fmax)) * lane_f32
    weight_bytes = sum(int(w) * c0_pad for w in widths) * 4
    blocks = (c0_pad + 16 + 3 * fmax) * lane_f32 + weight_bytes
    return scoped < 13 * 1024 * 1024 and scoped + blocks < 100 * 1024 * 1024
