"""Fused neighbourhood-gather + MLP-chain + max-pool Pallas kernel.

The posed stage's positional-encoding blocks and the (eval-mode) PointNet++
set-abstraction stages all compute, per center,
`max_s MLP(concat(xyz[idx_s] - center, feat[idx_s]))` over the S grouped
neighbours (reference `mesh_encoder.py:451-464`,
`pointnet2_modules.py:19-55`). Unfused, the gathered (B, C, M, S)
neighbourhoods and every MLP intermediate round-trip through HBM - the
single largest data-movement cost of the posed forward (~160 ms/fwd at
production shapes). This kernel keeps everything in VMEM: the feature table
is resident (as in `gather.py`), each grid step gathers S x TC rows in
s-major lane order, runs the whole matmul chain on the MXU, reduces the max
over S contiguous TC-lane slices, and writes only the (F, TC) result. HBM
traffic drops from ~5 GB to ~100 MB per refinement iteration.

Forward-only: `ops.pemax` wraps it in custom_vjps whose backward recomputes
the unfused reference formulation (the same trade `jax.checkpoint` makes
for these blocks in training); the SA consumers are frozen/eval-only.

Replaces the HBM side of reference `group_points` + MLP + `max`
(`modules/pointnet2/pointnet2/src/group_points_gpu.cu`,
`modules/mesh_encoder.py:197-258,451-464`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_R_TILE = 4096  # gathered lanes per grid step (= S * TC)
_MAX_TABLE_BYTES = 4 * 1024 * 1024
_MAX_LIVE_BYTES = 12 * 1024 * 1024  # gathered block + widest two intermediates


def chain_supported(n: int, c: int, s: int, widths=(32, 32),
                    m: int = None) -> bool:
    """Whether the fused kernel handles (and likely wins at) this shape.

    `m` (center count) permits center tiles narrower than 128 lanes: a
    TC < 128 output block is legal only when it covers the whole padded
    center axis (one grid step), i.e. m <= TC - the regime of the wide
    S=64 SA scales (sa3 / garment_sa2, 64 centers)."""
    n_pad = _round_up(n, 128)
    c_pad = _round_up(c, 8)
    if c_pad * n_pad * 4 > _MAX_TABLE_BYTES:
        return False
    if _R_TILE % s:
        return False
    tc = _R_TILE // s
    if tc < 128 and (m is None or m > tc):
        return False
    wmax = max(_round_up(w, 8) for w in widths)
    if (c_pad + 2 * wmax) * _R_TILE * 4 > _MAX_LIVE_BYTES:
        return False
    return (n_pad // 128) * max(c_pad // 8, 1) <= 1024


def pe_supported(n: int, c: int, s: int) -> bool:
    return chain_supported(n, c, s)


def _chain_kernel(table_ref, idx_ref, ctr_ref, *refs, S: int, TC: int,
                  n_chunks: int, c_pad: int, dims, relus):
    """table_ref (1, c_pad, n_pad); idx_ref (1, 1, S*TC/128, 128) s-major
    (flat lane s*TC + t = neighbour s of center t); ctr_ref (1, 8, TC) xyz
    on sublanes 0..2, zeros elsewhere; refs = [w_0, b_0, ..., w_{L-1},
    b_{L-1}, out]: w_i (dims[i], 128k) cols :prev = layer weight transposed,
    b_i (dims[i], 128) broadcast; out (1, dims[-1], TC)."""
    L = len(relus)
    w_refs = refs[0:2 * L:2]
    b_refs = refs[1:2 * L:2]
    out_ref = refs[2 * L]
    R = S * TC
    j_groups = R // 128

    # ---- gather: S*TC table rows, channel-first ------------------------
    groups = []
    for j in range(j_groups):
        idxj = jnp.broadcast_to(idx_ref[0, 0, j:j + 1, :], (c_pad, 128))
        chunk_id = idxj // 128
        local = idxj - chunk_id * 128
        g = jnp.zeros((c_pad, 128), jnp.float32)
        for c in range(n_chunks):
            chunk = table_ref[0, :, c * 128:(c + 1) * 128]
            got = jnp.take_along_axis(chunk, local, axis=1)
            g = jnp.where(chunk_id == c, got, g)
        groups.append(g)
    g = jnp.concatenate(groups, axis=1)  # (c_pad, R)

    # ---- relative coordinates: subtract the (zero-padded) center -------
    ctr = ctr_ref[0]  # (8, TC)
    if c_pad > 8:
        ctr = jnp.pad(ctr, ((0, c_pad - 8), (0, 0)))
    ctr = jnp.concatenate([ctr] * S, axis=1)  # (c_pad, R) s-major
    h = g - ctr

    # ---- the MLP chain on the MXU --------------------------------------
    prev = c_pad
    for i in range(L):
        w = w_refs[i][:, :prev]  # (dims[i], prev)
        h = jnp.dot(w, h, preferred_element_type=jnp.float32)
        h = h + b_refs[i][:, 0:1]
        if relus[i]:
            h = jnp.maximum(h, 0.0)
        prev = dims[i]

    # ---- max over the S contiguous TC-lane slices ----------------------
    acc = h[:, :TC]
    for s in range(1, S):
        acc = jnp.maximum(acc, h[:, s * TC:(s + 1) * TC])
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnums=(5, 6))
def fused_chain_pallas(table: jax.Array, idx: jax.Array, centers: jax.Array,
                       weights, biases, relus, nsample: int) -> jax.Array:
    """table (B, N, C) f32; idx (B, M, S) int32 in [0, N); centers (B, M, 3);
    weights: tuple of (C_{i-1}, C_i) matrices (C_0 = C); biases: matching
    (C_i,) vectors; relus: per-layer bool tuple ->
    (B, M, C_L) = max_s chain(table[idx_s] - pad(centers)).
    """
    B, N, C = table.shape
    M = idx.shape[1]
    S = nsample
    L = len(weights)
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 8)
    dims = tuple(_round_up(w.shape[1], 8) for w in weights)
    G = weights[-1].shape[1]
    TC = _R_TILE // S
    m_pad = _round_up(M, TC)

    t = jnp.transpose(table, (0, 2, 1)).astype(jnp.float32)
    t = jnp.pad(t, ((0, 0), (0, c_pad - C), (0, n_pad - N)))
    # s-major index layout: block j's lane s*TC + t = idx[j*TC + t, s]
    ix = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, m_pad - M), (0, 0)))
    ix = ix.reshape(B, m_pad // TC, TC, S)
    ix = jnp.transpose(ix, (0, 1, 3, 2)).reshape(
        B, m_pad // TC, (S * TC) // 128, 128)
    # centers channel-first on sublanes 0..2 of 8
    ctr = jnp.transpose(centers.astype(jnp.float32), (0, 2, 1))
    ctr = jnp.pad(ctr, ((0, 0), (0, 5), (0, m_pad - M)))

    wb = []
    wb_specs = []
    prev = c_pad
    for i, (w, b) in enumerate(zip(weights, biases)):
        f_i, lanes = dims[i], _round_up(prev, 128)
        wt = jnp.pad(jnp.transpose(w.astype(jnp.float32)),
                     ((0, f_i - w.shape[1]), (0, lanes - w.shape[0])))
        bp = jnp.broadcast_to(
            jnp.pad(b.astype(jnp.float32), (0, f_i - b.shape[0]))[:, None],
            (f_i, 128))
        wb.extend([wt, bp])
        wb_specs.extend([
            pl.BlockSpec((f_i, lanes), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_i, 128), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ])
        prev = f_i

    kern = functools.partial(
        _chain_kernel, S=S, TC=TC, n_chunks=n_pad // 128, c_pad=c_pad,
        dims=dims, relus=tuple(bool(r) for r in relus))
    out = pl.pallas_call(
        kern,
        grid=(B, m_pad // TC),
        in_specs=[
            pl.BlockSpec((1, c_pad, n_pad), lambda b_, j: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, (S * TC) // 128, 128),
                         lambda b_, j: (b_, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TC), lambda b_, j: (b_, 0, j),
                         memory_space=pltpu.VMEM),
        ] + wb_specs,
        out_specs=pl.BlockSpec((1, dims[-1], TC), lambda b_, j: (b_, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, dims[-1], m_pad), jnp.float32),
    )(t, ix, ctr, *wb)
    return jnp.transpose(out[:, :G, :M], (0, 2, 1))


def group_pe_max_pallas(table: jax.Array, idx: jax.Array, centers: jax.Array,
                        k0: jax.Array, b0: jax.Array, k1: jax.Array,
                        b1: jax.Array, nsample: int) -> jax.Array:
    """The 2-layer positional-encoding special case:
    (B, M, G) = max_s (relu((gather - ctr_pad) @ k0 + b0) @ k1 + b1)."""
    return fused_chain_pallas(table, idx, centers, (k0, k1), (b0, b1),
                              (True, False), nsample)
