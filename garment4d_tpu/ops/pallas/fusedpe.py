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

`ops.pemax` wraps these in custom_vjps. The 2-layer PE blocks (the only
fused consumers trained in the posed stage) backprop through
`fused_pe_bwd_pallas` below - a VMEM-resident recompute+backward that never
materialises a (B, M, S, *) intermediate in HBM; the L-layer chain
(`group_chain_max`, frozen/eval-only SA consumers) keeps the unfused
reference recompute for its rare backward.

Replaces the HBM side of reference `group_points` + MLP + `max`
(`modules/pointnet2/pointnet2/src/group_points_gpu.cu`,
`modules/mesh_encoder.py:197-258,451-464`).
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


# ---------------------------------------------------------------------------
# dynamic-valid-count forward (candidate-compacted tables)
# ---------------------------------------------------------------------------
#
# The posed stage's body-PE blocks gather from the candidate-COMPACTED body
# table (`ops/pemax.py:query_group_pe_multi`): a static `cap` rows (~0.72 N)
# of which only the per-frame coverage count (often ~45-65%) are real - the
# rest are 1e9 sentinels no ball query can ever hit, so no idx points at
# them. The static `_chain_kernel` still scans every cap/128 chunk per
# 128-row gather group (its dominant cost at c_pad=8). This variant carries
# the per-batch-row valid counts via scalar prefetch (same mechanism as
# `ball_query._bq_grouped_kernel`) and bounds the chunk scan at
# ceil(nv/128) - exact for the same reason the query-side group skipping is.
# The table is laid out (n_chunks, c_pad, 128) so the chunk loop can be a
# `lax.fori_loop` with a traced bound (dynamic leading-dim ref loads are
# supported; dynamic lane slices are not).


def _chain_kernel_nv(nvalid_ref, table_ref, idx_ref, ctr_ref, *refs, S: int,
                     TC: int, n_chunks: int, c_pad: int, dims, relus):
    """`_chain_kernel` with a dynamic chunk bound. table_ref
    (1, n_chunks, c_pad, 128); nvalid_ref (B,) scalar-prefetch; other refs
    as in `_chain_kernel`."""
    L = len(relus)
    w_refs = refs[0:2 * L:2]
    b_refs = refs[1:2 * L:2]
    out_ref = refs[2 * L]
    R = S * TC
    j_groups = R // 128

    nv = nvalid_ref[pl.program_id(0)]
    # clamp to >= 1: at nv == 0 every idx is the no-hit prefill 0, and the
    # static kernel gathers table row 0 (a 1e9 sentinel) for it; a
    # zero-iteration scan would return 0 instead and make exactness depend
    # on the caller's no-hit fixup. One chunk keeps the two kernels bitwise
    # equal unconditionally.
    live = jnp.clip((nv + 127) // 128, 1, n_chunks)

    # ---- gather: chunk-outer fori loop with a traced bound --------------
    chunk_ids = []
    locals_ = []
    for j in range(j_groups):
        idxj = jnp.broadcast_to(idx_ref[0, 0, j:j + 1, :], (c_pad, 128))
        chunk_ids.append(idxj // 128)
        locals_.append(idxj - chunk_ids[j] * 128)

    def body(c, gs):
        chunk = table_ref[0, c]  # (c_pad, 128) dynamic leading-dim load
        return tuple(
            jnp.where(chunk_ids[j] == c,
                      jnp.take_along_axis(chunk, locals_[j], axis=1), gs[j])
            for j in range(j_groups))

    groups = lax.fori_loop(
        0, live, body,
        tuple(jnp.zeros((c_pad, 128), jnp.float32)
              for _ in range(j_groups)))
    g = jnp.concatenate(groups, axis=1)  # (c_pad, R)

    # ---- identical tail to _chain_kernel --------------------------------
    ctr = ctr_ref[0]  # (8, TC)
    if c_pad > 8:
        ctr = jnp.pad(ctr, ((0, c_pad - 8), (0, 0)))
    ctr = jnp.concatenate([ctr] * S, axis=1)  # (c_pad, R) s-major
    h = g - ctr

    prev = c_pad
    for i in range(L):
        w = w_refs[i][:, :prev]
        h = jnp.dot(w, h, preferred_element_type=jnp.float32)
        h = h + b_refs[i][:, 0:1]
        if relus[i]:
            h = jnp.maximum(h, 0.0)
        prev = dims[i]

    acc = h[:, :TC]
    for s in range(1, S):
        acc = jnp.maximum(acc, h[:, s * TC:(s + 1) * TC])
    out_ref[0] = acc


@functools.partial(jax.jit, static_argnums=(5, 6))
def fused_chain_pallas_nv(table: jax.Array, idx: jax.Array,
                          centers: jax.Array, weights, biases, relus,
                          nsample: int, n_valid: jax.Array) -> jax.Array:
    """`fused_chain_pallas` for sentinel-padded tables: `n_valid` (B,) int32
    counts the real leading rows per batch row; the in-kernel gather skips
    chunks past it. EXACT iff no idx value is >= max(n_valid[b], 128)
    (guaranteed for ball-query outputs over 1e9-sentinel-padded tables -
    sentinels never hit, and no-hit centers yield the prefill idx 0, which
    the kernel always scans: the chunk bound is clamped to >= 1 so
    n_valid[b] == 0 still gathers the sentinel row 0 exactly like the
    static kernel)."""
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
    n_chunks = n_pad // 128

    t = jnp.transpose(table, (0, 2, 1)).astype(jnp.float32)
    t = jnp.pad(t, ((0, 0), (0, c_pad - C), (0, n_pad - N)))
    # chunk-major layout for dynamic leading-dim loads in the kernel
    t = jnp.transpose(t.reshape(B, c_pad, n_chunks, 128), (0, 2, 1, 3))
    ix = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, m_pad - M), (0, 0)))
    ix = ix.reshape(B, m_pad // TC, TC, S)
    ix = jnp.transpose(ix, (0, 1, 3, 2)).reshape(
        B, m_pad // TC, (S * TC) // 128, 128)
    ctr = jnp.transpose(centers.astype(jnp.float32), (0, 2, 1))
    ctr = jnp.pad(ctr, ((0, 0), (0, 5), (0, m_pad - M)))
    nv = n_valid.reshape(B).astype(jnp.int32)

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
            pl.BlockSpec((f_i, lanes), lambda b_, j, nv_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_i, 128), lambda b_, j, nv_: (0, 0),
                         memory_space=pltpu.VMEM),
        ])
        prev = f_i

    kern = functools.partial(
        _chain_kernel_nv, S=S, TC=TC, n_chunks=n_chunks, c_pad=c_pad,
        dims=dims, relus=tuple(bool(r) for r in relus))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, m_pad // TC),
        in_specs=[
            pl.BlockSpec((1, n_chunks, c_pad, 128),
                         lambda b_, j, nv_: (b_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, (S * TC) // 128, 128),
                         lambda b_, j, nv_: (b_, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, TC), lambda b_, j, nv_: (b_, 0, j),
                         memory_space=pltpu.VMEM),
        ] + wb_specs,
        out_specs=pl.BlockSpec((1, dims[-1], TC),
                               lambda b_, j, nv_: (b_, 0, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, dims[-1], m_pad), jnp.float32),
    )(nv, t, ix, ctr, *wb)
    return jnp.transpose(out[:, :G, :M], (0, 2, 1))


def group_pe_max_pallas_nv(table: jax.Array, idx: jax.Array,
                           centers: jax.Array, k0: jax.Array, b0: jax.Array,
                           k1: jax.Array, b1: jax.Array, nsample: int,
                           n_valid: jax.Array) -> jax.Array:
    """`group_pe_max_pallas` over a sentinel-padded table (see
    `fused_chain_pallas_nv`)."""
    return fused_chain_pallas_nv(table, idx, centers, (k0, k1), (b0, b1),
                                 (True, False), nsample, n_valid)


# ---------------------------------------------------------------------------
# fused PE backward
# ---------------------------------------------------------------------------
#
# The training backward of `group_pe_max` used to recompute the unfused
# reference formulation under jax.vjp: every (B, M, S, *) intermediate (the
# gathered neighbourhoods, both MLP activations, the max-routing masks and
# their cotangents) materialises in HBM twice - measured as ~63 ms of
# copies/pads per B=4 train step (PLAN round 2). This kernel runs the whole
# backward per center tile in VMEM: recompute the forward chain, route the
# cotangent through the max (JAX semantics: even split among exact ties),
# backprop the two layers, and accumulate
#   * dtable via in-kernel one-hot MXU scatter-add (same exact 3-term bf16
#     payload split as ops/pallas/scatter.py),
#   * the four weight/bias grads across all grid steps,
#   * dcenters = -sum_s dqg[:3].
# Only the final gradients touch HBM.

_TC_BWD = 128  # center lanes per backward grid step (R = S * 128)
_MAX_BWD_LIVE_BYTES = 12 * 1024 * 1024


def pe_bwd_supported(n: int, c: int, s: int, f: int, g: int,
                     table_grad: bool = True) -> bool:
    """Backward-kernel shape gate (mirrors `chain_supported`). TC is fixed
    at 128 lanes, so the gathered block is R = s*128 and the live set
    scales with s * max(c, f, g). With `table_grad=False` the dtable
    accumulator is absent, so the table-resident VMEM term halves."""
    n_pad = _round_up(n, 128)
    c_pad = _round_up(c, 8)
    if c_pad * n_pad * 4 > _MAX_TABLE_BYTES:
        return False
    if f > 128 or g > 128:
        return False
    f_p, g_p = _round_up(f, 8), _round_up(g, 8)
    live = (3 * c_pad + 3 * f_p + 2 * g_p) * s * _TC_BWD * 4 \
        + (2 if table_grad else 1) * c_pad * n_pad * 4
    if live > _MAX_BWD_LIVE_BYTES:
        return False
    return (n_pad // 128) * max(c_pad // 8, 1) <= 1024


def _pe_bwd_kernel(table_ref, idx_ref, ctr_ref, gt_ref, w0t_ref, b0_ref,
                   w1t_ref, w0f_ref, w1f_ref, *out_refs, S: int, TC: int,
                   n_chunks: int, c_pad: int, f_p: int, g_p: int,
                   lanes_c: int, table_grad: bool):
    """Grid (B, m_tiles). table_ref (1, c_pad, n_pad) cf; idx_ref
    (1, 1, R/128, 128) s-major; ctr_ref (1, 8, TC); gt_ref (1, g_p, TC)
    cotangent cf; w0t (f_p, lanes_c) = k0^T padded; b0 (f_p, 128); w1t
    (g_p, 128) = k1^T padded; w0f (c_pad, 128) = k0 padded; w1f (f_p, 128)
    = k1 padded. Outputs: [dtable (1, c_pad, n_pad) accumulated over m
    tiles — only when `table_grad`]; dctr (1, 8, TC); dk0 (f_p, lanes_c),
    db0 (f_p, 128), dk1 (g_p, 128), db1 (g_p, 128) accumulated over the
    whole grid. Without `table_grad` (a frozen/non-trainable table, e.g.
    the posed stage's body xyz+normals) the dominant dtable one-hot MXU
    scatter and its VMEM accumulator are skipped entirely."""
    if table_grad:
        (dtable_ref, dctr_ref, dk0_ref, db0_ref, dk1_ref, db1_ref,
         dqg_scr) = out_refs
    else:
        dctr_ref, dk0_ref, db0_ref, dk1_ref, db1_ref = out_refs
    R = S * TC
    j_groups = R // 128
    first = jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0)

    @pl.when(first)
    def _zero_weights():
        dk0_ref[...] = jnp.zeros_like(dk0_ref)
        db0_ref[...] = jnp.zeros_like(db0_ref)
        dk1_ref[...] = jnp.zeros_like(dk1_ref)
        db1_ref[...] = jnp.zeros_like(db1_ref)

    if table_grad:
        @pl.when(pl.program_id(1) == 0)
        def _zero_dtable():
            dtable_ref[0] = jnp.zeros_like(dtable_ref[0])

    # ---- forward recompute (same math as _chain_kernel) -----------------
    groups = []
    for j in range(j_groups):
        idxj = jnp.broadcast_to(idx_ref[0, 0, j:j + 1, :], (c_pad, 128))
        chunk_id = idxj // 128
        local = idxj - chunk_id * 128
        gj = jnp.zeros((c_pad, 128), jnp.float32)
        for c in range(n_chunks):
            chunk = table_ref[0, :, c * 128:(c + 1) * 128]
            got = jnp.take_along_axis(chunk, local, axis=1)
            gj = jnp.where(chunk_id == c, got, gj)
        groups.append(gj)
    ctr = ctr_ref[0]  # (8, TC)
    if c_pad > 8:
        ctr = jnp.pad(ctr, ((0, c_pad - 8), (0, 0)))
    qg = jnp.concatenate(groups, axis=1) - jnp.concatenate([ctr] * S, axis=1)

    hpre = jnp.dot(w0t_ref[:, :c_pad], qg,
                   preferred_element_type=jnp.float32) + b0_ref[:, 0:1]
    h = jnp.maximum(hpre, 0.0)
    h2 = jnp.dot(w1t_ref[:, :f_p], h,
                 preferred_element_type=jnp.float32)  # (g_p, R); +b1 cancels
    out = h2[:, :TC]
    for s in range(1, S):
        out = jnp.maximum(out, h2[:, s * TC:(s + 1) * TC])

    # ---- max routing: even split among exact ties (JAX reduce_max VJP) --
    cnt = jnp.zeros((g_p, TC), jnp.float32)
    for s in range(S):
        cnt = cnt + (h2[:, s * TC:(s + 1) * TC] == out).astype(jnp.float32)
    gt = gt_ref[0] / cnt  # padded rows/cols: gt == 0 -> contributions 0
    parts = [jnp.where(h2[:, s * TC:(s + 1) * TC] == out, gt, 0.0)
             for s in range(S)]
    dh2 = jnp.concatenate(parts, axis=1)  # (g_p, R)

    # ---- layer backprop ---------------------------------------------------
    db1_ref[...] += jnp.broadcast_to(
        jnp.sum(dh2, axis=1, keepdims=True), db1_ref.shape)
    dk1 = lax.dot_general(dh2, h, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # (g_p, f_p)
    dk1_ref[...] += jnp.pad(dk1, ((0, 0), (0, 128 - f_p)))
    dh1 = jnp.dot(w1f_ref[:, :g_p], dh2,
                  preferred_element_type=jnp.float32)
    dh1 = jnp.where(hpre > 0.0, dh1, 0.0)  # (f_p, R)
    db0_ref[...] += jnp.broadcast_to(
        jnp.sum(dh1, axis=1, keepdims=True), db0_ref.shape)
    dk0 = lax.dot_general(dh1, qg, (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # (f_p, c_pad)
    dk0_ref[...] += jnp.pad(dk0, ((0, 0), (0, lanes_c - c_pad)))
    if table_grad:
        dqg = jnp.dot(w0f_ref[:, :f_p], dh1,
                      preferred_element_type=jnp.float32)  # (c_pad, R)
    else:
        # only the xyz sublanes of dqg feed dcenters; the full (c_pad, R)
        # matmul exists solely for the dtable scatter
        dqg = jnp.dot(w0f_ref[:8, :f_p], dh1,
                      preferred_element_type=jnp.float32)  # (8, R)

    # ---- dcenters: -sum_s dqg slice, xyz sublanes ------------------------
    dctr = dqg[:8, :TC]
    for s in range(1, S):
        dctr = dctr + dqg[:8, s * TC:(s + 1) * TC]
    dctr_ref[0] = -dctr

    if not table_grad:
        return

    # ---- dtable: one-hot MXU scatter-add, exact 3-term payload split.
    # fori_loop (not an unrolled python loop) so Mosaic reuses one
    # iteration's stack - unrolled, the 32 groups' one-hot temporaries
    # blew the 16 MB scoped-vmem limit at the full-body branch (19.8 MB).
    # Mosaic cannot lower dynamic_slice of a *value* inside the loop, so
    # dqg is staged group-major into a VMEM scratch first (static writes)
    # and the body reads dqg_scr[j] - a dynamic leading-dim ref load, which
    # IS supported. The one-hot and the split terms are built in bf16
    # directly: every value is exactly bf16-representable and the
    # DEFAULT-precision MXU pass multiplies in bf16 regardless, so this
    # halves the temporaries without changing a bit of the result.
    lane_n = lax.broadcasted_iota(jnp.int32, (128, dtable_ref.shape[-1]),
                                  dimension=1)
    for j in range(j_groups):
        dqg_scr[j] = dqg[:, j * 128:(j + 1) * 128]

    def jbody(j, _):
        idxj = idx_ref[0, 0, j, :].reshape(128, 1)
        onehot = (lane_n == idxj).astype(jnp.bfloat16)
        payload = dqg_scr[j]
        hi = payload.astype(jnp.bfloat16)
        mid_f = payload - hi.astype(jnp.float32)
        mid = mid_f.astype(jnp.bfloat16)
        lo = (mid_f - mid.astype(jnp.float32)).astype(jnp.bfloat16)
        acc = dtable_ref[0]
        for part in (hi, mid, lo):
            acc = acc + jnp.dot(part, onehot,
                                preferred_element_type=jnp.float32)
        dtable_ref[0] = acc
        return 0

    lax.fori_loop(0, j_groups, jbody, 0)


def fused_pe_bwd_pallas(table: jax.Array, idx: jax.Array, centers: jax.Array,
                        k0: jax.Array, b0: jax.Array, k1: jax.Array,
                        b1: jax.Array, nsample: int, cot: jax.Array,
                        table_grad: bool = True):
    """VJP of `group_pe_max_pallas` w.r.t. (table, centers, k0, b0, k1, b1).

    cot (B, M, G) is the output cotangent. Returns gradients with the
    callers' shapes/dtypes. b1's gradient is sum(cot) (the bias is inside
    the max but constant across S, so it cancels out of the tie routing).

    `table_grad=False` skips the dtable one-hot MXU scatter — the dominant
    arithmetic of the backward (3 bf16 passes x S groups x (c_pad, 128) @
    (128, n_pad) per grid step) — and returns only
    (d_centers, d_k0, d_b0, d_k1, d_b1). For frozen tables (the posed
    stage's body xyz+normals, which are batch data with no path to any
    trained parameter) that work is computed-then-discarded otherwise; XLA
    cannot DCE inside the fused kernel.
    """
    B, N, C = table.shape
    M = idx.shape[1]
    S = nsample
    F, G = k0.shape[1], k1.shape[1]
    n_pad = _round_up(N, 128)
    c_pad = _round_up(C, 8)
    f_p, g_p = _round_up(F, 8), _round_up(G, 8)
    lanes_c = _round_up(c_pad, 128)
    TC = _TC_BWD
    m_pad = _round_up(M, TC)

    t = jnp.transpose(table, (0, 2, 1)).astype(jnp.float32)
    t = jnp.pad(t, ((0, 0), (0, c_pad - C), (0, n_pad - N)))
    ix = jnp.pad(idx.astype(jnp.int32), ((0, 0), (0, m_pad - M), (0, 0)))
    ix = ix.reshape(B, m_pad // TC, TC, S)
    ix = jnp.transpose(ix, (0, 1, 3, 2)).reshape(
        B, m_pad // TC, (S * TC) // 128, 128)
    ctr = jnp.transpose(centers.astype(jnp.float32), (0, 2, 1))
    ctr = jnp.pad(ctr, ((0, 0), (0, 5), (0, m_pad - M)))
    gt = jnp.transpose(cot.astype(jnp.float32), (0, 2, 1))
    gt = jnp.pad(gt, ((0, 0), (0, g_p - G), (0, m_pad - M)))

    w0t = jnp.pad(jnp.transpose(k0.astype(jnp.float32)),
                  ((0, f_p - F), (0, lanes_c - C)))
    b0p = jnp.broadcast_to(
        jnp.pad(b0.astype(jnp.float32), (0, f_p - F))[:, None], (f_p, 128))
    w1t = jnp.pad(jnp.transpose(k1.astype(jnp.float32)),
                  ((0, g_p - G), (0, 128 - F)))
    w0f = jnp.pad(k0.astype(jnp.float32), ((0, c_pad - C), (0, 128 - F)))
    w1f = jnp.pad(k1.astype(jnp.float32), ((0, f_p - F), (0, 128 - G)))

    kern = functools.partial(
        _pe_bwd_kernel, S=S, TC=TC, n_chunks=n_pad // 128, c_pad=c_pad,
        f_p=f_p, g_p=g_p, lanes_c=lanes_c, table_grad=table_grad)
    dtable_specs = (
        (pl.BlockSpec((1, c_pad, n_pad), lambda b_, j: (b_, 0, 0),
                      memory_space=pltpu.VMEM),),
        (jax.ShapeDtypeStruct((B, c_pad, n_pad), jnp.float32),),
    ) if table_grad else ((), ())
    outs = pl.pallas_call(
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
            pl.BlockSpec((1, g_p, TC), lambda b_, j: (b_, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_p, lanes_c), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_p, 128), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_p, 128), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_pad, 128), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_p, 128), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=dtable_specs[0] + (
            pl.BlockSpec((1, 8, TC), lambda b_, j: (b_, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_p, lanes_c), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f_p, 128), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_p, 128), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g_p, 128), lambda b_, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=dtable_specs[1] + (
            jax.ShapeDtypeStruct((B, 8, m_pad), jnp.float32),
            jax.ShapeDtypeStruct((f_p, lanes_c), jnp.float32),
            jax.ShapeDtypeStruct((f_p, 128), jnp.float32),
            jax.ShapeDtypeStruct((g_p, 128), jnp.float32),
            jax.ShapeDtypeStruct((g_p, 128), jnp.float32),
        ),
        scratch_shapes=(
            [pltpu.VMEM(((S * TC) // 128, c_pad, 128), jnp.float32)]
            if table_grad else []),
    )(t, ix, ctr, gt, w0t, b0p, w1t, w0f, w1f)

    if table_grad:
        dtable, dctr, dk0, db0, dk1, db1 = outs
    else:
        dctr, dk0, db0, dk1, db1 = outs
    d_centers = jnp.transpose(dctr[:, :3, :M], (0, 2, 1)).astype(centers.dtype)
    d_k0 = jnp.transpose(dk0[:F, :C]).astype(k0.dtype)
    d_b0 = db0[:F, 0].astype(b0.dtype)
    d_k1 = jnp.transpose(dk1[:G, :F]).astype(k1.dtype)
    d_b1 = db1[:G, 0].astype(b1.dtype)
    if not table_grad:
        return d_centers, d_k0, d_b0, d_k1, d_b1
    d_table = jnp.transpose(dtable[:, :C, :N], (0, 2, 1)).astype(table.dtype)
    return d_table, d_centers, d_k0, d_b0, d_k1, d_b1
