"""Fused ball-query Pallas kernel (prefix scan + conditional full rescan).

Semantics match the reference CUDA kernel (`src/ball_query_gpu.cu:29-44`):
for each center, the first `nsample` in-radius point indices in index order;
tail slots replicate the first hit; centers with no hit keep index 0.

Per center tile the kernel keeps everything in VMEM: it computes squared
distances to a span of points (lanes), the in-radius mask, a lane-axis
prefix sum, and then each slot's index as `searchsorted(cum, s+1) ==
sum(cum < s+1)` - one (Tm, W) compare+reduce per slot. This full-vector
scan runs at ~85% of VPU peak; HBM traffic is just the xyz read and the
(M, nsample) index write.

Early exit (`prefix` argument): because the semantics only need the FIRST
`nsample` hits, high-density queries (the posed stage's body queries put
~100+ body points inside even the 0.1 ball) find all their hits within the
first couple thousand points. With `prefix=P` the kernel scans only points
[0, P) and then, under a `pl.when` on "any live center still short of its
quota", rescans the full array for straggler tiles. Typical tiles pay
~P/N of the full cost; stragglers pay ~1.15x. Callers enable this only
where hit density >> nsample (see `models/posed.py`); backbone SA queries,
whose quotas need most of the array, keep the plain full scan.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Experiment knobs, read ONCE at import: these feed @jax.jit-traced code
# whose trace cache is keyed on shapes/static args only, so a mid-process
# env change after a same-shape call would silently hit the stale cached
# program. Import-time resolution makes them honestly process-level (the
# round-5 A/Bs set them via one subprocess per setting).
_ENV_MXU_DIST = os.environ.get("G4D_BQ_MXU", "0") == "1"
_ENV_TILE_MID = int(os.environ.get("G4D_BQ_TILE_MID", "256"))
_ENV_TILE_PE = int(os.environ.get("G4D_BQ_TILE_PE", "512"))
# round-5 re-measure: 128-row tiles for big-table (n_pad > 2048) flat scans
# are ~7% faster standalone at sa1 shapes (31.6 vs 34.1 ms, bitwise exact)
# and +0.4 f/s on the full posed forward (278.0 vs 277.6); fits scoped vmem
# including the prefix-rescan path. (The round-2 note that 64 was required
# for VMEM at long rows no longer reproduces.)
_ENV_TILE_BIG = int(os.environ.get("G4D_BQ_TILE_BIG", "128"))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _slot_positions(cum, S: int):
    """Positions of the first S hits from an inclusive hit-count prefix
    `cum` (Tm, N): idx_s = #lanes with cum < s+1.

    Slots are paired: counts fit in 16 bits (N <= 8192), so two slots'
    indicator vectors pack into one int32 (low/high halfword) and SHARE the
    lane reduction - the dominant VPU cost of the query - cutting the
    passes per slot from compare+reduce to compare+shifted-add+half a
    reduce."""
    slots = []
    for s in range(0, S, 2):
        lo = (cum < s + 1).astype(jnp.int32)
        if s + 1 < S:
            lo = lo + ((cum < s + 2).astype(jnp.int32) << 16)
        tot = jnp.sum(lo, axis=-1, keepdims=True)
        slots.append(tot & 0xFFFF)
        if s + 1 < S:
            slots.append(tot >> 16)
    return jnp.concatenate(slots, axis=-1)  # (Tm, S)


def _scan(xyz_ref, cx, cy, cz, hi, radii2, nsamples, s_pads, n_valid,
          tile_m):
    """Full-vector first-`nsample` scan of points [0, hi): returns per
    radius (finalised idx (Tm, s_pad), hit count (Tm, 1))."""
    lane = lax.broadcasted_iota(jnp.int32, (tile_m, hi), dimension=1)
    valid = lane < n_valid
    xs = xyz_ref[0, :, 0:hi]  # (3, hi) static lane slice
    d2 = ((xs[0:1, :] - cx) ** 2 + (xs[1:2, :] - cy) ** 2
          + (xs[2:3, :] - cz) ** 2)  # (Tm, hi)

    # hit counts fit in 13 bits (hi <= 8192), so TWO radii's masks share one
    # prefix-sum: pack mask_a + mask_b<<13 into a single int32, run the
    # log-step roll scan once, unpack both cumulative counts. Cuts the roll
    # passes (the second-largest VPU cost after slot extraction) ~in half
    # for multi-radius queries.
    assert hi <= (1 << 13)
    masks = [jnp.logical_and(d2 < r2, valid) for r2 in radii2]
    packed_cums = []
    for i in range(0, len(masks), 2):
        packed = masks[i].astype(jnp.int32)
        if i + 1 < len(masks):
            packed = packed + (masks[i + 1].astype(jnp.int32) << 13)
        shift = 1
        while shift < hi:
            rolled = pltpu.roll(packed, shift, axis=1)
            packed = packed + jnp.where(lane >= shift, rolled, 0)
            shift *= 2
        packed_cums.append(packed & 0x1FFF)
        if i + 1 < len(masks):
            packed_cums.append(packed >> 13)

    results = []
    for cum, S, s_pad in zip(packed_cums, nsamples, s_pads):
        cnt = cum[:, hi - 1:hi]  # (Tm, 1)
        # (slot pairing as in _slot_positions measured SLOWER here: the flat
        # scan's reduce is already fused; the extra shift-adds cost ~4%)
        slots = [jnp.sum((cum < s + 1).astype(jnp.int32), axis=-1,
                         keepdims=True) for s in range(S)]
        idx = jnp.concatenate(slots, axis=-1)  # (Tm, S)
        if s_pad != S:
            idx = jnp.pad(idx, ((0, 0), (0, s_pad - S)))
        first_hit = idx[:, 0:1]
        s_iota = lax.broadcasted_iota(jnp.int32, (tile_m, s_pad), dimension=1)
        idx = jnp.where(s_iota < cnt, idx, first_hit)  # CUDA tail replication
        idx = jnp.where(cnt > 0, idx, 0)
        results.append((idx, cnt))
    return results


def _bq_kernel(xyz_ref, centers_ref, *out_refs, radii2, nsamples, s_pads,
               n_valid: int, m_valid: int, tile_m: int, prefix_p: int):
    """xyz_ref: (1, 3, Np); centers_ref: (1, Tm, 3);
    out_refs: one (1, Tm, S_pad_r) per radius."""
    n_pad = xyz_ref.shape[-1]
    cx = centers_ref[0, :, 0:1]  # (Tm, 1)
    cy = centers_ref[0, :, 1:2]
    cz = centers_ref[0, :, 2:3]

    first = min(prefix_p, n_pad)
    results = _scan(xyz_ref, cx, cy, cz, first, radii2, nsamples, s_pads,
                    n_valid, tile_m)
    for (idx, _), out_ref in zip(results, out_refs):
        out_ref[0] = idx

    if first < n_pad:
        # padded center rows count as satisfied: they never force a rescan
        row = lax.broadcasted_iota(jnp.int32, (tile_m, 1), dimension=0)
        row_valid = (pl.program_id(1) * tile_m + row) < m_valid
        unfinished = jnp.zeros((tile_m, 1), jnp.bool_)
        for (_, cnt), S in zip(results, nsamples):
            unfinished = jnp.logical_or(unfinished, cnt < S)

        @pl.when(jnp.any(jnp.logical_and(unfinished, row_valid)))
        def _rescan():
            full = _scan(xyz_ref, cx, cy, cz, n_pad, radii2, nsamples,
                         s_pads, n_valid, tile_m)
            for (idx, _), out_ref in zip(full, out_refs):
                out_ref[0] = idx


# ---------------------------------------------------------------------------
# A "windowed min-extraction" variant (extraction work proportional to hits
# consumed instead of ~2*S*N lane-ops) lived here through round 3: exact and
# golden-tested, but MEASURED SLOWER than both production kernels everywhere
# (tools/bench_bq.py: body-full flat=72.8 / grouped-256=30.3 / windowed=48.6
# ms) - its sequential per-hit min+mask extraction loop (~56 dependent VPU
# passes per group) loses to the grouped kernel's data-parallel scan. Removed
# round 4 (see git ref 99dd9a5 / PLAN.md round-3 #1); the VPU prefers 2*S*N
# of independent work over 2*hits*W of serial work.

_GROUP_W = 512

# |d2_expansion - d2_diff| <= _MXU_EPS_SCALE * max_valid(|c|^2 + |p|^2):
# the rigorous f32 bound behind the expansion-form ambiguity band (see
# _bq_grouped_kernel mxu_dist). Derivation: the 3-term bf16 split of each
# f32 operand is exact to <= 2^-22 relative residue; dropping the 3 smallest
# cross products (mid*lo, lo*mid, lo*lo) loses <= ~2^-23.5 |c||p| per
# component; f32 accumulation of the 6 dot passes and the |c|^2/|p|^2 sums
# adds <= ~12u (u = 2^-24); the diff form's own error is <= ~3u * terms.
# Everything summed is < 2^-20 * A with A = max(|c|^2 + |p|^2); 2^-19 gives
# a 2x safety margin. Membership of a pair can differ between the two forms
# ONLY if |d2e - r^2| <= eps, so a group with no such pair is bitwise-exact
# without rescan.
_MXU_EPS_SCALE = 2.0 ** -19
_SENTINEL_N2 = 1e17  # |p|^2 above this = 1e9-sentinel padding, not geometry


def _bq_grouped_kernel(nvalid_ref, xyz_ref, centers_ref, *refs, radii2,
                       nsamples, s_pads, n_valid: int, m_valid: int,
                       tile_m: int, n_groups: int, w: int = _GROUP_W,
                       mxu_dist: bool = False):
    """Group-bounded scan: slot extraction only runs over the prefix of
    512-lane groups that can contain a tile's first-`nsample` hits.

    Correctness: the hit count is monotone along the lane axis, so once a
    row has accumulated min(nsample, total_hits) hits, every later lane has
    cum >= s+1 for all real slots s and contributes nothing to their
    positions - later groups can be skipped exactly. The per-row bound uses
    min(nsample, total_hits) (not nsample): rows whose hits are simply
    exhausted stop at their LAST hit instead of forcing a full scan - the
    flaw that made the old fixed-`prefix` early exit rescan ~100% of tiles.

    `nvalid_ref` (B,) scalar-prefetch carries per-batch DYNAMIC valid counts:
    callers that compact candidates pad the table to a static cap with 1e9
    sentinels, and phase 1 skips whole groups past the dynamic count (the
    posed stage's per-frame coverage is often ~30-70% of the cap, so this
    skips real distance work, exactly - sentinel points can never hit).

    xyz_ref: (1, G, 8, 512) f32, xyz on sublanes 0..2; centers_ref:
    (1, Tm, 3); refs = out_refs per radius + scratch: d2 (G, Tm, 512) f32,
    before (G, Tm, 128) int32 (per-radius exclusive group hit counts in
    lanes r*4... col r), run (Tm, 128) int32 running prefix, pos
    (Tm, s_pad_r) int32 per radius.
    """
    R = len(radii2)
    out_refs = refs[:R]
    d2_ref = refs[R]
    before_ref = refs[R + 1]
    run_ref = refs[R + 2]
    pos_refs = refs[R + 3:R + 3 + R]

    W = w
    nv = nvalid_ref[pl.program_id(0)]
    cx = centers_ref[0, :, 0:1]
    cy = centers_ref[0, :, 1:2]
    cz = centers_ref[0, :, 2:3]
    lane = lax.broadcasted_iota(jnp.int32, (tile_m, W), dimension=1)
    row = lax.broadcasted_iota(jnp.int32, (tile_m, 1), dimension=0)
    row_valid = (pl.program_id(1) * tile_m + row) < m_valid

    # ---- phase 1: distances, per-group hit totals, running prefix -------
    run_ref[...] = jnp.zeros((tile_m, 128), jnp.int32)

    if mxu_dist:
        # expansion form d2 = |c|^2 + |p|^2 - 2<c,p> with the cross terms on
        # the MXU (exact 3-term bf16 operand splits, 6 accumulating passes)
        # and a per-group ambiguity band |d2e - r^2| <= eps that falls back
        # to the exact VPU diff form - bitwise-identical outputs by the
        # _MXU_EPS_SCALE bound above (verified on chip incl. engineered
        # boundary points). MEASURED round 5 at trained weights: posed fwd
        # 258.7 f/s vs 277.1 exact - the K=8 contraction runs the MXU at
        # ~6% utilization and the band plumbing + per-group fallback
        # rescans cost more than the VPU diff form saves; kept opt-in as
        # the documented negative result of VERDICT r04 #1 (PLAN.md).
        ct = jnp.pad(centers_ref[0], ((0, 0), (0, 5)))  # (Tm, 8)
        c_hi = ct.astype(jnp.bfloat16)
        c_r1 = ct - c_hi.astype(jnp.float32)
        c_mid = c_r1.astype(jnp.bfloat16)
        c_lo = (c_r1 - c_mid.astype(jnp.float32)).astype(jnp.bfloat16)
        cn = jnp.sum(ct * ct, axis=1, keepdims=True)  # (Tm, 1)
        lane1 = lax.broadcasted_iota(jnp.int32, (1, W), dimension=1)

    def phase1(g, _):
        running = run_ref[...]  # (Tm, 128) int32, col r = radius r count
        before_ref[g] = running

        @pl.when(g * W < nv)
        def _live():
            chunk = xyz_ref[0, g]  # (8, W)
            valid = (g * W + lane) < n_valid
            if mxu_dist:
                p_hi = chunk.astype(jnp.bfloat16)
                p_r1 = chunk - p_hi.astype(jnp.float32)
                p_mid = p_r1.astype(jnp.bfloat16)
                p_lo = (p_r1 - p_mid.astype(jnp.float32)).astype(jnp.bfloat16)

                def mm(a, b):
                    return jnp.dot(a, b, preferred_element_type=jnp.float32)

                cross = (mm(c_hi, p_hi) + mm(c_hi, p_mid) + mm(c_mid, p_hi)
                         + mm(c_hi, p_lo) + mm(c_lo, p_hi)
                         + mm(c_mid, p_mid))  # (Tm, W)
                pn = jnp.sum(chunk * chunk, axis=0, keepdims=True)  # (1, W)
                d2e = (cn + pn) - 2.0 * cross
                d2_ref[g] = d2e
                # rigorous band: A excludes 1e9-sentinel lanes (their pn
                # would blow eps up by ~1e17 and make everything ambiguous;
                # their own membership can never flip - d2e ~ 1e18 >> eps)
                lane_ok = jnp.logical_and((g * W + lane1) < n_valid,
                                          pn < _SENTINEL_N2)
                A = jnp.max(cn) + jnp.max(jnp.where(lane_ok, pn, 0.0))
                eps = jnp.float32(_MXU_EPS_SCALE) * A
                band = jnp.zeros((tile_m, W), jnp.bool_)
                for r2 in radii2:
                    band = jnp.logical_or(
                        band, jnp.abs(d2e - r2) <= eps)
                # mask padded lanes AND padded center rows: a zero-padded
                # center's d2e is just |p|^2, which can sit inside the band
                # for real points at distance ~r from the origin and force
                # a spurious whole-group exact rescan (correct either way -
                # pure overhead on the opt-in MXU path)
                band = jnp.logical_and(band,
                                       jnp.logical_and(valid, row_valid))

                @pl.when(jnp.any(band))
                def _exact_fallback():
                    d2_ref[g] = ((chunk[0:1, :] - cx) ** 2
                                 + (chunk[1:2, :] - cy) ** 2
                                 + (chunk[2:3, :] - cz) ** 2)

                d2 = d2_ref[g]
            else:
                d2 = ((chunk[0:1, :] - cx) ** 2 + (chunk[1:2, :] - cy) ** 2
                      + (chunk[2:3, :] - cz) ** 2)  # (Tm, W)
                d2_ref[g] = d2
            acc = running
            for r, r2 in enumerate(radii2):
                m = jnp.logical_and(d2 < r2, valid)
                tot = jnp.sum(m.astype(jnp.int32), axis=-1, keepdims=True)
                acc += jnp.where(
                    lax.broadcasted_iota(jnp.int32, (tile_m, 128), 1) == r,
                    tot, 0)
            run_ref[...] = acc
        return 0

    lax.fori_loop(0, n_groups, phase1, 0)
    cnt_all = run_ref[...]

    # ---- per-row live-group bounds -> per-radius scalar bounds ----------
    # `lo`: leading groups in which NO valid row has any hit. Every lane
    # there has cum == 0 < s+1 for every slot, so each such group adds
    # exactly W to every slot position - accounted for by initialising the
    # position accumulators to lo*W and skipping those groups' extraction.
    # Index-ordered tables rarely have empty leading groups (hits scatter
    # across the index range, lo ~ 0); spatially-ordered tables (see
    # `ops.morton`) put each coherent center tile's hits in a narrow index
    # window, making [lo, bound) a few groups instead of a prefix of most.
    bounds = []
    lows = []
    for r, S in enumerate(nsamples):
        cnt_r = cnt_all[:, r:r + 1]
        tgt = jnp.minimum(cnt_r, S)  # (Tm, 1)

        def count_live(g, acc, r=r, tgt=tgt):
            # groups strictly before the one holding the tgt-th hit
            return acc + (before_ref[g][:, r:r + 1] < tgt).astype(jnp.int32)

        def count_empty(g, acc, r=r):
            # group g-1 is skippable iff groups [0, g) hold no hit of any
            # valid row; the indicator is non-increasing in g, so the count
            # is the length of the empty leading prefix
            pre = jnp.where(row_valid, before_ref[g][:, r:r + 1], 0)
            return acc + (jnp.max(pre) == 0).astype(jnp.int32)

        live = lax.fori_loop(1, n_groups, count_live,
                             jnp.zeros((tile_m, 1), jnp.int32))
        live = live + (tgt > 0)  # + the group containing the tgt-th hit
        live = jnp.where(row_valid, live, 0)  # padded center rows: no work
        bounds.append(jnp.max(live))
        lo = lax.fori_loop(1, n_groups, count_empty, jnp.int32(0))
        total = jnp.max(jnp.where(row_valid, cnt_all[:, r:r + 1], 0))
        lo = lo + (total == 0).astype(jnp.int32)  # final boundary
        lows.append(lo)
    p_max = bounds[0]
    p_min = lows[0]
    for b, lo in zip(bounds[1:], lows[1:]):
        p_max = jnp.maximum(p_max, b)
        p_min = jnp.minimum(p_min, lo)

    for r in range(R):
        pos_refs[r][...] = jnp.full((tile_m, s_pads[r]), lows[r] * W,
                                    jnp.int32)

    # ---- phase 2: packed local scan + slot extraction, live groups only -
    def phase2(g, _):
        @pl.when(jnp.logical_and(g >= p_min, g < p_max))
        def _live():
            d2 = d2_ref[g]
            valid = (g * W + lane) < n_valid
            # within-group counts are <= 512: three radii pack into one
            # int32 (10-bit fields) and share one 9-step scan
            packed = jnp.zeros((tile_m, W), jnp.int32)
            for r, r2 in enumerate(radii2):
                m = jnp.logical_and(d2 < r2, valid).astype(jnp.int32)
                packed = packed + (m << (10 * r))
            shift = 1
            while shift < W:
                rolled = pltpu.roll(packed, shift, axis=1)
                packed = packed + jnp.where(lane >= shift, rolled, 0)
                shift *= 2
            for r, (S, sp) in enumerate(zip(nsamples, s_pads)):
                @pl.when(jnp.logical_and(g >= lows[r], g < bounds[r]))
                def _slots(r=r, S=S, sp=sp, packed=packed):
                    local = (packed >> (10 * r)) & 0x3FF
                    cum = before_ref[g][:, r:r + 1] + local  # (Tm, W)
                    contrib = _slot_positions(cum, S)
                    if sp != S:
                        contrib = jnp.pad(contrib, ((0, 0), (0, sp - S)))
                    pos_refs[r][...] = pos_refs[r][...] + contrib
        return 0

    lax.fori_loop(0, n_groups, phase2, 0)

    # ---- finalize: CUDA tail-replication + no-hit conventions -----------
    for r, sp in enumerate(s_pads):
        idx = pos_refs[r][...]
        cnt_r = cnt_all[:, r:r + 1]
        s_iota = lax.broadcasted_iota(jnp.int32, (tile_m, sp), dimension=1)
        first_hit = idx[:, 0:1]
        idx = jnp.where(s_iota < cnt_r, idx, first_hit)
        idx = jnp.where(cnt_r > 0, idx, 0)
        out_refs[r][0] = idx


def _ball_query_multi_grouped(radii, nsamples, xyz: jax.Array,
                              new_xyz: jax.Array, tile_m: int = 256,
                              w: int = _GROUP_W,
                              n_valid_dyn: jax.Array = None,
                              mxu_dist: bool = False):
    """Large-N path of `ball_query_multi_pallas` (same results).

    `n_valid_dyn` (B,) int32, optional: per-batch-row dynamic count of real
    (non-sentinel) leading points; phase 1 skips whole lane groups past it.
    Exact as long as rows beyond it can never satisfy `d2 < r^2` (callers
    pad with 1e9 sentinels)."""
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    W = w
    n_groups = _round_up(N, W) // W
    n_pad = n_groups * W
    m_pad = _round_up(M, tile_m)
    s_pads = tuple(_round_up(s, 128) for s in nsamples)

    pts = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad - N), (0, 0)),
                  constant_values=1e9)
    # (B, G, 8, W): xyz on sublanes 0..2 (padded to 8)
    chunks = jnp.transpose(pts.reshape(B, n_groups, W, 3), (0, 1, 3, 2))
    chunks = jnp.pad(chunks, ((0, 0), (0, 0), (0, 5), (0, 0)))
    centers = new_xyz.astype(jnp.float32)
    if m_pad != M:
        centers = jnp.pad(centers, ((0, 0), (0, m_pad - M), (0, 0)))
    if n_valid_dyn is None:
        nvalid = jnp.full((B,), N, jnp.int32)
    else:
        nvalid = n_valid_dyn.reshape(B).astype(jnp.int32)

    kernel = functools.partial(
        _bq_grouped_kernel, radii2=tuple(float(r) ** 2 for r in radii),
        nsamples=tuple(int(s) for s in nsamples), s_pads=s_pads,
        n_valid=N, m_valid=M, tile_m=tile_m, n_groups=n_groups, w=W,
        mxu_dist=mxu_dist)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, m_pad // tile_m),
        in_specs=[
            pl.BlockSpec((1, n_groups, 8, W), lambda b, m, nv: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_m, 3), lambda b, m, nv: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, tile_m, sp), lambda b, m, nv: (b, m, 0),
                         memory_space=pltpu.VMEM) for sp in s_pads),
        scratch_shapes=(
            [pltpu.VMEM((n_groups, tile_m, W), jnp.float32),
             pltpu.VMEM((n_groups, tile_m, 128), jnp.int32),
             pltpu.VMEM((tile_m, 128), jnp.int32)]
            + [pltpu.VMEM((tile_m, sp), jnp.int32) for sp in s_pads]),
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, m_pad, sp), jnp.int32) for sp in s_pads),
    )(nvalid, chunks, centers)
    return tuple(o[:, :M, :s] for o, s in zip(outs, nsamples))


@functools.partial(jax.jit, static_argnums=(0, 1, 4, 5, 7))
def ball_query_multi_pallas(radii, nsamples, xyz: jax.Array,
                            new_xyz: jax.Array, prefix: int = 0,
                            grouped: bool = False,
                            n_valid_dyn: jax.Array = None,
                            mxu_dist: bool = None):
    """Several ball queries over the same (xyz, new_xyz) pair.

    radii/nsamples: tuples; returns a tuple of (B, M, nsample_i) int32.
    Shares the distance tile across radii. `prefix` > 0 enables the
    early-exit prefix scan (see module docstring); 0 = plain full scan.

    `grouped` selects the group-bounded kernel (identical results): slot
    extraction - the dominant cost, ~2 VPU passes per sample slot - runs
    only over the prefix of 512-lane groups holding each center tile's
    first-S hits. A win when center tiles are spatially coherent AND hits
    are dense (posed-stage body queries: 52 -> 34 ms at production shapes);
    a loss for scattered centers (FPS output: 26 -> 53 ms), so opt-in.

    `mxu_dist` (grouped path only; default off, or G4D_BQ_MXU=1) computes
    the phase-1 distances in MXU expansion form with an exact-fallback
    ambiguity band - bitwise-identical outputs; see _bq_grouped_kernel."""
    if mxu_dist is None:
        mxu_dist = _ENV_MXU_DIST
    if grouped and len(radii) <= 3 and xyz.shape[1] > 1024:
        return _ball_query_multi_grouped(radii, nsamples, xyz, new_xyz,
                                         n_valid_dyn=n_valid_dyn,
                                         mxu_dist=bool(mxu_dist))
    B, N, _ = xyz.shape
    M = new_xyz.shape[1]
    n_pad = _round_up(N, 128)
    # small point sets get bigger center tiles: fewer grid steps to pay the
    # fixed per-step cost on; larger sets need the VMEM for the (Tm, N) scan
    # arrays. (Measured at the posed stage's garment queries, N=1792 S=32:
    # 256-row tiles run 11% faster than 64-row ones - an early-round note
    # about 256-row spills at this size no longer reproduces. Round-5
    # re-check: a STANDALONE pe0-shape A/B ranked 128/512 ~10% ahead of
    # 256, but on the full posed forward 128 loses 1.9 f/s (275.2 vs
    # 277.1) and 512 OOMs scoped vmem at sa3's wide fused scales - the
    # standalone ranking does not transfer; 256 stays. G4D_BQ_TILE_MID
    # overrides for experiments.)
    mid = _ENV_TILE_MID
    if len(radii) == 1 and 128 < n_pad <= 2048:
        # single-radius mid-size queries (the per-iteration garment PEs)
        # carry one 128-wide output and fit 512-row tiles in scoped vmem;
        # G4D_BQ_TILE_PE overrides for experiments
        mid = _ENV_TILE_PE
    TILE_M = _ENV_TILE_BIG if n_pad > 2048 else (mid if n_pad > 128 else 512)
    m_pad = _round_up(M, TILE_M)
    s_pads = tuple(_round_up(s, 128) for s in nsamples)
    prefix_p = _round_up(prefix, 128) if prefix else n_pad

    xyz_t = jnp.transpose(xyz, (0, 2, 1)).astype(jnp.float32)
    if n_pad != N:
        xyz_t = jnp.pad(xyz_t, ((0, 0), (0, 0), (0, n_pad - N)))
    centers = new_xyz.astype(jnp.float32)
    if m_pad != M:
        centers = jnp.pad(centers, ((0, 0), (0, m_pad - M), (0, 0)))

    kernel = functools.partial(
        _bq_kernel, radii2=tuple(float(r) ** 2 for r in radii),
        nsamples=tuple(int(s) for s in nsamples), s_pads=s_pads,
        n_valid=N, m_valid=M, tile_m=TILE_M, prefix_p=prefix_p)
    outs = pl.pallas_call(
        kernel,
        grid=(B, m_pad // TILE_M),
        in_specs=[
            pl.BlockSpec((1, 3, n_pad), lambda b, m: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_M, 3), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=tuple(
            pl.BlockSpec((1, TILE_M, sp), lambda b, m: (b, m, 0),
                         memory_space=pltpu.VMEM) for sp in s_pads),
        out_shape=tuple(
            jax.ShapeDtypeStruct((B, m_pad, sp), jnp.int32) for sp in s_pads),
    )(xyz_t, centers)
    return tuple(o[:, :M, :s] for o, s in zip(outs, nsamples))


@functools.partial(jax.jit, static_argnums=(0, 1, 4))
def ball_query_pallas(radius: float, nsample: int, xyz: jax.Array,
                      new_xyz: jax.Array, prefix: int = 0) -> jax.Array:
    """xyz: (B, N, 3), new_xyz: (B, M, 3) -> (B, M, nsample) int32."""
    return ball_query_multi_pallas((radius,), (nsample,), xyz, new_xyz,
                                   prefix)[0]
