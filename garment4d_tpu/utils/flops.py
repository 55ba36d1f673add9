"""Analytic FLOP accounting for the Pallas kernels.

XLA's `cost_analysis()` reports 0 flops for custom calls, so a bench MFU
computed from it alone understates chip utilization by whatever fraction of
the step runs inside Pallas (most of it, for the posed stage). This module
counts the arithmetic those kernels actually execute, split by unit:

  * mxu: matmul flops (fused PE/chain MLPs, GCN stack, knn-transfer
    contraction) - multiply-accumulate counted as 2 flops, scaled by the
    number of EXECUTED MXU passes at each call site: the feature MLPs run
    one DEFAULT-precision bf16 pass, while the geometry-critical dots use
    the explicit 3-term bf16 split (`ops/pallas/precision.py`) - 6 passes
    in the GCN stack and knn-transfer forward, 3 in the scatter-add /
    PE-backward dtable scatters (one operand exactly bf16),
  * vpu: vector lane-ops (distance scans, FPS updates, selection machinery,
    banded adjacency rolls) - each elementwise op over a (rows, lanes) tile
    counts rows*lanes.

Counts mirror the kernel implementations (`ops/pallas/*.py`) at the standard
posed-forward call inventory (`models/posed.py`, `models/canonical.py`,
`models/backbone.py`), using the cost function of the kernel each call site
actually dispatches. Data-dependent terms (grouped-kernel live fraction,
candidate-compaction cap) are evaluated at their measured operating point -
live_frac 1.0 for index-ordered tables, cap_frac 0.72 - and are documented
per function; they are estimates of executed work, not lower bounds.

Peak rates (TPU v5e): 197 TFLOP/s bf16 MXU, ~49 TFLOP/s f32 MXU, and
~0.9-3.9 TFLOP/s VPU depending on op mix; `bench.py` reports the combined
f32-MXU-relative MFU plus the MXU/VPU split so the number is interpretable.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class Cost:
    mxu: float = 0.0  # matmul flops (2 * M*N*K)
    vpu: float = 0.0  # vector lane-ops

    def __add__(self, other: "Cost") -> "Cost":
        return Cost(self.mxu + other.mxu, self.vpu + other.vpu)

    def __mul__(self, k: float) -> "Cost":
        return Cost(self.mxu * k, self.vpu * k)

    __rmul__ = __mul__

    @property
    def total(self) -> float:
        return self.mxu + self.vpu


def fps(n: int, npoint: int) -> Cost:
    """FPS kernel (`ops/pallas/fps.py`): npoint sequential steps, each a
    distance update (3 sub, 3 mul, 2 add = 8 ops) + min + argmax (~3 ops)
    over all n lanes."""
    return Cost(vpu=npoint * n * 11.0)


def ball_query_flat(m: int, n: int, nsamples) -> Cost:
    """Flat prefix-scan kernel (`_bq_kernel`): distance 8 + masks/pack ~5 +
    log2(n)*3 scan + 2 ops per slot, all over m*n lanes."""
    import math

    S = sum(int(s) for s in nsamples)
    logn = max(1, math.ceil(math.log2(max(n, 2))))
    return Cost(vpu=m * n * (13.0 + 3.0 * logn + 2.0 * S))


def ball_query_grouped(m: int, n: int, nsamples, live_frac: float = 1.0,
                       w: int = 512) -> Cost:
    """Group-bounded kernel (`_bq_grouped_kernel`): phase-1 distances +
    per-group totals (~12 ops over m*n), phase-2 packed 512-lane scan
    (log2(w)*3) + 2 ops/slot over the live-group fraction. Index-ordered
    tables keep nearly all groups live (`live_frac=1.0`, the honest default
    per the round-2 measurements); Morton-ordered tables shrink it."""
    import math

    S = sum(int(s) for s in nsamples)
    logw = math.ceil(math.log2(w))
    return Cost(vpu=m * n * 12.0
                + m * n * live_frac * (5.0 + 3.0 * logw + 2.0 * S))


def coverage(m: int, n: int) -> Cost:
    """Coverage-mask kernel: distance + compare + or-reduce over m*n."""
    return Cost(vpu=m * n * 10.0)


def fused_pe(m: int, s: int, c: int, f: int = 32) -> Cost:
    """Fused gather+PE+max (`fusedpe.py`): 2-layer MLP on (m*s, c)->(f)->(f)
    + bias/relu/max epilogue."""
    return Cost(mxu=2.0 * m * s * (c * f + f * f), vpu=m * s * f * 3.0)


def fused_chain(m: int, s: int, c_in: int, widths) -> Cost:
    """Fused gather+MLP-chain+max (eval-mode SA stages)."""
    mxu = 0.0
    c = c_in
    vpu = 0.0
    for w_ in widths:
        mxu += 2.0 * m * s * c * w_
        vpu += m * s * w_ * 2.0
        c = w_
    return Cost(mxu=mxu, vpu=vpu + m * s * c)


def three_nn(n_unknown: int, m_known: int) -> Cost:
    """three_nn kernel: distance (8) + running best-3 maintenance (~6)."""
    return Cost(vpu=n_unknown * m_known * 14.0)


def knn_transfer(vg: int, n: int, j: int = 24) -> Cost:
    """Fused K-NN weight transfer (`knn_transfer.py`): distance 8 + bit
    bisection (~31 steps x 3 ops) over vg*n, plus two masked MXU
    contractions (vg, n) @ (n, j_pad=128 effective -> count j real), each
    executed as the 6-pass bf16-split `dot_f32_presplit`. Cost is
    independent of K: the bisection step count and the masked contraction
    width are fixed."""
    return Cost(vpu=vg * n * (8.0 + 93.0), mxu=6.0 * 2.0 * 2.0 * vg * n * j)


def gcn_stack(vg: int, c_in: int, hidden: int, c_out: int, n_layers: int,
              n_diags: int) -> Cost:
    """Fused GCN stack: layer matmuls on MXU (each executed as the 6-pass
    bf16-split `dot_f32`, `gcnstack.py:89-102`) + banded adjacency applies
    (n_diags shifted multiply-adds per layer) on VPU."""
    widths = [c_in] + [hidden] * (n_layers - 1) + [c_out]
    mxu = sum(6.0 * 2.0 * vg * widths[i] * widths[i + 1]
              for i in range(n_layers))
    vpu = sum(vg * widths[i + 1] * n_diags * 2.0 for i in range(n_layers))
    return Cost(mxu=mxu, vpu=vpu)


def posed_forward_cost(B: int, T: int, N: int = 6890, Vg: int = 2000,
                       iterations: int = 3,
                       n_diags: int = 7, cap_frac: float = 0.72) -> Cost:
    """Pallas-kernel cost of one posed-stage forward at production shapes.

    Mirrors the call inventory of `PosedGarmentModel.__call__` including the
    frozen stage-1 encoder. XLA-visible work (FP/seg-head convs, attention,
    LBS einsums, smoothing matmul, sorts) is NOT counted here - add
    `cost_analysis()['flops']` for that part.
    """
    BT = B * T
    Ng = N // 4  # garment selection size (1722 at N=6890)
    c = Cost()

    # ---- stage 1 backbone (per frame); FPS-center SA queries dispatch the
    # flat kernel (`ops/pointcloud.py:ball_query_multi`, grouped=False) -----
    c += BT * fps(N, 1024)
    c += BT * ball_query_flat(1024, N, (16, 32))
    c += BT * fused_chain(1024, 16, 3, (16, 16, 32))
    c += BT * fused_chain(1024, 32, 3, (32, 32, 64))
    c += BT * fps(1024, 256)
    c += BT * ball_query_flat(256, 1024, (16, 32))
    c += BT * fused_chain(256, 16, 3 + 96, (32, 32, 64))
    c += BT * fused_chain(256, 32, 3 + 96, (64, 64, 128))
    c += BT * fps(256, 64)
    c += BT * ball_query_flat(64, 256, (32, 64))
    c += BT * fused_chain(64, 32, 3 + 192, (64, 64, 128))
    c += BT * fused_chain(64, 64, 3 + 192, (128, 128, 256))
    # FP three_nn (interpolation gathers are movement, not flops)
    c += BT * (three_nn(256, 64) + three_nn(1024, 256) + three_nn(N, 1024))

    # ---- garment encoder (per frame) --------------------------------------
    c += BT * fps(Ng, 512)
    c += BT * ball_query_flat(512, Ng, (16, 32))
    c += BT * fused_chain(512, 16, 3 + 64, (32, 32))
    c += BT * fused_chain(512, 32, 3 + 64, (64, 64))
    c += BT * fps(512, 64)
    c += BT * ball_query_flat(64, 512, (32, 64))
    c += BT * fused_chain(64, 32, 3 + 96, (128, 128))
    c += BT * fused_chain(64, 64, 3 + 96, (256, 256))

    # ---- LBS (per sequence: knn against the T-pose body) ------------------
    c += B * knn_transfer(Vg, N)

    # ---- refinement iterations (per frame) --------------------------------
    cap = int(N * cap_frac)
    body_s = (8, 16, 32)
    garment_levels = ((Ng, (32,), 3 + 64), (512, (16,), 3 + 96),
                      (64, (8,), 3 + 384))
    per_iter = Cost()
    per_iter += coverage(Vg, N)
    # body queries: grouped kernel over the candidate-compacted table
    # (`ops/pemax.py:query_group_pe_multi`, grouped=True)
    per_iter += ball_query_grouped(Vg, cap, body_s)
    for s in body_s:
        per_iter += fused_pe(Vg, s, 6)
    # garment queries: flat kernel (grouped loses at stage-1 hit densities,
    # `models/posed.py:_GroupPE.grouped` comment)
    for n_l, s_l, c_l in garment_levels:
        per_iter += ball_query_flat(Vg, n_l, s_l)
        per_iter += fused_pe(Vg, s_l[0], c_l)
    per_iter += gcn_stack(Vg, 3 + 6 * 32 + 128, 128, 3, 4, n_diags)
    c += BT * iterations * per_iter
    # iteration 0's GCN has no attention feature: remove its extra width
    # (same 6-pass convention as gcn_stack above)
    c += BT * Cost(mxu=-6.0 * 2.0 * Vg * 128 * 128)
    return c
