"""Analytic Pallas-kernel FLOP accounting (utils/flops.py) sanity tests.

The numbers feed bench.py's honest-MFU metric (VERDICT round 2 #7); these
tests pin the algebra and the call-inventory's rough magnitude so a silent
editing mistake (dropped term, wrong unit split) shows up in CI rather than
as a quietly wrong MFU in the next BENCH record.
"""

import numpy as np

from garment4d_tpu.utils import flops as F


class TestCostAlgebra:
    def test_add_mul(self):
        c = F.Cost(mxu=2.0, vpu=3.0) + F.Cost(mxu=1.0, vpu=1.0)
        assert c.mxu == 3.0 and c.vpu == 4.0 and c.total == 7.0
        assert (2 * c).mxu == 6.0
        assert (c * 2).vpu == 8.0


class TestKernelCosts:
    def test_units_split(self):
        """Selection kernels are pure VPU; fused MLP kernels are MXU-heavy."""
        assert F.fps(6890, 1024).mxu == 0
        assert F.ball_query_flat(1024, 6890, (16, 32)).mxu == 0
        assert F.ball_query_grouped(2000, 4992, (8, 16, 32)).mxu == 0
        assert F.three_nn(6890, 1024).mxu == 0
        pe = F.fused_pe(2000, 16, 6)
        assert pe.mxu > pe.vpu  # (c*f + f*f) matmul dominates the epilogue
        gcn = F.gcn_stack(2000, 195, 128, 3, 4, 7)
        assert gcn.mxu > gcn.vpu

    def test_flat_scales_with_slots(self):
        lo = F.ball_query_flat(1024, 6890, (4,))
        hi = F.ball_query_flat(1024, 6890, (64,))
        assert hi.vpu > lo.vpu

    def test_grouped_live_frac(self):
        """Morton-tight windows shrink phase-2 work but never phase 1."""
        full = F.ball_query_grouped(2000, 6890, (8, 16, 32), live_frac=1.0)
        tight = F.ball_query_grouped(2000, 6890, (8, 16, 32), live_frac=0.2)
        assert tight.vpu < full.vpu
        assert tight.vpu > 2000 * 6890 * 12.0  # phase-1 floor


class TestPosedForwardCost:
    def test_production_magnitude(self):
        """At bench shapes the Pallas share must be finite, positive, and
        TIME-dominated by the VPU (the step is selection-bound, PLAN round
        2). Raw executed-MXU flops now exceed raw VPU lane-ops (the 6-pass
        bf16-split dots count every pass, ADVICE r3 #1), but the MXU retires
        them ~2 orders of magnitude faster - compare at the ~50x bf16-MXU /
        VPU rate ratio, conservatively 20x."""
        c = F.posed_forward_cost(8, 10, N=6890, Vg=2000)
        assert np.isfinite(c.total) and c.total > 0
        assert c.vpu * 20 > c.mxu  # VPU-bound in time
        # ballpark: hundreds of G lane-ops for 80 frames, not ones or tens
        # of T (a dropped BT factor or a doubled inventory both leave this)
        assert 1e11 < c.vpu < 2e12
        assert 1e10 < c.mxu < 4e12

    def test_scales_linearly_in_frames(self):
        c1 = F.posed_forward_cost(4, 10, N=6890, Vg=2000)
        c2 = F.posed_forward_cost(8, 10, N=6890, Vg=2000)
        # LBS knn-transfer is per-sequence; everything else per-frame
        assert 1.9 < c2.total / c1.total < 2.1
