"""Unit tests for the analytic roofline accounting (sphtpu/roofline.py).

The module is bench instrumentation (VERDICT r3 weak-3: "no absolute
performance yardstick"), so the tests pin its contract: counts are
positive and additive, the v5e peak derivation is self-consistent, and
the report classifies compute- vs memory-bound correctly at the
arithmetic-intensity knee.
"""

import numpy as np

from sphtpu.roofline import (
    CLOCK_HZ,
    PEAK_HBM_BPS,
    PEAK_MXU_BF16,
    PEAK_VPU_F32,
    add_counts,
    allpairs_gravity_counts,
    block_force_counts,
    p3m_mesh_counts,
    roofline_report,
    tile_force_counts,
)


def test_peak_derivation_self_consistent():
    # MXU peak = 4 MXUs x 128x128 x 2 FLOP x clock
    assert np.isclose(PEAK_MXU_BF16, 4 * 128 * 128 * 2 * CLOCK_HZ)
    # VPU peak = 8 sublanes x 128 lanes x 4 ALUs x 2 (FMA) x clock
    assert np.isclose(PEAK_VPU_F32, 8 * 128 * 4 * 2 * CLOCK_HZ)
    assert 1.0e9 < CLOCK_HZ < 2.5e9  # a plausible TPU clock
    assert PEAK_VPU_F32 < PEAK_MXU_BF16


def test_counts_positive_and_stage_split():
    spec = (((1024, 8), (4096, 16)), 3)  # (buckets, n_oct)-shaped spec
    cnt = block_force_counts(spec, n=10_000, kh=50, gravity="p3m")
    assert cnt["flops"] > 0 and cnt["bytes"] > 0
    assert set(cnt["stages"]) == {"phase_a", "phase_b"}
    # stage flops sum to the total
    assert cnt["flops"] == sum(s["flops"] for s in cnt["stages"].values())
    assert cnt["bytes"] == sum(s["bytes"] for s in cnt["stages"].values())
    # p3m adds pair-tail work to phase B
    cnt_ex = block_force_counts(spec, n=10_000, kh=50, gravity="exact")
    assert cnt["flops"] > cnt_ex["flops"]


def test_tile_counts_scale_with_grid():
    small = tile_force_counts(8, 64, 10_000, 50)
    big = tile_force_counts(16, 64, 10_000, 50)
    # slots scale with cells = grid^3: 8x more cells -> ~8x more flops
    ratio = big["flops"] / small["flops"]
    assert 7.0 < ratio < 9.0


def test_add_counts_merges():
    a = allpairs_gravity_counts(10_000)
    b = p3m_mesh_counts(64, 10_000)
    tot = add_counts(a, b)
    assert tot["flops"] == a["flops"] + b["flops"]
    assert tot["bytes"] == a["bytes"] + b["bytes"]
    assert set(tot["stages"]) == {"gravity_allpairs", "p3m_mesh"}


def test_report_compute_vs_memory_bound():
    # high arithmetic intensity -> compute-bound, mfu_vpu = achieved/peak
    hi = {"flops": int(1e12), "bytes": int(1e9), "stages": {}}
    rep = roofline_report(hi, seconds_per_pass=1.0)
    assert rep["bound"] == "compute"
    assert np.isclose(rep["mfu_vpu"], 1e12 / PEAK_VPU_F32, rtol=1e-2)
    # low arithmetic intensity (below the knee) -> memory-bound
    lo = {"flops": int(1e9), "bytes": int(1e9), "stages": {}}
    rep = roofline_report(lo, seconds_per_pass=1.0)
    assert rep["bound"] == "memory"
    # report values are rounded to 4 decimals — compare at that grain
    assert np.isclose(rep["hbm_frac"], 1e9 / PEAK_HBM_BPS, atol=5e-5)
    # pct_roofline is achieved over ATTAINABLE (AI-limited), so the
    # memory-bound case scores against AI * HBM, not the VPU peak
    attainable = (1e9 / 1e9) * PEAK_HBM_BPS
    assert np.isclose(
        rep["pct_roofline"], 100.0 * 1e9 / attainable, atol=5e-3
    )


def test_report_mfu_bounded():
    # a pass that takes longer achieves proportionally less
    cnt = tile_force_counts(15, 128, 100_000, 50)
    fast = roofline_report(cnt, seconds_per_pass=0.1)
    slow = roofline_report(cnt, seconds_per_pass=0.4)
    assert np.isclose(fast["mfu_vpu"], 4 * slow["mfu_vpu"], rtol=5e-2)
    assert 0.0 < slow["mfu_vpu"] < 1.0
