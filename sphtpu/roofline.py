"""Analytic FLOP/byte accounting + TPU roofline for the force pass.

VERDICT r3 weak-3: the bench's only yardstick was a single-core CPU
stand-in; nothing said whether a force pass uses 40% of the chip or 2%.
This module provides the missing half: closed-form operation and HBM
traffic counts for each engine stage, evaluated against the chip's peak
numbers, so bench.py can emit `mfu`-style keys and optimization work
can see which resource actually binds.

Peaks (TPU v5e / "TPU v5 lite", one chip):

*   MXU: 197e12 bf16 FLOP/s (public). Clock derived from it: 4 MXUs x
    128x128 x 2 FLOP = 131,072 FLOP/cycle -> ~1.5 GHz.
*   VPU: 8 sublanes x 128 lanes x 4 ALUs x 2 (FMA) = 8,192 FLOP/cycle
    -> ~12.3e12 f32 FLOP/s at the derived clock. The SPH pair sweeps
    are elementwise/reduction work: the VPU number, not the MXU one,
    is their compute roof.
*   HBM: 819e9 B/s, 16 GB (public).

Counts are per single force evaluation (one density+force+gravity
pass); a KDK step runs two. They are ANALYTIC — ops the formulation
must execute, not ops XLA/Mosaic happens to emit — so mfu here is a
conservative "useful-work" utilization: transcendentals are counted as
1 op, masked lanes count (the sweep executes them), compiler-added
spills/recomputation do not.

Usage (bench.py):

    cnt = block_force_counts(spec, n, kh, gravity="exact")
    cnt = add_counts(cnt, allpairs_gravity_counts(n))
    roof = roofline_report(cnt, seconds_per_pass)
"""

from __future__ import annotations

# ---- TPU v5e peaks -------------------------------------------------------

PEAK_MXU_BF16 = 197e12  # FLOP/s, public spec
CLOCK_HZ = PEAK_MXU_BF16 / (4 * 128 * 128 * 2)  # ~1.5e9, derived
PEAK_VPU_F32 = 8 * 128 * 4 * 2 * CLOCK_HZ  # ~12.3e12 FLOP/s, derived
PEAK_HBM_BPS = 819e9  # B/s, public spec


# ---- per-stage counts ----------------------------------------------------


def _block_slots(spec) -> int:
    """Pair slots actually swept per phase: every bucket's (nb, BQ, C_b)
    tile (sentinel blocks included — the engine executes them)."""
    from .physics.blocks import BQ

    buckets = spec[0]
    return sum(cb * nb for cb, nb in buckets) * BQ


def block_force_counts(spec, n: int, kh: int, *, gravity: str = "exact",
                       n_bisect: int | None = None, dtype_bytes: int = 4):
    """One block-compact force evaluation (physics/blocks.py), split by
    stage. Per-slot op counts are hand-tallied from the kernel bodies
    (kernels/pallas_strip_knn.py::_kernel, pallas_block_pairs.py::_kernel):

    phase A: d2 (8) + n_bisect passes x (cmp + select + lane-reduce ~ 3)
             + window/max/count (5) + density sqrt/W/accumulate (24)
    phase B: SPH pair terms ~ 70 (d2, sqrt, viscosity, grad_W, 6 query
             reductions, 4 candidate reductions) + softened-gravity
             corrections ~ 55; p3m tail (newton_minus_mesh: erf-series
             + shape terms) ~ +25
    """
    from .physics.blocks import BQ, N_BISECT_HINT

    if n_bisect is None:
        n_bisect = N_BISECT_HINT
    slots = _block_slots(spec)
    nb_total = slots // BQ  # candidate-row slots (one per block x C_b)
    p3m = gravity == "p3m"

    f_a = slots * (8 + 3 * n_bisect + 5 + 24)
    f_b = slots * (70 + 55 + (25 if p3m else 0))
    # HBM per eval: candidate planes are fetched once per block (index
    # map ignores the query sub-block axis): phase A 4 f32 fields +
    # int32 index table; phase B 10 in + 8 out + index table. Query-side
    # planes (~11 in + 10 out per phase) stream once per packed row.
    by_a = nb_total * (4 + 1) * dtype_bytes + n * 15 * dtype_bytes
    by_b = nb_total * (10 + 8 + 1) * dtype_bytes + n * 21 * dtype_bytes
    return {
        "flops": f_a + f_b,
        "bytes": by_a + by_b,
        "stages": {
            "phase_a": {"flops": f_a, "bytes": by_a, "slots": slots},
            "phase_b": {"flops": f_b, "bytes": by_b, "slots": slots},
        },
    }


def tile_force_counts(grid: int, cap: int, n: int, kh: int, *,
                      gravity: str = "exact", n_bisect: int = 34,
                      dtype_bytes: int = 4):
    """One mono-tile force evaluation (physics/tiles.py): every cell
    sweeps (cap, 27*cap) pair tiles for phase A (bisected kNN) and
    phase B (pair forces + near-gravity corrections)."""
    cells = grid**3
    cw = 27 * cap
    slots = cells * cap * cw
    p3m = gravity == "p3m"
    f_a = slots * (8 + 3 * n_bisect + 5 + 24)
    f_b = slots * (70 + 55 + (25 if p3m else 0))
    # prestacked candidate planes: 4 fields phase A; phase B re-streams
    # ~10 candidate planes per cell plus query planes
    by_a = cells * cw * (4 + 1) * dtype_bytes + n * 15 * dtype_bytes
    by_b = cells * cw * (10 + 1) * dtype_bytes + n * 21 * dtype_bytes
    return {
        "flops": f_a + f_b,
        "bytes": by_a + by_b,
        "stages": {
            "phase_a": {"flops": f_a, "bytes": by_a, "slots": slots},
            "phase_b": {"flops": f_b, "bytes": by_b, "slots": slots},
        },
    }


def ctile_force_counts(classes, cap: int, n: int, kh: int, *,
                       gravity: str = "exact", n_bisect: int = 34,
                       dtype_bytes: int = 4):
    """One class-compacted tile force evaluation (physics/ctiles.py):
    each occupancy class k sweeps (n_cells_k, cap_k, 27*cap) pair tiles
    for phases A and B — the mono engine's count with the padded query
    rows removed. The 11-field prestack build/gather is the dominant
    extra HBM term."""
    cw = 27 * cap
    slots = sum(nk * ck for ck, nk in classes) * cw
    n_cells = sum(nk for _, nk in classes)
    p3m = gravity == "p3m"
    f_a = slots * (8 + 3 * n_bisect + 5 + 24)
    f_b = slots * (70 + 55 + (25 if p3m else 0))
    # prestack: 4 fields built+gathered for A, 11 for B; query planes
    by_a = n_cells * cw * (2 * 4 + 1) * dtype_bytes + n * 15 * dtype_bytes
    by_b = n_cells * cw * (2 * 11 + 1) * dtype_bytes + n * 21 * dtype_bytes
    return {
        "flops": f_a + f_b,
        "bytes": by_a + by_b,
        "stages": {
            "phase_a": {"flops": f_a, "bytes": by_a, "slots": slots},
            "phase_b": {"flops": f_b, "bytes": by_b, "slots": slots},
        },
    }


def allpairs_gravity_counts(n: int, dtype_bytes: int = 4):
    """gravity_newton_allpairs (physics/gravity.py): N^2 pairs x
    (d2 8 + rsqrt 1 + cube/scale 4 + 3 axis FMAs 6 + phi 2)."""
    f = n * n * 21
    # tiled: each (tq, n) tile streams the full candidate set once per
    # query tile; candidate planes 4 fields. Query tiles of ~512 rows.
    tq = 512
    by = (n // tq + 1) * n * 4 * dtype_bytes + n * 8 * dtype_bytes
    return {"flops": f, "bytes": by,
            "stages": {"gravity_allpairs": {"flops": f, "bytes": by}}}


def p3m_mesh_counts(g_padded: int, n: int, dtype_bytes: int = 4):
    """p3m_mesh_force (physics/mesh_gravity.py): CIC deposit (27 cells x
    ~10 ops), forward+3 inverse FFTs on the padded mesh (g_padded =
    EngineConfig.mesh_pad edge), k-space multiply, CIC gather x 4
    fields."""
    g = g_padded
    import math

    fft_one = 5.0 * g**3 * 3 * math.log2(max(g, 2))
    f = int(n * 27 * 10 + 4 * fft_one + g**3 * 8 + n * 27 * 12)
    by = int(8 * g**3 * dtype_bytes + n * 16 * dtype_bytes)
    return {"flops": f, "bytes": by,
            "stages": {"p3m_mesh": {"flops": f, "bytes": by}}}


def add_counts(*counts):
    out = {"flops": 0, "bytes": 0, "stages": {}}
    for c in counts:
        out["flops"] += c["flops"]
        out["bytes"] += c["bytes"]
        out["stages"].update(c["stages"])
    return out


def roofline_report(counts, seconds_per_pass: float):
    """Achieved rates vs the v5e roof. `mfu_vpu` is the headline: these
    sweeps are VPU work (elementwise + lane reductions), so the MXU
    peak is not their roof. pct_roofline is achieved FLOP rate over the
    arithmetic-intensity-limited attainable rate min(VPU, AI * HBM)."""
    f = counts["flops"]
    b = counts["bytes"]
    gflops = f / seconds_per_pass / 1e9
    gbs = b / seconds_per_pass / 1e9
    ai = f / max(b, 1)
    attainable = min(PEAK_VPU_F32, ai * PEAK_HBM_BPS)
    return {
        "gflop_per_pass": round(f / 1e9, 1),
        "gbyte_per_pass": round(b / 1e9, 3),
        "achieved_gflops": round(gflops, 1),
        "achieved_gbps": round(gbs, 2),
        "arithmetic_intensity": round(ai, 1),
        "mfu_vpu": round(gflops * 1e9 / PEAK_VPU_F32, 4),
        "hbm_frac": round(gbs * 1e9 / PEAK_HBM_BPS, 4),
        "pct_roofline": round(100.0 * gflops * 1e9 / attainable, 2),
        "bound": "compute" if attainable == PEAK_VPU_F32 else "memory",
    }
