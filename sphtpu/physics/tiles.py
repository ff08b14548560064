"""Masked cell-tile SPH engine: the gather-free TPU fast path.

Profiling on v5e showed the classic neighbor-list formulation is bound by
exactly the ops XLA/TPU hates: random gathers (~140M elem/s), scatter-adds
(same), and wide top_k merges. This engine removes all three:

*   Particles are binned into a dense mono-level grid (edge >= safety *
    2*max h, chosen by the driver from the previous step's h) and
    scattered ONCE per field into padded slot planes of shape
    (G+2, G+2, (G+2)*cap) — z, y, x*cap with a one-cell halo. Every
    subsequent access is a static/dynamic *slice*: queries are x-windows,
    candidates the 3x3 (z,y)-shifted stack of the same window — zero
    gathers in the hot loop.
*   The exact k-th neighbor distance (the reference's h = r_Kh/2,
    polytrope_hydroKDTree.jl:151) comes from a 32-step count bisection per
    query slot followed by a masked max — no top_k, no sort. Ties at the
    k-th distance are physics-neutral: that neighbor sits at q = 2 exactly,
    where W and grad W vanish.
*   The symmetric pair "scatter" of hydroCalculation
    (polytrope_hydroKDTree.jl:229-245) becomes a second masked term
    evaluated from the receiver's side: for a pair within mutual cell
    reach, q accumulates -ct_qc dW(h_q) when c is in knn(q) (forward mask
    d2 <= r_k(q)^2) and +ct_cq dW(h_c) when q is in knn(c) (reverse mask
    d2 <= r_k(c)^2). Mono-level certification (r_k <= cell edge for every
    particle) guarantees both members of every interacting pair see each
    other as candidates, so this reproduces the scatter exactly — with no
    scatter.

Exactness is certified per evaluation (slot-capacity overflow, k found,
r_k <= cell edge); the engine layer falls back to the gather engine when
certification fails, so a bad grid choice degrades speed, never physics.
Self-pairs need no special casing: at d = 0 the kernel gradient term is
identically zero and mu = 0, and the density self-term is included by the
d2 <= r_k^2 mask just as the reference's kNN list includes self.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import W
from .mesh_gravity import newton_minus_mesh


class ReducedForces(NamedTuple):
    acc: jnp.ndarray  # (N, 3) hydro acceleration
    rho: jnp.ndarray  # (N,)
    h: jnp.ndarray  # (N,)
    cs: jnp.ndarray  # (N,)
    mu_max: jnp.ndarray  # (N,)
    div_sum: jnp.ndarray  # (N,)
    visc_dk: jnp.ndarray  # (N,)


def choose_tile_params(
    pos_code,
    h,
    kh: int,
    *,
    safety: float = 1.05,
    cap_max: int = 256,
    headroom: float = 1.25,
):
    """Host-side grid sizing from the current positions and smoothing
    lengths (numpy, runs between chunks).

    Cell edge must be >= safety * 2 * max(h) for mono-level certification
    (rounded down: coarser = safe for the r_k bound) and the slot capacity
    comes from the *measured* max cell occupancy plus drift headroom.
    Returns (grid, cap) — or None when the density contrast needs more
    capacity than cap_max (caller stays on the gather engine).
    """
    import numpy as np

    pos_code = np.asarray(pos_code)
    h = np.asarray(h)
    half = float(np.abs(pos_code).max()) * (1 + 1e-6)
    grid = max(int(2.0 * half / (safety * 2.0 * float(h.max()))), 2)
    s_eff = 2.0 * half / grid
    c = np.clip((pos_code + half) // s_eff, 0, grid - 1).astype(np.int64)
    cells = (c[:, 2] * grid + c[:, 1]) * grid + c[:, 0]
    cmax = int(np.bincount(cells, minlength=grid**3).max())
    # 32-slot granularity keeps candidate widths lane-friendly
    cap = max(32, int(-(-headroom * cmax // 32)) * 32)
    if cap > cap_max:
        return None
    return grid, cap


def choose_tile_params_ml(
    pos_code,
    h,
    kh: int,
    *,
    safety: float = 1.05,
    cap_max: int = 256,
    headroom: float = 1.25,
    budget_margin: float = 1.3,
    slots_max: int = 12_000_000,
    budgets=(256, 512, 1024, 2048, 4096, 8192, 16384, 32768, 65536),
):
    """Host-side grid sizing with the outlier lane: (grid, cap, budget) or
    None.

    Scans candidate grids from the mono-level choice (budget 0, identical
    to choose_tile_params) down to cells sized for the dense bulk, routing
    the large-h tail through the exact outlier lane (physics/outliers.py),
    and picks the candidate with the lowest modeled cost

        cost ~ grid^3 * cap^2 * 27 * C_TILE  +  N * budget * C_SWEEP

    (pair work over padded tile slots — empty slots cost too — vs the
    O(B*N) outlier sweeps). Feasibility: occupancy cap <= cap_max, an available budget,
    and grid^3 * cap <= slots_max (plane + pallas-prestack memory).
    Returns None only when no candidate is feasible — the caller stays on
    the exact gather engine."""
    import numpy as np

    from .outliers import OUTLIER_CUT

    C_TILE = 70.0  # ops per slot-pair (17 bisection compares + force)
    C_SWEEP = 60.0  # ops per outlier-sweep pair (two sweeps)

    pos_code = np.asarray(pos_code)
    h = np.asarray(h)
    n = h.shape[0]
    half = float(np.abs(pos_code).max()) * (1 + 1e-6)

    g0 = max(int(2.0 * half / (safety * 2.0 * float(h.max()))), 2)
    g_hi = max(
        int(2.0 * half / (safety * 2.0 * float(np.quantile(h, 0.3)))), g0
    )
    grids = []
    g_c = g0
    while g_c <= min(g_hi, 128):
        grids.append(g_c)
        g_c = max(g_c + 1, int(g_c * 1.25))

    best = None
    for grid in grids:
        s_eff = 2.0 * half / grid
        n_out = int(np.sum(h * OUTLIER_CUT > s_eff))
        if n_out == 0:
            budget = 0
        else:
            budget = next(
                (b for b in budgets if b >= n_out * budget_margin + 64), None
            )
            if budget is None:
                continue
        c = np.clip((pos_code + half) // s_eff, 0, grid - 1).astype(np.int64)
        cells = (c[:, 2] * grid + c[:, 1]) * grid + c[:, 0]
        cmax = int(np.bincount(cells, minlength=grid**3).max())
        cap = max(32, int(-(-headroom * cmax // 32)) * 32)
        if cap > cap_max or grid**3 * cap > slots_max:
            continue
        cost = (
            grid**3 * float(cap) ** 2 * 27.0 * C_TILE
            + n * float(budget) * C_SWEEP
        )
        if best is None or cost < best[0]:
            best = (cost, grid, cap, budget)
    if best is None:
        return None
    return best[1], best[2], best[3]


def tile_params_still_ok(
    pos_code,
    h,
    grid: int,
    cap: int,
    budget: int,
    *,
    occ_slack: float = 1.1,
    budget_slack: float = 1.25,
    slots_max: int = 12_000_000,
):
    """Host-side forecast: can the ALREADY-COMPILED (grid, cap, budget)
    config still certify on the current state?

    Compiling a tile program costs minutes on the remote-AOT path, so the
    driver keeps the previous chunk's config as long as this cheap check
    passes (hysteresis) instead of re-planning — and re-compiling — every
    chunk as h drifts. The engine's per-evaluation certificate remains the
    safety net: a wrong forecast costs a fallback, never physics.

    Bulk rows (h * OUTLIER_CUT <= cell edge) automatically satisfy the
    r_k <= s certification bound; the checks are occupancy-with-slack,
    outlier count within budget-with-slack, and the slot-memory cap.
    """
    import numpy as np

    from .outliers import OUTLIER_CUT

    pos_code = np.asarray(pos_code)
    h = np.asarray(h)
    half = float(np.abs(pos_code).max()) * (1 + 1e-6)
    s_eff = 2.0 * half / grid
    n_out = int(np.sum(h * OUTLIER_CUT > s_eff))
    if n_out > budget / budget_slack:
        return False
    if grid**3 * cap > slots_max:
        return False
    c = np.clip((pos_code + half) // s_eff, 0, grid - 1).astype(np.int64)
    cells = (c[:, 2] * grid + c[:, 1]) * grid + c[:, 0]
    cmax = int(np.bincount(cells, minlength=grid**3).max())
    return cmax * occ_slack <= cap


def _bin_particles(pos, grid, cap, half):
    """Cell coords, in-cell ranks and the padded-plane slot index."""
    n = pos.shape[0]
    g = grid
    s = 2.0 * half / g
    c = jnp.clip(jnp.floor((pos + half) / s).astype(jnp.int32), 0, g - 1)
    cell = (c[:, 2] * g + c[:, 1]) * g + c[:, 0]
    order = jnp.argsort(cell)
    cell_s = cell[order]
    iota = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    newseg = jnp.concatenate(
        [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]]
    )
    seg_start = jax.lax.cummax(jnp.where(newseg, iota, 0))
    rank_s = iota - seg_start
    # back to original particle order
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_s)
    overflow = jnp.max(rank) >= cap
    # padded-plane indices (one-cell halo on every axis)
    pz = c[:, 2] + 1
    py = c[:, 1] + 1
    px = (c[:, 0] + 1) * cap + jnp.minimum(rank, cap - 1)
    return c, rank, (pz, py, px), overflow, s


@functools.partial(
    jax.jit,
    static_argnames=(
        "eos", "kh", "grid", "cap", "window", "zchunk", "ychunk",
        "mesh_factor", "sigma_cells", "pallas_a", "pallas_interpret",
        "outlier_budget",
    ),
)
def tile_sph_forces(
    pos: jnp.ndarray,
    vel: jnp.ndarray,
    m,
    K,
    h_hint: jnp.ndarray,
    *,
    eos: str,
    gamma,
    cs0,
    alpha,
    beta,
    kh: int,
    grid: int,
    cap: int = 32,
    window: int = 1,
    zchunk: int = 1,
    ychunk: int = 0,
    safety: float = 1.02,
    mesh_factor: int = 0,
    sigma_cells: float = 2.2,
    pallas_a: bool = False,
    pallas_interpret: bool = False,
    outlier_budget: int = 0,
):
    """Returns (ReducedForces, (gx, gy, gz, phi) near-gravity corrections,
    ok). ok False => result invalid, caller must use the fallback engine.

    mesh_factor == 0 (exact mode): the corrections turn a pure-Newtonian
    all-pairs sweep into the reference's softened gravity: for pairs with
    q = r/h_avg <= 2 the 27-cell pass adds (softened - Newtonian); beyond
    q = 2 the kernels agree exactly. Certification (r_k <= cell edge =>
    h <= s/2) guarantees every softened pair lies within the 27-cell block.
    The self slot contributes exactly the -(7/5) m / h self-potential term
    (softened_phi(0) = -1.4/h).

    mesh_factor > 0 (P3M mode): the corrections turn the FFT mesh force
    (physics/mesh_gravity, sigma = sigma_cells * s/mesh_factor) into the
    softened interaction: a dedicated 5^3-cell pass adds
    (softened - mesh_shape) for every pair within two cells (r <= 2s
    guaranteed covered), beyond which only the ~1e-4 Gaussian tail of the
    mesh shape differs from exact. Replaces the reference's octree far
    field (gravOctree_Single.jl:239-278) at matched-or-better measured
    force accuracy (tests/test_mesh_gravity.py vs the theta = 0.576 oracle).

    grid must be divisible by window/zchunk/ychunk (window/zchunk default
    to 1 and ychunk to grid — measured fastest, and divisibility-free)."""
    n = pos.shape[0]
    dtype = pos.dtype
    g = grid
    ychunk = ychunk or g
    if g % window or g % zchunk or g % ychunk:
        raise ValueError("grid must be divisible by window/zchunk/ychunk")
    half = jnp.max(jnp.abs(pos)) * (1.0 + 1e-6) + jnp.asarray(1e-30, dtype)
    coords, rank, (pz, py, px), overflow, s = _bin_particles(pos, g, cap, half)
    iz, iy, ix = pz - 1, py - 1, px - cap  # unpadded per-particle slots

    # two-species split (physics/outliers.py): rows whose hinted h cannot
    # certify on this grid take the exact outlier lane. The hint only
    # SELECTS the species — F-row exactness is still certified from the
    # found r_k <= s, and outlier-lane results are exact regardless, so a
    # drifting hint costs speed or triggers fallback, never correctness.
    if outlier_budget > 0:
        from .outliers import OUTLIER_CUT

        out_mask = h_hint.astype(dtype) * OUTLIER_CUT > s
        n_out = jnp.sum(out_mask)
        budget_ok = n_out <= outlier_budget
        out_rows = jnp.nonzero(
            out_mask, size=outlier_budget, fill_value=n
        )[0].astype(jnp.int32)
    else:
        out_mask = jnp.zeros((n,), bool)
        budget_ok = jnp.asarray(True)
    del h_hint, coords, safety

    gp = g + 2
    xslots = gp * cap
    plane_shape = (gp, gp, xslots)

    def to_plane(v, fill=0.0):
        return jnp.full(plane_shape, fill, dtype).at[pz, py, px].set(
            v.astype(dtype)
        )

    X = to_plane(pos[:, 0])
    Y = to_plane(pos[:, 1])
    Z = to_plane(pos[:, 2])
    VX = to_plane(vel[:, 0])
    VY = to_plane(vel[:, 1])
    VZ = to_plane(vel[:, 2])
    MASK = to_plane(jnp.ones((n,), dtype))

    nw = g // window
    nz = g // zchunk
    ny = g // ychunk
    n_tiles = nw * nz * ny
    cw = 9 * (window + 2) * cap  # candidate width per query
    qw = window * cap  # query slots per (z,y) row per window
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    def tile_slices(planes, t):
        """Slice one (zchunk, ychunk, window) tile from each padded plane
        and build (queries, 9-stacked candidates) views — pure slices, the
        only data movement in the hot loop."""
        w = t // (nz * ny)
        rem = t % (nz * ny)
        z0 = (rem // ny) * zchunk
        y0 = (rem % ny) * ychunk
        x0 = w * window * cap
        outs = []
        for p in planes:
            sub = lax.dynamic_slice(
                p, (z0, y0, x0), (zchunk + 2, ychunk + 2, (window + 2) * cap)
            )
            q = sub[1 : zchunk + 1, 1 : ychunk + 1, cap : cap + qw]
            cands = jnp.stack(
                [
                    sub[dz : dz + zchunk, dy : dy + ychunk, :]
                    for dz in range(3)
                    for dy in range(3)
                ],
                axis=2,
            ).reshape(zchunk, ychunk, cw)
            outs.append((q, cands))
        return outs

    kf = jnp.asarray(float(kh), dtype)

    def phase_a(t):
        """Bisected exact k-th distance + density for one tile."""
        (qx, cx), (qy, cy), (qz, cz), (qm, cm) = tile_slices(
            (X, Y, Z, MASK), t
        )
        dx = qx[..., None] - cx[:, :, None, :]
        dy = qy[..., None] - cy[:, :, None, :]
        dz = qz[..., None] - cz[:, :, None, :]
        d2 = dx * dx + dy * dy + dz * dz
        valid = (cm[:, :, None, :] > 0) & (qm[..., None] > 0)
        d2m = jnp.where(valid, d2, big)

        # certification requires r_k <= s, so the bisection never needs
        # to resolve anything beyond s^2 (rows with larger r_k come out
        # with nfound < kh or rk > s and are flagged)
        hi0 = jnp.full(qm.shape, 1.001, dtype) * s * s
        lo0 = jnp.zeros(qm.shape, dtype)

        # 4-ary search: 3 thresholds per pass over d2m, 17 passes reach
        # f32 ulp on [0, s^2]. (A 16-ary variant with per-element bucket
        # digits measured 15x SLOWER — the digit tensor materializes and
        # its per-bucket reductions don't fuse; keep selection as plain
        # fused compare+sum sweeps.)
        def bis(_, lohi):
            lo, hi = lohi
            span = hi - lo
            t1 = lo + 0.25 * span
            t2 = lo + 0.5 * span
            t3 = lo + 0.75 * span
            c1 = jnp.sum(d2m <= t1[..., None], axis=-1).astype(dtype)
            c2 = jnp.sum(d2m <= t2[..., None], axis=-1).astype(dtype)
            c3 = jnp.sum(d2m <= t3[..., None], axis=-1).astype(dtype)
            f1, f2, f3 = c1 >= kf, c2 >= kf, c3 >= kf
            lo2 = jnp.where(f1, lo, jnp.where(f2, t1, jnp.where(f3, t2, t3)))
            hi2 = jnp.where(f1, t1, jnp.where(f2, t2, jnp.where(f3, t3, hi)))
            return lo2, hi2

        lo, hi = lax.fori_loop(0, 17, bis, (lo0, hi0))
        inw = d2m <= hi[..., None]
        rk2 = jnp.max(jnp.where(inw, d2m, 0.0), axis=-1)
        nfound = jnp.sum(d2m <= rk2[..., None], axis=-1)
        h_t = jnp.sqrt(rk2) / 2.0
        h_safe = jnp.where(h_t > 0, h_t, 1.0)
        q_ratio = jnp.sqrt(d2) / h_safe[..., None]
        w_k = W(q_ratio, h_safe[..., None])
        rho_t = m * jnp.sum(
            jnp.where(valid & (d2m <= rk2[..., None]), w_k, 0.0), axis=-1
        )
        row_ok = (qm <= 0) | (
            (nfound >= kh) & (jnp.sqrt(rk2) <= s)
        )
        return h_t, rho_t, row_ok.astype(dtype)

    def assemble(tiles):
        # (n_tiles, zchunk, ychunk, qw) -> (g, g, g*cap) unpadded grid
        t = tiles.reshape(nw, nz, ny, zchunk, ychunk, qw)
        t = jnp.transpose(t, (1, 3, 2, 4, 0, 5))
        return t.reshape(g, g, g * cap)

    if pallas_a:
        # VMEM-resident phase A (kernels/pallas_knn.py): candidates are
        # pre-stacked per cell so d2 is computed once on-chip instead of
        # re-streamed from HBM per bisection pass
        from ..kernels.pallas_knn import phase_a_pallas

        def prestack(P):
            parts = []
            for dz in range(3):
                for dy in range(3):
                    for dxs in range(3):
                        parts.append(
                            lax.slice(
                                P,
                                (dz, dy, dxs * cap),
                                (dz + g, dy + g, (dxs + g) * cap),
                            ).reshape(g, g, g, cap)
                        )
            return jnp.stack(parts, axis=3).reshape(g * g * g, 27 * cap)

        cands = tuple(prestack(P) for P in (X, Y, Z, MASK))
        h_cells, rho_cells, ok_cells = phase_a_pallas(
            cands, s * s, m, kh=kh, cap=cap, interpret=pallas_interpret
        )
        Hg = h_cells.reshape(g, g, g * cap)
        RHOg = rho_cells.reshape(g, g, g * cap)
        OKg = ok_cells.reshape(g, g, g * cap)
    else:
        h_tiles, rho_tiles, ok_tiles = lax.map(
            phase_a, jnp.arange(n_tiles), batch_size=8
        )
        Hg = assemble(h_tiles)
        RHOg = assemble(rho_tiles)
        OKg = assemble(ok_tiles)

    if outlier_budget > 0:
        # exact kNN pass for the outlier rows, then overwrite their slots
        # so every downstream plane (h, rho, P/rho^2, cs) sees merged
        # values; outlier rows are exempt from phase-A certification
        from .outliers import outlier_knn

        out_idx, h_out, rho_out = outlier_knn(pos, out_rows, m, kh)
        izo = jnp.where(out_rows < n, iz[jnp.minimum(out_rows, n - 1)], g)
        iyo = iy[jnp.minimum(out_rows, n - 1)]
        ixo = ix[jnp.minimum(out_rows, n - 1)]
        Hg = Hg.at[izo, iyo, ixo].set(h_out.astype(dtype), mode="drop")
        RHOg = RHOg.at[izo, iyo, ixo].set(rho_out.astype(dtype), mode="drop")
        OKg = OKg.at[izo, iyo, ixo].set(1.0, mode="drop")
    rows_ok = jnp.all(OKg > 0) & budget_ok

    # derived per-slot fields (no gathers: pure elementwise on the grids)
    mask_g = jnp.zeros((g, g, g * cap), dtype).at[
        pz - 1, py - 1, px - cap
    ].set(1.0)
    rho_safe = jnp.where(mask_g > 0, RHOg, 1.0)
    if eos == "polytropic":
        KPg = jnp.zeros((g, g, g * cap), dtype).at[pz - 1, py - 1, px - cap].set(
            K.astype(dtype)
        )
        POR2g = KPg * rho_safe ** (gamma - 2.0)
        CSg = jnp.sqrt(gamma * KPg * rho_safe ** (gamma - 1.0))
    else:
        POR2g = cs0**2 / rho_safe
        CSg = jnp.full_like(rho_safe, cs0)

    def pad3(a):
        return jnp.pad(
            a.reshape(g, g, g, cap), ((1, 1), (1, 1), (1, 1), (0, 0))
        ).reshape(gp, gp, xslots)

    Hp = pad3(Hg)
    RHOp = pad3(RHOg)
    POR2p = pad3(POR2g)
    CSp = pad3(CSg)
    if outlier_budget > 0:
        OUTg = jnp.zeros((g, g, g * cap), dtype).at[iz, iy, ix].set(
            out_mask.astype(dtype)
        )
        OUTp = pad3(OUTg)
    else:
        OUTp = None

    def phase_b(t):
        """Forces + reductions for one tile: forward mask = c in knn(q),
        reverse mask = q in knn(c) — the scatter-free symmetric sum.
        With an outlier lane, outlier SOURCES are excluded from the
        reverse mask (their r_k exceeds the stencil; the outlier pass
        scatters those contributions exactly instead).

        Division diet (round 4, mirrors kernels/pallas_block_pairs.py):
        the kernels/ helpers divide by the PAIRWISE h_avg and r — ~15
        multi-cycle non-pipelined VPU divisions per pair slot that
        dominated the sweep. The body below is the same algebra written
        on inv_r = rsqrt(d2) and exactly three pairwise reciprocals
        (1/h_avg, the viscosity denominator, 1/rho_avg); the per-side
        1/h_q and 1/h_c broadcast from row/column vectors, so their
        reciprocal powers are cheap. Reassociation-only vs the helper
        forms in exact arithmetic — pinned at f64 roundoff by
        tests/test_tiles.py::test_tiles_match_gather_engine; at
        production f32 the rsqrt forms differ at roundoff and branch-
        boundary slots can flip sides (all boundaries continuous, so
        flips are physics-neutral), pinned by
        test_tiles_f32_matches_gather_f64."""
        planes = [X, Y, Z, VX, VY, VZ, MASK, Hp, RHOp, POR2p, CSp]
        if OUTp is not None:
            planes.append(OUTp)
        views = tile_slices(planes, t)
        (qx, cx), (qy, cy), (qz, cz) = views[0:3]
        (qvx, cvx), (qvy, cvy), (qvz, cvz) = views[3:6]
        (qm, cm) = views[6]
        (qh, ch), (qrho, crho), (qpor2, cpor2), (qcs, ccs) = views[7:11]

        dx = qx[..., None] - cx[:, :, None, :]
        dy = qy[..., None] - cy[:, :, None, :]
        dz = qz[..., None] - cz[:, :, None, :]
        d2 = dx * dx + dy * dy + dz * dz
        inv_r = lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
        inv_r = jnp.where(d2 > 0, inv_r, 0.0)  # self-pairs: 1/r -> 0
        r = d2 * inv_r
        valid = (cm[:, :, None, :] > 0) & (qm[..., None] > 0)
        # r_k = 2h recomputed in-tile ((2h)^2 rounds identically wherever
        # it is squared) instead of streaming a dedicated rk2 plane
        qh_e = qh[..., None]
        ch_e = ch[:, :, None, :]
        fwd = valid & (d2 <= (2.0 * qh_e) * (2.0 * qh_e))
        rev = valid & (d2 <= (2.0 * ch_e) * (2.0 * ch_e))
        if OUTp is not None:
            # outlier rows: the forward (own-kNN-list) sum is incomplete
            # in-tile (their reach exceeds the stencil) — the outlier pass
            # recomputes it exactly, so zero it here; their REVERSE term
            # (contributions scattered from in-tile F rows' lists) is
            # complete and stays. Outlier SOURCES are likewise excluded
            # from every reverse term and scattered exactly instead.
            (qo, cout) = views[11]
            fwd = fwd & (qo[..., None] <= 0)
            rev = rev & (cout[:, :, None, :] <= 0)

        h_q = jnp.where(qh > 0, qh, 1.0)[..., None]
        h_c = jnp.where(ch > 0, ch, 1.0)[:, :, None, :]
        h_avg = 0.5 * (h_q + h_c)
        inv_h = 1.0 / h_avg  # pairwise reciprocal, computed ONCE
        rho_avg = 0.5 * (qrho[..., None] + crho[:, :, None, :])
        rho_avg = jnp.where(valid, rho_avg, 1.0)
        inv_rho = 1.0 / rho_avg

        vx = qvx[..., None] - cvx[:, :, None, :]
        vy = qvy[..., None] - cvy[:, :, None, :]
        vz = qvz[..., None] - cvz[:, :, None, :]
        v_dot_r = vx * dx + vy * dy + vz * dz
        mu = jnp.minimum(
            h_avg * v_dot_r / (d2 + 0.01 * (h_avg * h_avg)), 0.0
        )
        pi_fwd = (-alpha * qcs[..., None] * mu + beta * mu * mu) * inv_rho
        pi_rev = (-alpha * ccs[:, :, None, :] * mu + beta * mu * mu) * inv_rho

        # grad_W(q)/r with per-side h: h_q/h_c broadcast from (qw, 1) /
        # (1, cw) vectors, so their reciprocal powers cost one divide per
        # ROW/COLUMN; the q<=2 branch's /r rides inv_r (0 at self-pairs,
        # where the q<=1 branch is selected anyway)
        inv_hq = 1.0 / h_q
        inv_hq2 = inv_hq * inv_hq
        ct_wq = (1.0 / jnp.pi) * inv_hq2 * inv_hq2
        q_q = r * inv_hq
        dwdr_q = jnp.where(
            q_q <= 1.0,
            ct_wq * (2.25 * r * inv_hq2 - 3.0 * inv_hq),
            jnp.where(
                q_q <= 2.0, ct_wq * (-0.75 * (2.0 - q_q) ** 2) * inv_r, 0.0
            ),
        )
        inv_hc = 1.0 / h_c
        inv_hc2 = inv_hc * inv_hc
        ct_wc = (1.0 / jnp.pi) * inv_hc2 * inv_hc2
        q_c = r * inv_hc
        dwdr_c = jnp.where(
            q_c <= 1.0,
            ct_wc * (2.25 * r * inv_hc2 - 3.0 * inv_hc),
            jnp.where(
                q_c <= 2.0, ct_wc * (-0.75 * (2.0 - q_c) ** 2) * inv_r, 0.0
            ),
        )

        if eos == "polytropic":
            psum = qpor2[..., None] + cpor2[:, :, None, :]
            ct_fwd = m * (psum + pi_fwd) / 2.0
            ct_rev = m * (psum + pi_rev) / 2.0
        else:
            ct_fwd = m * (qpor2[..., None] + pi_fwd / 2.0)
            ct_rev = m * (cpor2[:, :, None, :] + pi_rev / 2.0)

        coeff = -jnp.where(fwd, ct_fwd * dwdr_q, 0.0) - jnp.where(
            rev, ct_rev * dwdr_c, 0.0
        )
        ax = jnp.sum(coeff * dx, axis=-1)
        ay = jnp.sum(coeff * dy, axis=-1)
        az = jnp.sum(coeff * dz, axis=-1)

        v_dot_dw_q = v_dot_r * dwdr_q
        v_dot_dw_c = v_dot_r * dwdr_c
        div_t = m * jnp.sum(jnp.where(fwd, v_dot_dw_q, 0.0), axis=-1)
        mu_max_t = jnp.max(jnp.where(fwd, mu, -big), axis=-1)
        visc_t = jnp.sum(
            jnp.where(fwd, m * pi_fwd * v_dot_dw_q / 2.0, 0.0)
            + jnp.where(rev, m * pi_rev * v_dot_dw_c / 2.0, 0.0),
            axis=-1,
        )

        # near-field gravity correction, term 1: softened - Newtonian for
        # q <= 2 (identical beyond). In exact mode this is the whole
        # correction against the global pure-Newtonian sweep; in P3M mode
        # phase C below adds term 2 (Newtonian - mesh shape) so the two
        # together turn the FFT mesh into the softened interaction.
        # The softened cubic-spline kernels (kernels/gravity.py piecewise
        # forms) are inlined on inv_r/inv_h/q so every 1/h^k and 1/r ride
        # multiplies (inv_r is 0 at self-pairs, so the Newtonian terms
        # vanish there exactly as the where-guarded originals did).
        newt_g = inv_r * inv_r * inv_r
        newt_p = -inv_r
        q_g = r * inv_h
        q2_g = q_g * q_g
        q3_g = q2_g * q_g
        inv_h2 = inv_h * inv_h
        inv_q = h_avg * inv_r  # 1/q, 0 at self-pairs
        soft_g = jnp.where(
            q_g <= 1.0,
            inv_h2 * inv_h * (4.0 / 3.0 - 1.2 * q2_g + 0.5 * q3_g),
            jnp.where(
                q_g <= 2.0,
                inv_h2
                * (
                    8.0 / 3.0 * q_g
                    - 3.0 * q2_g
                    + 1.2 * q3_g
                    - q2_g * q2_g / 6.0
                    - (1.0 / 15.0) * inv_q * inv_q
                )
                * inv_r,
                newt_g,
            ),
        )
        soft_p = jnp.where(
            q_g <= 1.0,
            inv_h
            * (2.0 / 3.0 * q2_g - 0.3 * q2_g * q2_g + 0.1 * q2_g * q3_g - 1.4),
            jnp.where(
                q_g <= 2.0,
                inv_h
                * (
                    4.0 / 3.0 * q2_g
                    - q3_g
                    + 0.3 * q2_g * q2_g
                    - q2_g * q3_g / 30.0
                    - 1.6
                    + (1.0 / 15.0) * inv_q
                ),
                newt_p,
            ),
        )
        gmask = valid & (r <= 2.0 * h_avg)
        cgp = jnp.where(gmask, soft_g - newt_g, 0.0)
        cpp = jnp.where(gmask, soft_p - newt_p, 0.0)
        ggx = m * jnp.sum(cgp * dx, axis=-1)
        ggy = m * jnp.sum(cgp * dy, axis=-1)
        ggz = m * jnp.sum(cgp * dz, axis=-1)
        gphi_t = m * jnp.sum(cpp, axis=-1)
        return (ax, ay, az, div_t, mu_max_t, visc_t, ggx, ggy, ggz,
                gphi_t)

    (ax_t, ay_t, az_t, div_t, mumax_t, visc_t, ggx_t, ggy_t, ggz_t,
     gphi_t) = lax.map(phase_b, jnp.arange(n_tiles), batch_size=8)
    GXg, GYg, GZg, GPg = (
        assemble(ggx_t), assemble(ggy_t), assemble(ggz_t),
        assemble(gphi_t),
    )
    AXg, AYg, AZg = assemble(ax_t), assemble(ay_t), assemble(az_t)
    DIVg, MUg, VKg = assemble(div_t), assemble(mumax_t), assemble(visc_t)

    if mesh_factor > 0:
        # -------- phase C: P3M tail correction, term 2 (Newtonian - mesh
        # shape) over the (2W+1)^3 block, W = the tail-stencil half-width
        # in tile cells (EngineConfig.c_halfwidth: smallest W with
        # W s >= 4.4 sigma; beyond, the complement is the ~1e-4 Gaussian
        # tail). At the default mesh_factor = 10 the mesh is fine enough
        # that W = 1 and this pass reuses phase A's 3^3 slices; at
        # mesh_factor = 5 it is the round-2 5^3 geometry. The kernel is
        # radial and h-free (one exp + short Horner per pair, see
        # newton_minus_mesh), so this pass only streams position/mask
        # planes. The self slot cancels the mesh's smoothed
        # self-interaction in phi.
        sigma = (s / mesh_factor) * sigma_cells
        import math as _math

        c_hw = max(1, _math.ceil(4.4 * sigma_cells / mesh_factor - 1e-9))
        if c_hw == 1:
            planes_c = (X, Y, Z, MASK)
            slices_c = tile_slices
        else:
            gpc = g + 2 + 2 * (c_hw - 1)
            planec_shape = (gpc, gpc, gpc * cap)
            pzc, pyc, pxc = (
                pz + c_hw - 1,
                py + c_hw - 1,
                px + (c_hw - 1) * cap,
            )

            def to_planec(v, fill=0.0):
                return jnp.full(planec_shape, fill, dtype).at[
                    pzc, pyc, pxc
                ].set(v.astype(dtype))

            planes_c = tuple(
                to_planec(v)
                for v in (pos[:, 0], pos[:, 1], pos[:, 2], jnp.ones((n,), dtype))
            )
            cwc = (2 * c_hw + 1) ** 2 * (window + 2 * c_hw) * cap

            def slices_c(planes, t):
                w = t // (nz * ny)
                rem = t % (nz * ny)
                z0 = (rem // ny) * zchunk
                y0 = (rem % ny) * ychunk
                x0 = w * window * cap
                outs = []
                for p2 in planes:
                    sub = lax.dynamic_slice(
                        p2,
                        (z0, y0, x0),
                        (
                            zchunk + 2 * c_hw,
                            ychunk + 2 * c_hw,
                            (window + 2 * c_hw) * cap,
                        ),
                    )
                    q = sub[
                        c_hw : zchunk + c_hw,
                        c_hw : ychunk + c_hw,
                        c_hw * cap : c_hw * cap + qw,
                    ]
                    cands = jnp.stack(
                        [
                            sub[dz : dz + zchunk, dy : dy + ychunk, :]
                            for dz in range(2 * c_hw + 1)
                            for dy in range(2 * c_hw + 1)
                        ],
                        axis=2,
                    ).reshape(zchunk, ychunk, cwc)
                    outs.append((q, cands))
                return outs

        def phase_c(t):
            (qx, cx), (qy, cy), (qz, cz), (qm, cm) = slices_c(
                planes_c, t
            )
            dx = qx[..., None] - cx[:, :, None, :]
            dy = qy[..., None] - cy[:, :, None, :]
            dz = qz[..., None] - cz[:, :, None, :]
            d2 = dx * dx + dy * dy + dz * dz
            valid = (cm[:, :, None, :] > 0) & (qm[..., None] > 0)
            inv_r = lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
            cgp, cpp = newton_minus_mesh(d2, inv_r, sigma)
            cgp = jnp.where(valid, cgp, 0.0)
            cpp = jnp.where(valid, cpp, 0.0)
            return (
                m * jnp.sum(cgp * dx, axis=-1),
                m * jnp.sum(cgp * dy, axis=-1),
                m * jnp.sum(cgp * dz, axis=-1),
                m * jnp.sum(cpp, axis=-1),
            )

        cgx_t, cgy_t, cgz_t, cgp_t = lax.map(
            phase_c, jnp.arange(n_tiles), batch_size=8
        )
        GXg = GXg + assemble(cgx_t)
        GYg = GYg + assemble(cgy_t)
        GZg = GZg + assemble(cgz_t)
        GPg = GPg + assemble(cgp_t)

    # per-particle extraction (N small gathers per output plane)
    acc = jnp.stack([AXg[iz, iy, ix], AYg[iz, iy, ix], AZg[iz, iy, ix]], axis=1)
    rho_p = RHOg[iz, iy, ix]
    h_p = Hg[iz, iy, ix]
    cs_p = (
        CSg[iz, iy, ix] if eos == "polytropic" else jnp.full((n,), cs0, dtype)
    )
    mu_p = MUg[iz, iy, ix]
    div_p = DIVg[iz, iy, ix]
    visc_p = VKg[iz, iy, ix]
    g_p = [GXg[iz, iy, ix], GYg[iz, iy, ix], GZg[iz, iy, ix], GPg[iz, iy, ix]]

    if outlier_budget > 0:
        # exact pair forces for the outlier rows (reference scatter
        # semantics), plus the softened-gravity corrections their long
        # reach needs beyond the tile stencil
        from .outliers import outlier_forces, outlier_gravity_corr

        por2_p = (
            K.astype(dtype) * jnp.where(rho_p > 0, rho_p, 1.0) ** (gamma - 2.0)
            if eos == "polytropic"
            else cs0**2 / jnp.where(rho_p > 0, rho_p, 1.0)
        )
        row, scat = outlier_forces(
            pos, vel, out_rows, out_idx, h_p, rho_p, por2_p, cs_p, m,
            eos=eos, alpha=alpha, beta=beta,
        )
        safe = jnp.minimum(out_rows, n - 1)
        drop = jnp.where(out_rows < n, safe, n)
        # additive: outlier slots keep their in-tile reverse terms (their
        # zeroed forward terms are recomputed exactly by the outlier pass)
        acc = acc.at[drop].add(row["acc"], mode="drop")
        visc_p = visc_p.at[drop].add(row["visc_dk"], mode="drop")
        # forward-only reductions are garbage at outlier slots: replace
        mu_p = mu_p.at[drop].set(row["mu_max"], mode="drop")
        div_p = div_p.at[drop].set(row["div_sum"], mode="drop")
        acc = acc + jnp.stack([scat["ax"], scat["ay"], scat["az"]], axis=1)
        visc_p = visc_p + scat["visc"]

        dg, dphi = outlier_gravity_corr(
            pos, h_p, out_rows, out_mask, m, half, s, g
        )
        g_p[0] = g_p[0] + dg[:, 0]
        g_p[1] = g_p[1] + dg[:, 1]
        g_p[2] = g_p[2] + dg[:, 2]
        g_p[3] = g_p[3] + dphi

    out = ReducedForces(
        acc=acc,
        rho=rho_p,
        h=h_p,
        cs=cs_p,
        mu_max=mu_p,
        div_sum=div_p,
        visc_dk=visc_p,
    )
    grav_corr = tuple(g_p)
    ok = (~overflow) & rows_ok
    return out, grav_corr, ok
