"""Multi-level masked cell-tile SPH engine: tile-shaped work at every h scale.

Round 2's two-species engine (physics/tiles.py + physics/outliers.py) sized
one grid for the dense bulk and routed the large-h tail through an exact
O(B*N) lane; in deep collapse B reached 2/3 N and throughput fell 17x
(VERDICT r2). This engine generalizes to L levels so EVERY h scale gets
tile-shaped (slice-only, gather-free) work:

*   L independent grids, fine -> coarse (edges s_0 < s_1 < ...). Every
    particle is binned into EVERY level's slot planes (it is a candidate
    everywhere) but is a QUERY only at its species level: the finest level
    with ROUTE_CUT * h_hint <= s_l (22% drift headroom; the in-engine
    certificate checks found r_k against the per-query guaranteed stencil
    reach, which stays exact). Rows too big for the coarsest level go to a
    streaming residual lane (exact, O(B_res*N), B_res small).
*   Within one level the hot loops are exactly the tiles.py sweeps: padded
    slot planes, 3x3-stacked candidate slices, 4-ary count bisection for
    the exact r_Kh (h = r_Kh/2, polytrope_hydroKDTree.jl:151), forward +
    reverse masked pair terms for the symmetric scatter (hydroCalculation,
    polytrope_hydroKDTree.jl:229-245).
*   Sweeps run only over ACTIVE (z, x) strip tiles, passed as traced index
    vectors with a static padded length: phase A sweeps strips containing
    species-l queries; phase B sweeps those plus strips a species-l source
    can reach (one-cell dilation). Collapse concentrates each species in a
    shell, so most strips are inactive at most levels — the active lists
    give block-sparsity with zero recompilation as the state drifts (only
    the static lengths are compile keys).
*   Coarse cells over the dense core would need huge capacities; instead a
    cell whose occupancy exceeds cap_l is OPAQUE (excess slots dropped,
    species-l rows slotted first so queries/sources are never dropped) and
    certification demands every species-l row's interaction sphere keeps
    clear of opaque cells: mindist(row, cell) > max(h_row + s_l/2, 2h_row)
    — which bounds both its kNN radius (2h) and its softened-gravity
    reach (h_row + h_partner). The planner routes rows that would graze an
    opaque cell into the residual lane preemptively; the in-engine check
    on FOUND values remains the safety net (a wrong hint costs a fallback,
    never physics — including the case where dropped true neighbors
    inflate the found r_k, since those dropped rows sit in opaque cells
    within the certified clearance).
*   Pair-type partition (each pair direction counted exactly once):
    hydro fwd at the query's species level; hydro reverse at the source's
    species level; near-field gravity corrections at max(species) of the
    pair; residual-involving pairs entirely in the residual lane (residual
    rows take their complete forces from it; their slots' partial plane
    sums are discarded at merge).
*   Far field: "exact" keeps the global pure-Newtonian all-pairs sweep;
    "p3m" keeps the FFT mesh anchored to the level-0 grid exactly as in
    tiles.py, with the 5^3 (Newtonian - mesh shape) tail pass on the
    level-0 planes over its nonempty strips (level 0 is certified
    opacity-free in p3m mode so every particle is present for the
    geometric pass).

Certification is a single collective `ok` with the same contract as
tiles.py: False => the caller must discard the result and use the gather
fallback. See tests/test_mlevel.py (parity vs the gather engine on the
committed deep-collapse fixture).
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from scipy.ndimage import binary_dilation

from ..kernels import W, grad_W_over_r, softened_gphi_over_r, softened_phi
from .mesh_gravity import newton_minus_mesh
from .tiles import ReducedForces

# snapped menus keep distinct compiled configurations rare across a run
GRID_MENU = (2, 3, 4, 5, 6, 8, 10, 13, 16, 20, 26, 32, 40, 52, 64, 80, 104, 128)
CAP_MENU = (32, 48, 64, 96, 128, 192, 256, 384, 512)
ACT_GRAN = 32  # active-strip list length granularity

# SPHTPU_MLDEBUG=1: emit a per-eval certificate breakdown (which cert
# component failed, per level) via jax.debug.print — production cost is
# zero when unset (static gate, specialized out of the trace).
# NOTE: the axon TPU backend does not support host callbacks, so this
# only works on CPU/standard-TPU backends.
_MLDEBUG = os.environ.get("SPHTPU_MLDEBUG", "") == "1"

# Species routing margin — deliberately wider than the mono tile engine's
# OUTLIER_CUT (2.0 * 1.07). h drifts up to ~10% per step (the dt ladder's
# c1 = 0.3/|div v| bound on relative density change), and the last force
# eval of an ML_SUBCHUNK=2-step sub-chunk runs against strip lists / a
# species routing planned ~1.5 steps of drift earlier — with only 7%
# headroom those rows tripped the r_k certificate on the real collapse
# state (measured: 1% of L0 rows under 7.6% margin on the committed
# fixture, nfb 2-3 per 2-step chunk). 22% routing headroom plus the
# per-query guaranteed-reach certificate (see phase_a) absorbs the drift;
# the in-engine certificate stays exact, so the margin costs slot work,
# never correctness.
ROUTE_CUT = 2.0 * 1.22
# Opacity-graze pre-routing cushions, mirroring the same drift window:
# h can grow ~1.2x and positions move ~0.25 cell before the lists are
# refreshed, so the host routes to the residual lane anything the engine
# MIGHT see grazing an opaque cell during the sub-chunk.
_GRAZE_H_FACTOR = 1.25
_GRAZE_POS_CELLS = 0.3


def _occ_margin(cap: int) -> int:
    """Occupancy drift headroom per sub-chunk: how many rows can
    plausibly cross into one cell before the traced lists are refreshed
    (measured on the collapse fixture: a handful per half-step at the
    densest cells)."""
    return max(4, cap // 16)


def _opaque_forecast(occ, cap):
    """Cells the engine might see as opaque during the sub-chunk. The
    engine recomputes occupancy from the CURRENT positions every eval, so
    a cell sitting at the cap boundary flips opaque when a few rows drift
    in — measured on the collapse fixture: 2 cells flipped per half-step,
    and 100% of the hard-regime cert failures were grazes against such
    NEWLY-opaque cells (the distance/h cushions alone cannot see them).
    The forecast therefore treats nearly-full cells as opaque when
    graze-routing; the in-engine certificate stays exact."""
    return occ > cap - _occ_margin(cap)


def _strip_req_host(occ3, cap, g, *, forecast, window=3):
    """(g*g,) per-strip sweep-capacity requirement: the max, over the
    strip's window x window (z, x) neighborhood at every y, of per-cell
    occupancy — the smallest bucket capacity whose slot slices lose no
    candidate a sweep at this strip can reach. Opaque cells are excluded
    (the graze certificates keep every certified query clear of their
    contents). window=3 for the 3^3 hydro stencil; 2*c_halfwidth+1 for
    the P3M tail pass.

    forecast=True upper-bounds the engine's exact check over one
    sub-chunk of drift: non-opaque cells get the occupancy margin, and
    boundary cells (within the margin of the cap, which may flip either
    way) pin to the full level cap."""
    m = _occ_margin(cap)
    if forecast:
        eff = np.where(occ3 > cap + m, 0, np.minimum(occ3 + m, cap))
    else:
        eff = np.where(occ3 > cap, 0, occ3)
    col = eff.max(axis=1)  # (z, x): max over all y
    w = window // 2
    colp = np.pad(col, w)
    req = np.zeros_like(col)
    for dz in range(window):
        for dx in range(window):
            req = np.maximum(req, colp[dz : dz + g, dx : dx + g])
    return req.reshape(-1)


def _bucketize(ids, req, bucket_caps):
    """Partition strip ids into len(bucket_caps) lists: each strip goes
    to the smallest bucket whose capacity covers its requirement.
    bucket_caps is ascending and ends at the level cap (req <= cap by
    construction, so every strip lands somewhere)."""
    out = []
    lo = -1
    for cb in bucket_caps:
        r = req[ids]
        out.append(ids[(r > lo) & (r <= cb)])
        lo = cb
    return out


class MLArgs(NamedTuple):
    """Per-chunk traced arguments. Lengths/shapes are static (part of the
    compile key via MLSpec + N); contents are traced and refresh every
    chunk without recompiling.

    species is the host's ROUTING decision (finest admissible level per
    row, with opaque-cell grazers demoted to the residual lane). It is a
    hint, never a correctness input: every species-l row is certified
    in-engine on FOUND values (r_k <= s_l, opacity clearance), and the
    residual lane is exact regardless of membership."""

    act_a: tuple  # per level: per bucket: (na_b,) int32, sentinel-padded
    act_b: tuple  # per level: per bucket: (nb_b,) int32
    act_c: tuple | None  # per bucket: (nc_b,) int32 mesh-level strips (p3m)
    species: jnp.ndarray = None  # (N,) int32 in [0, L]; L = residual


# MLSpec is carried inside EngineConfig as a plain nested tuple (hashable):
#   ( ((grid, cap, buckets), ...per level...),
#     res_budget, mesh_level, c_buckets )
# buckets = ((cap_b, na_b, nb_b), ...) ascending, ending at cap: per-strip
# capacity classes — a strip whose reachable stencil cells fit cap_b slots
# sweeps (cap_b)^2 pair slots instead of cap^2 (the level cap only shapes
# the slot planes and the scatter targets).
# mesh_level = -1 for exact gravity; c_buckets = () then. In p3m mode
# c_buckets = ((cap_b, nc_b), ...) buckets the tail pass the same way
# (requirement window = the (2 c_halfwidth + 1)^2 tail stencil).


def _snap_up(menu, v):
    for m in menu:
        if m >= v:
            return m
    return menu[-1]


def _ceil_to(x: int, m: int) -> int:
    return -(-max(x, 1) // m) * m


def _species_of(h, s_edges, cut=ROUTE_CUT):
    """Finest level l with cut*h <= s_l; len(s_edges) = residual."""
    sp = np.full(h.shape[0], len(s_edges), np.int32)
    for l in range(len(s_edges) - 1, -1, -1):
        sp[cut * h <= s_edges[l]] = l
    return sp


def _host_layout(pos, h, levels, half, cache=None):
    """Shared host-side geometry: species, per-level cells/occupancy.
    cache (optional dict keyed by grid) amortizes the binning across the
    planner's many candidate evaluations."""
    s_edges = [2.0 * half / g for g, _ in levels]
    sp = _species_of(h, s_edges)
    cells = []
    occ = []
    for (g, _), s in zip(levels, s_edges):
        hit = cache.get(g) if cache is not None else None
        if hit is None:
            c = np.clip((pos + half) // s, 0, g - 1).astype(np.int64)
            o = np.bincount(
                (c[:, 2] * g + c[:, 1]) * g + c[:, 0], minlength=g**3
            ).reshape(g, g, g)
            if cache is not None:
                cache[g] = (c, o)
        else:
            c, o = hit
        cells.append(c)
        occ.append(o)
    return s_edges, sp, cells, occ


def _graze_rcut(h_rows, s):
    """Host forecast of the engine's opacity-clearance radius over one
    sub-chunk of drift: the engine requires dmin > max(h + s/2, 2h) on
    FOUND h; h may grow _GRAZE_H_FACTOR x and the row may move
    _GRAZE_POS_CELLS cells toward the opaque cell before the lists are
    refreshed."""
    hf = _GRAZE_H_FACTOR * h_rows
    return np.maximum(hf + 0.5 * s, 2.0 * hf) + _GRAZE_POS_CELLS * s


def _graze(pos, half, rows, rcut, cell, opaque3, s, g):
    """rows (indices into pos) whose ball of radius rcut touches an opaque
    stencil cell. Host numpy; pos in centered coords, cells in [0,g)."""
    if rows.size == 0 or not opaque3.any():
        return np.zeros(rows.shape[0], bool)
    p = pos[rows] + half  # box coords
    cc = cell[rows]
    graze = np.zeros(rows.shape[0], bool)
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                zz = cc[:, 2] + dz
                yy = cc[:, 1] + dy
                xx = cc[:, 0] + dx
                inb = (
                    (zz >= 0) & (zz < g) & (yy >= 0) & (yy < g)
                    & (xx >= 0) & (xx < g)
                )
                op = np.zeros(rows.shape[0], bool)
                op[inb] = opaque3[zz[inb], yy[inb], xx[inb]]
                box_lo = np.stack([xx, yy, zz], 1).astype(p.dtype) * s
                d = np.maximum(np.maximum(box_lo - p, p - (box_lo + s)), 0.0)
                dmin = np.sqrt((d * d).sum(1))
                graze |= op & (dmin <= rcut)
    return graze


def _strip_sets(cells, sp_mask, g):
    """(active-A, active-B, active-C) strip ids for one level.

    The lists are traced chunk constants while the state DRIFTS under
    them: per-step motion is CFL-bounded by 0.3 h <= 0.15 s, so over a
    short chunk a row near a strip boundary can cross into a neighboring
    (z, x) strip. Each list is therefore DILATED one cell beyond its
    minimal set — A: strips holding species-l rows +1 (phase-A coverage
    of drifted queries); B: +1 beyond A (reverse receivers one cell from
    any drifted query); C: nonempty strips +1 (every particle must stay
    covered by the mesh-tail pass). The in-engine coverage certificates
    compare the CURRENT need against these provisions, so a drift that
    outruns the dilation still fails safe (fallback, never physics)."""
    a2d = np.zeros((g, g), bool)
    src = cells[sp_mask]
    a2d[src[:, 2], src[:, 0]] = True
    nonempty = np.zeros((g, g), bool)
    nonempty[cells[:, 2], cells[:, 0]] = True
    k3 = np.ones((3, 3), bool)
    a_dil = binary_dilation(a2d, k3)
    b2d = binary_dilation(a_dil, k3)
    ne_dil = binary_dilation(nonempty, k3)
    act_a = np.flatnonzero(a_dil.reshape(-1)).astype(np.int32)
    act_b = np.flatnonzero(b2d.reshape(-1)).astype(np.int32)
    return act_a, act_b, np.flatnonzero(ne_dil.reshape(-1)).astype(np.int32)


def _pad_act(ids, n_pad, n_tiles):
    """Pad an active list with the out-of-range sentinel `n_tiles` (= g*g).
    Sentinel strips compute a clamped-garbage tile whose outputs scatter
    out of bounds and drop — so padding is harmless on one device AND
    never double-counts when the list is sharded across devices (a
    repeated real id would be computed — and set/psum-merged — twice)."""
    out = np.full(n_pad, n_tiles, np.int32)
    if ids.size:
        out[: ids.size] = ids[:n_pad]
    return out


def _lcm(a: int, b: int) -> int:
    import math

    return a * b // math.gcd(a, b)


# ---------------------------------------------------------------------------
# Host planner
# ---------------------------------------------------------------------------

# cost-model constants (ops per candidate slot scanned / per residual pair),
# calibrated against measured v5e pass times (BASELINE.md)
_OPS_A = 117.0
_OPS_B = 70.0
_OPS_C = 12.0
_OPS_RES = 390.0
_RATE = 7.0e11  # effective ops/s, only ratios matter


def plan_mlevel(
    pos_code,
    h,
    kh: int,
    *,
    gravity: str = "exact",
    max_levels: int = 4,
    cap_max: int = 512,
    res_budget_max: int = 16384,
    headroom: float = 1.25,
    act_slack: float = 1.3,
    slots_max: int = 12_000_000,
    mesh_factor: int = 5,
    sigma_cells: float = 2.2,
    shards: int = 1,
):
    """Choose a multi-level spec for the current state.

    mesh_factor/sigma_cells MUST match the EngineConfig the spec is run
    with (both sides derive the tail-stencil half-width from them).

    Returns (spec_tuple, MLArgs-as-numpy dict) or None when no feasible
    multi-level configuration exists (caller keeps mono-level/gather).
    spec_tuple = (levels, res_budget, mesh_level, c_buckets) with
    levels = ((grid, cap, ((cap_b, na_b, nb_b), ...)), ...) — per-strip
    capacity buckets, smallest feasible class per strip.

    shards > 1 sizes every active list and the residual budget to a
    multiple of `shards`, so the sharded engine (sphtpu.shard.mlevel) can
    split them evenly across devices.
    """
    pos_code = np.asarray(pos_code)
    h = np.asarray(h)
    n = h.shape[0]
    half = float(np.abs(pos_code).max()) * (1 + 1e-6)

    # fine grid from the dense bulk (30th h-quantile), snapped; coarser
    # levels roughly 2x apart. Candidates: every ladder PREFIX (the
    # residual lane absorbs whatever the coarsest kept level misses) x a
    # generous and a tight capacity strategy (tight caps make more cells
    # opaque and graze-route more rows to the residual lane; the cost
    # model arbitrates).
    g_fine = max(int(2.0 * half / (ROUTE_CUT * float(np.quantile(h, 0.3)))), 2)
    h_max = float(h.max())

    # candidate ladders: from each starting grid, descend the snapped
    # menu by 2 slots (ratio ~1.6 — tighter level spacing shrinks coarse
    # caps) or 3 slots (ratio ~2); every PREFIX of every ladder is a
    # candidate and the cost model arbitrates. layout_cache amortizes the
    # per-grid host binning across all of them.
    menu_idx = {g: i for i, g in enumerate(GRID_MENU)}

    def build_ladder(g0, step):
        lad = [g0]
        while (
            2.0 * half / lad[-1] < ROUTE_CUT * h_max
            and len(lad) < max_levels
            and lad[-1] > 2
        ):
            i = menu_idx.get(lad[-1])
            nxt = (
                GRID_MENU[max(i - step, 0)]
                if i is not None
                else max(lad[-1] // 2, 2)
            )
            if nxt >= lad[-1]:
                if lad[-1] // 2 < 2:
                    break
                nxt = lad[-1] // 2
            lad.append(nxt)
        return tuple(lad)

    prefixes = set()
    for g0 in {
        _snap_up(GRID_MENU, max(g_fine // 2, 2)),
        _snap_up(GRID_MENU, max(int(g_fine / 1.4), 2)),
        _snap_up(GRID_MENU, g_fine),
    }:
        for step in (2, 3):
            lad = build_ladder(g0, step)
            for n_keep in range(1, len(lad) + 1):
                prefixes.add(lad[:n_keep])

    best = None
    layout_cache = {}
    for lad in sorted(prefixes):
        for cap_q in (0.985, 0.9):
            cand = _plan_for_grids(
                pos_code, h, kh, list(lad), half,
                gravity=gravity, cap_max=cap_max,
                res_budget_max=res_budget_max, headroom=headroom,
                act_slack=act_slack, slots_max=slots_max,
                mesh_factor=mesh_factor, sigma_cells=sigma_cells,
                cap_quantile=cap_q,
                layout_cache=layout_cache, shards=shards,
            )
            if cand is not None and (best is None or cand[0] < best[0]):
                best = cand
    if best is None:
        return None
    return best[1], best[2]


def _plan_for_grids(
    pos_code, h, kh, grids, half, *,
    gravity, cap_max, res_budget_max, headroom, act_slack, slots_max,
    mesh_factor, sigma_cells=2.2, cap_quantile=0.985, layout_cache=None,
    shards=1,
):
    gran = _lcm(ACT_GRAN, shards)
    res_gran = _lcm(256, shards)
    n = h.shape[0]
    levels0 = [(g, 0) for g in grids]
    s_edges, sp, cells, occ = _host_layout(
        pos_code, h, levels0, half, cache=layout_cache
    )

    caps = []
    for l, g in enumerate(grids):
        rows_l = sp == l
        if rows_l.any():
            # capacity covering the cells species-l rows interact with
            # (their own stencil occupancy, tail-quantile with headroom);
            # denser cells go opaque and graze-routing handles the rest
            c = cells[l]
            sid = (c[:, 2] * g + c[:, 1]) * g + c[:, 0]
            occ_flat = occ[l].reshape(-1)
            # occupancy of cells within the 27-stencil of species-l rows
            stencil_occ = []
            cc = c[rows_l]
            if cc.shape[0] > 20000:  # quantile is statistical: subsample
                cc = cc[:: cc.shape[0] // 20000 + 1]
            for dz in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        zz = np.clip(cc[:, 2] + dz, 0, g - 1)
                        yy = np.clip(cc[:, 1] + dy, 0, g - 1)
                        xx = np.clip(cc[:, 0] + dx, 0, g - 1)
                        stencil_occ.append(occ[l][zz, yy, xx])
            so = np.concatenate(stencil_occ)
            need = float(np.quantile(so, cap_quantile)) * headroom
        else:
            need = 32
        if l == 0 and gravity == "p3m":
            # phase C (geometric mesh-tail pass) runs on level 0 and
            # needs every particle present: no opaque cells allowed —
            # with occupancy-drift headroom (a max-occupancy cell must
            # not flip opaque mid-chunk; see _opaque_forecast)
            mx = int(occ[0].max())
            need = float(mx + max(4, mx // 16))
        cap = _snap_up(CAP_MENU, int(need))
        if cap > cap_max:
            if l == 0 and gravity == "p3m":
                return None
            cap = cap_max
        caps.append(cap)

    # route grazing rows to the residual lane; iterate once (routing can
    # only shrink the species sets)
    res = sp == len(grids)
    for l, (g, cap) in enumerate(zip(grids, caps)):
        opaque3 = _opaque_forecast(occ[l], cap)
        rows = np.flatnonzero(sp == l)
        rcut = _graze_rcut(h[rows], s_edges[l])
        gz = _graze(pos_code, half, rows, rcut, cells[l], opaque3, s_edges[l], g)
        res[rows[gz]] = True
        sp[rows[gz]] = len(grids)

    n_res = int(res.sum())
    if n_res > res_budget_max:
        return None
    res_budget = _ceil_to(int(n_res * 1.5 + 64), res_gran) if n_res else 0

    # species-l rows must fit their own cells' capacity (they have slot
    # priority, but > cap own-species rows in one cell cannot certify)
    for l, (g, cap) in enumerate(zip(grids, caps)):
        rows_l = sp == l
        if not rows_l.any():
            continue
        c = cells[l][rows_l]
        cnt = np.bincount(
            (c[:, 2] * g + c[:, 1]) * g + c[:, 0], minlength=g**3
        ).max()
        if cnt > cap:
            return None

    levels = []
    acts_a, acts_b, nonempties, reqs = [], [], [], []
    cost = 0.0
    for l, (g, cap) in enumerate(zip(grids, caps)):
        if g**3 * cap > slots_max:
            return None
        act_a, act_b, nonempty = _strip_sets(cells[l], sp == l, g)
        req = _strip_req_host(occ[l], cap, g, forecast=True)

        def list_len(count):
            return max(
                min(
                    _ceil_to(int(count * act_slack), gran),
                    _ceil_to(g * g, gran),
                ),
                gran,
            )

        # per-strip capacity buckets: a strip whose stencil occupancy
        # fits a smaller capacity sweeps (cap_b)^2 pair slots instead of
        # cap^2 — measured 3x fewer pair slots on the collapse fixture.
        # Try single-bucket and every (small, cap) split; cost arbitrates.
        best = None
        for opt in [(cap,)] + [
            (cb, cap) for cb in CAP_MENU if cb < cap
        ]:
            bks = []
            c_cost = 0.0
            a_parts = _bucketize(act_a, req, opt)
            b_parts = _bucketize(act_b, req, opt)
            for cb, ap, bp in zip(opt, a_parts, b_parts):
                na_b = list_len(ap.size)
                nb_b = list_len(bp.size)
                bks.append((cb, na_b, nb_b))
                c_cost += na_b * g * cb * 27 * cb * _OPS_A
                c_cost += nb_b * g * cb * 27 * cb * _OPS_B
            if best is None or c_cost < best[0]:
                best = (c_cost, tuple(bks))
        levels.append((g, cap, best[1]))
        acts_a.append(act_a)
        acts_b.append(act_b)
        nonempties.append(nonempty)
        reqs.append(req)
        cost += best[0]
    cost += float(n_res) * n * _OPS_RES

    mesh_level = -1
    c_buckets = ()
    reqc = None
    if gravity == "p3m":
        # the mesh anchors to level 0 (as in tiles.py): sigma is tied to
        # the fine cell edge and the geometric tail pass needs every
        # particle present, which only level 0 (opacity-free) guarantees
        mesh_level = 0
        gml, capml = levels[0][0], levels[0][1]
        c_hw = _c_halfwidth(mesh_factor, sigma_cells)
        c_depth = 2 * c_hw + 1
        reqc = _strip_req_host(
            occ[0], capml, gml, forecast=True, window=c_depth
        )
        ne = nonempties[0]

        def c_list_len(count):
            return max(
                min(
                    _ceil_to(int(count * act_slack), gran),
                    _ceil_to(gml * gml, gran),
                ),
                gran,
            )

        best_c = None
        for opt in [(capml,)] + [
            (cb, capml) for cb in CAP_MENU if cb < capml
        ]:
            bks = []
            c_cost = 0.0
            for cb, cp in zip(opt, _bucketize(ne, reqc, opt)):
                nc_b = c_list_len(cp.size)
                bks.append((cb, nc_b))
                c_cost += nc_b * gml * cb * c_depth**3 * cb * _OPS_C
            if best_c is None or c_cost < best_c[0]:
                best_c = (c_cost, tuple(bks))
        c_buckets = best_c[1]
        cost += best_c[0]

    spec = (tuple(levels), res_budget, mesh_level, c_buckets)
    args = _args_for_spec(spec, acts_a, acts_b, nonempties, sp, reqs, reqc)
    if args is None:
        return None
    return cost, spec, args


def _c_halfwidth(mesh_factor, sigma_cells=2.2):
    """Tail-stencil half-width in tile cells (must mirror
    EngineConfig.c_halfwidth): smallest w with w tile cells >= 4.4 sigma."""
    import math

    return max(1, math.ceil(4.4 * sigma_cells / mesh_factor - 1e-9))


def _args_for_spec(spec, acts_a, acts_b, nonempties, species, reqs, reqc):
    levels, res_budget, mesh_level, c_buckets = spec
    pa, pb = [], []
    for (g, cap, buckets), aa, ab, req in zip(levels, acts_a, acts_b, reqs):
        bucket_caps = [bk[0] for bk in buckets]
        a_parts = _bucketize(aa, req, bucket_caps)
        b_parts = _bucketize(ab, req, bucket_caps)
        la, lb = [], []
        for (cb, na_b, nb_b), ap, bp in zip(buckets, a_parts, b_parts):
            if ap.size > na_b or bp.size > nb_b:
                return None
            la.append(_pad_act(ap, na_b, g * g))
            lb.append(_pad_act(bp, nb_b, g * g))
        pa.append(tuple(la))
        pb.append(tuple(lb))
    ac = None
    if mesh_level >= 0:
        ne = nonempties[mesh_level]
        gml = levels[mesh_level][0]
        c_parts = _bucketize(ne, reqc, [bk[0] for bk in c_buckets])
        lc = []
        for (cb, nc_b), cp in zip(c_buckets, c_parts):
            if cp.size > nc_b:
                return None
            lc.append(_pad_act(cp, nc_b, gml * gml))
        ac = tuple(lc)
    return MLArgs(
        act_a=tuple(pa), act_b=tuple(pb), act_c=ac,
        species=species.astype(np.int32),
    )


def mlevel_args_still_ok(pos_code, h, spec, *, mesh_factor=5,
                         sigma_cells=2.2):
    """Hysteresis: refresh MLArgs for an ALREADY-COMPILED spec from the
    current state, or None when the spec cannot certify anymore (species
    overflow a cap / an active list / the residual budget). Cheap host
    forecast; the in-engine certificate remains the safety net.
    mesh_factor/sigma_cells must match the EngineConfig (they set the
    tail-stencil window); a mismatch is caught by the in-engine cert."""
    pos_code = np.asarray(pos_code)
    h = np.asarray(h)
    levels, res_budget, mesh_level, c_buckets = spec
    half = float(np.abs(pos_code).max()) * (1 + 1e-6)
    grids = [lv[0] for lv in levels]
    caps = [lv[1] for lv in levels]
    s_edges, sp, cells, occ = _host_layout(
        pos_code, h, [(g, 0) for g in grids], half
    )
    res = sp == len(grids)
    for l, (g, cap) in enumerate(zip(grids, caps)):
        opaque3 = _opaque_forecast(occ[l], cap)
        rows = np.flatnonzero(sp == l)
        rcut = _graze_rcut(h[rows], s_edges[l])
        gz = _graze(pos_code, half, rows, rcut, cells[l], opaque3, s_edges[l], g)
        res[rows[gz]] = True
        sp[rows[gz]] = len(grids)
    if int(res.sum()) > res_budget:
        return None
    if mesh_level == 0 and _opaque_forecast(occ[0], caps[0]).any():
        # p3m phase C needs level 0 opaque-free; a max-occupancy cell
        # within drift headroom of the cap could flip opaque mid-chunk
        return None
    acts_a, acts_b, nonempties, reqs = [], [], [], []
    for l, (g, cap) in enumerate(zip(grids, caps)):
        rows_l = sp == l
        if rows_l.any():
            c = cells[l][rows_l]
            cnt = np.bincount(
                (c[:, 2] * g + c[:, 1]) * g + c[:, 0], minlength=g**3
            ).max()
            if cnt > cap:
                return None
        aa, ab, ne = _strip_sets(cells[l], rows_l, g)
        acts_a.append(aa)
        acts_b.append(ab)
        nonempties.append(ne)
        reqs.append(_strip_req_host(occ[l], cap, g, forecast=True))
    reqc = None
    if mesh_level >= 0:
        c_depth = 2 * _c_halfwidth(mesh_factor, sigma_cells) + 1
        reqc = _strip_req_host(
            occ[mesh_level], caps[mesh_level], grids[mesh_level],
            forecast=True, window=c_depth,
        )
    return _args_for_spec(spec, acts_a, acts_b, nonempties, sp, reqs, reqc)


# ---------------------------------------------------------------------------
# Device-side force evaluation
# ---------------------------------------------------------------------------


def _scatter_strips(vals, act, g, cap, init, dtype):
    """Scatter lax.map-stacked strip outputs (na, 1, g, cap) into a
    (g, g, g*cap) grid. Duplicate ids in act rewrite identical values."""
    z = act // g
    x = act % g
    iy = jnp.arange(g)
    ic = jnp.arange(cap)
    grid = jnp.full((g, g, g * cap), init, dtype)
    return grid.at[
        z[:, None, None],
        iy[None, :, None],
        x[:, None, None] * cap + ic[None, None, :],
    ].set(vals[:, 0])


def _strip_views(planes, t, g, cap, depth):
    """(query, stacked-candidates) views of one (z, x) strip tile.
    depth=3: planes padded +1 cell each side; depth=5: +2 cells."""
    d2o = depth // 2
    z = (t // g).astype(jnp.int32)
    x0 = ((t % g) * cap).astype(jnp.int32)
    zero = jnp.int32(0)
    outs = []
    for p in planes:
        sub = lax.dynamic_slice(
            p, (z, zero, x0), (depth, g + 2 * d2o, depth * cap)
        )
        q = sub[d2o : d2o + 1, d2o : d2o + g, d2o * cap : (d2o + 1) * cap]
        cands = jnp.stack(
            [
                sub[dz : dz + 1, dy : dy + g, :]
                for dz in range(depth)
                for dy in range(depth)
            ],
            axis=2,
        ).reshape(1, g, depth * depth * depth * cap)
        outs.append((q, cands))
    return outs


def _scatter_strips_into(grid, vals, act, g, cap, cap_b):
    """Scatter lax.map-stacked bucket outputs (na_b, 1, g, cap_b) into a
    (g, g, g*cap) level grid (first cap_b slots of each cell). Sentinel
    ids (g*g) scatter out of bounds and drop; buckets partition the
    strips, so sequential bucket scatters never collide."""
    z = act // g
    x = act % g
    iy = jnp.arange(g)
    ic = jnp.arange(cap_b)
    return grid.at[
        z[:, None, None],
        iy[None, :, None],
        x[:, None, None] * cap + ic[None, None, :],
    ].set(vals[:, 0])


def _cap_view(P, g, cap, cap_b, pad=1):
    """Slot-sliced plane view: the first cap_b slots of every cell.
    Valid for a bucket's strips by the bucket-capacity certificate
    (their reachable cells fit cap_b slots). pad: plane ghost-cell width
    (1 for the hydro planes, c_halfwidth for the P3M tail planes)."""
    if cap_b == cap:
        return P
    gp = g + 2 * pad
    return P.reshape(gp, gp, gp, cap)[..., :cap_b].reshape(
        gp, gp, gp * cap_b
    )


def _bisect_rk(d2m, kf, hi0, lo0, passes, dtype):
    """4-ary count bisection for the k-th smallest masked distance
    (identical scheme to physics/tiles.py phase A)."""

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

    lo, hi = lax.fori_loop(0, passes, bis, (lo0, hi0))
    inw = d2m <= hi[..., None]
    rk2 = jnp.max(jnp.where(inw, d2m, 0.0), axis=-1)
    nfound = jnp.sum(d2m <= rk2[..., None], axis=-1)
    return rk2, nfound


@functools.partial(
    jax.jit,
    static_argnames=(
        "eos", "kh", "spec", "mesh_factor", "sigma_cells", "axis",
        "n_shards", "pallas_a", "pallas_interpret",
    ),
)
def mlevel_sph_forces(
    pos,
    vel,
    m,
    K,
    h_hint,
    mlargs: MLArgs,
    *,
    eos: str,
    gamma,
    cs0,
    alpha,
    beta,
    kh: int,
    spec: tuple,
    mesh_factor: int = 5,
    sigma_cells: float = 2.2,
    axis: str = None,
    n_shards: int = 1,
    pallas_a: bool = False,
    pallas_interpret: bool = False,
):
    """Multi-level force evaluation. Same contract as tile_sph_forces:
    returns (ReducedForces, (gx, gy, gz, phi) near-gravity corrections,
    ok). ok False => discard, caller falls back to the gather engine.

    In "exact" mode (spec mesh_level == -1) the corrections turn a global
    pure-Newtonian sweep into the reference's softened gravity; in p3m
    mode (mesh_level == 0) they complete the FFT mesh force exactly as in
    tiles.py, with phase C running on the level-0 planes (level 0 is kept
    opacity-free, so every particle is present).

    axis (under shard_map): shard the WORK, not the state. Inputs are
    replicated; each of the `n_shards` devices sweeps its slice of every
    active-strip list and of the residual row budget, and per-row outputs
    are psum-combined (each row's set-style fields are written by exactly
    one device, add-style fields are partial sums). The spec must be
    planned with plan_mlevel(shards=n_shards) so list lengths divide
    evenly. This is the deep-collapse distribution strategy: a z-slab
    decomposition of a collapsed core concentrates all WORK in the core
    slab no matter how particle counts balance, while strip-sharding
    balances slot work exactly (sphtpu/shard/mlevel.py).
    """
    levels, res_budget, mesh_level, c_buckets = spec
    c_hw = _c_halfwidth(mesh_factor, sigma_cells)
    L = len(levels)
    n = pos.shape[0]
    dtype = pos.dtype
    kf = jnp.asarray(float(kh), dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    half = jnp.max(jnp.abs(pos)) * (1.0 + 1e-6) + jnp.asarray(1e-30, dtype)

    # ---- routed species (host hint; certified on found values) ----
    species = mlargs.species
    spec_f = species.astype(dtype)
    s_l = [2.0 * half / levels[l][0] for l in range(L)]

    # work-shard slicer: each device sweeps its contiguous slice of a
    # padded list (sentinel-padded, so shards never recompute — and never
    # double-merge — a real entry). Coverage/certification checks always
    # use the FULL lists (they assert the union covers the state).
    if axis is not None:
        shard_at = lax.axis_index(axis)

        def shard_ids(ids):
            k = ids.shape[0] // n_shards
            if k * n_shards != ids.shape[0]:
                raise ValueError(
                    f"active list length {ids.shape[0]} not divisible by "
                    f"{n_shards} shards; plan with plan_mlevel(shards=...)"
                )
            return lax.dynamic_slice(ids, (shard_at * k,), (k,))
    else:

        def shard_ids(ids):
            return ids

    # ---- residual selection ----
    if res_budget > 0:
        res_mask = species == L
        n_res = jnp.sum(res_mask)
        res_ok = n_res <= res_budget
        if _MLDEBUG:
            jax.debug.print(
                "MLDEBUG res: n_res={r} budget={b} ok={o}",
                r=n_res, b=res_budget, o=res_ok,
            )
        res_rows = jnp.nonzero(res_mask, size=res_budget, fill_value=n)[0].astype(
            jnp.int32
        )
        res_rows = shard_ids(res_rows)
    else:
        res_mask = jnp.zeros((n,), bool)
        res_ok = jnp.all(species < L)

    # ---- per-level binning (species-priority slots) + coverage certs ----
    binfo = []
    cov_ok = jnp.asarray(True)
    for l, (g, cap, buckets) in enumerate(levels):
        s = s_l[l]
        c = jnp.clip(jnp.floor((pos + half) / s).astype(jnp.int32), 0, g - 1)
        cell = (c[:, 2] * g + c[:, 1]) * g + c[:, 0]
        key = cell * 2 + (species != l).astype(jnp.int32)
        order = jnp.argsort(key)
        cell_s = cell[order]
        iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
        newseg = jnp.concatenate(
            [jnp.ones((1,), bool), cell_s[1:] != cell_s[:-1]]
        )
        seg_start = lax.cummax(jnp.where(newseg, iota, 0))
        rank = jnp.zeros((n,), jnp.int32).at[order].set(iota - seg_start)
        dropped = rank >= cap
        occ = jnp.zeros((g * g * g,), jnp.int32).at[cell].add(1)
        opaque = (occ > cap).reshape(g, g, g)
        # species-l rows always hold a slot (priority + this cert)
        cov_ok = cov_ok & ~jnp.any((species == l) & dropped)
        if mesh_level == 0 and l == 0:
            cov_ok = cov_ok & ~jnp.any(opaque)  # phase C needs everyone

        # strip coverage: species-l strips in act_a; their one-cell
        # dilation (nonempty) in act_b — provision is the UNION of the
        # level's bucket lists
        sid = c[:, 2] * g + c[:, 0]
        is_l = (species == l).astype(jnp.int32)
        all_a = jnp.concatenate(mlargs.act_a[l])
        all_b = jnp.concatenate(mlargs.act_b[l])
        need_a = jnp.zeros((g * g,), jnp.int32).at[sid].max(is_l)
        prov_a = jnp.zeros((g * g,), jnp.int32).at[all_a].set(1)
        src2d = jnp.zeros((g, g), jnp.int32).at[c[:, 2], c[:, 0]].max(is_l)
        ne2d = jnp.zeros((g, g), jnp.int32).at[c[:, 2], c[:, 0]].set(1)
        pad2d = jnp.pad(src2d, 1)
        dil = jnp.zeros((g, g), jnp.int32)
        for dz in range(3):
            for dx in range(3):
                dil = jnp.maximum(dil, pad2d[dz : dz + g, dx : dx + g])
        need_b = (dil * ne2d).reshape(-1)
        prov_b = jnp.zeros((g * g,), jnp.int32).at[all_b].set(1)
        cov_ok = cov_ok & ~jnp.any(need_a > prov_a) & ~jnp.any(need_b > prov_b)

        # bucket-capacity certificate: a strip swept at capacity cap_b
        # must have every NON-opaque cell of its 3x3 stencil (all y)
        # within cap_b slots — the sliced planes then lose no reachable
        # candidate (opaque cells are excluded: graze certs keep
        # certified queries clear of their contents). The top bucket
        # (cap_b == cap) passes by construction.
        occ_eff = jnp.where(opaque, 0, occ.reshape(g, g, g))
        col = occ_eff.max(axis=1)
        colp = jnp.pad(col, 1)
        req2d = jnp.zeros((g, g), jnp.int32)
        for dz in range(3):
            for dx in range(3):
                req2d = jnp.maximum(req2d, colp[dz : dz + g, dx : dx + g])
        req_pad = jnp.concatenate(
            [req2d.reshape(-1), jnp.zeros((1,), jnp.int32)]
        )  # sentinel id g*g -> 0 (always passes)
        for (cb, _, _), a_ids, b_ids in zip(
            buckets, mlargs.act_a[l], mlargs.act_b[l]
        ):
            if cb < cap:
                cov_ok = cov_ok & jnp.all(req_pad[a_ids] <= cb)
                cov_ok = cov_ok & jnp.all(req_pad[b_ids] <= cb)
        if mesh_level == 0 and l == 0:
            all_c = jnp.concatenate(mlargs.act_c)
            prov_c = jnp.zeros((g * g,), jnp.int32).at[all_c].set(1)
            cov_ok = cov_ok & ~jnp.any(ne2d.reshape(-1) > prov_c)
            # tail-pass bucket certificate: same shape as the hydro one
            # but over the (2 c_hw + 1)^2 tail stencil, and with NO
            # opacity exclusion (level 0 is certified opaque-free above,
            # so occ_eff == occ whenever this matters)
            if c_hw == 1:
                reqc_pad = req_pad
            else:
                colc = jnp.pad(col, c_hw)
                reqc2d = jnp.zeros((g, g), jnp.int32)
                for dz in range(2 * c_hw + 1):
                    for dx in range(2 * c_hw + 1):
                        reqc2d = jnp.maximum(
                            reqc2d, colc[dz : dz + g, dx : dx + g]
                        )
                reqc_pad = jnp.concatenate(
                    [reqc2d.reshape(-1), jnp.zeros((1,), jnp.int32)]
                )
            for (cb, _), c_ids in zip(c_buckets, mlargs.act_c):
                if cb < cap:
                    cov_ok = cov_ok & jnp.all(reqc_pad[c_ids] <= cb)
        if _MLDEBUG:
            jax.debug.print(
                "MLDEBUG L{l} cov: dropped_own={d} a_uncov={a} b_uncov={b}"
                " opaque={o}",
                l=l,
                d=jnp.sum((species == l) & dropped),
                a=jnp.sum(need_a > prov_a),
                b=jnp.sum(need_b > prov_b),
                o=jnp.sum(opaque),
            )

        pz = c[:, 2] + 1
        py = c[:, 1] + 1
        px = jnp.where(
            dropped, (g + 2) * cap, (c[:, 0] + 1) * cap + rank
        )  # dropped rows fall off the plane (mode="drop")
        binfo.append(dict(c=c, rank=rank, dropped=dropped, opaque=opaque,
                          slots=(pz, py, px), s=s))

    def to_plane(l, v, fill=0.0):
        g, cap, _ = levels[l]
        pz, py, px = binfo[l]["slots"]
        return jnp.full(((g + 2), (g + 2), (g + 2) * cap), fill, dtype).at[
            pz, py, px
        ].set(v.astype(dtype), mode="drop")

    # ---- phase A per level x bucket: exact r_kh + rho for species-l rows
    Hrow = jnp.zeros((n,), dtype)
    RHOrow = jnp.zeros((n,), dtype)
    rows_ok = cov_ok & res_ok
    a_planes = []
    for l, (g, cap, buckets) in enumerate(levels):
        X = to_plane(l, pos[:, 0])
        Y = to_plane(l, pos[:, 1])
        Z = to_plane(l, pos[:, 2])
        MASK = to_plane(l, jnp.ones((n,), dtype))
        SPECP = to_plane(l, spec_f, fill=-1.0)
        a_planes.append((X, Y, Z, MASK, SPECP))
        s = s_l[l]
        QML = to_plane(l, (species == l).astype(dtype))
        Hg = jnp.zeros((g, g, g * cap), dtype)
        RHOg = jnp.zeros((g, g, g * cap), dtype)
        OKg = jnp.ones((g, g, g * cap), dtype)

        for bi, (cap_b, na_b, nb_b) in enumerate(buckets):
            Xb = _cap_view(X, g, cap, cap_b)
            Yb = _cap_view(Y, g, cap, cap_b)
            Zb = _cap_view(Z, g, cap, cap_b)
            MASKb = _cap_view(MASK, g, cap, cap_b)
            SPECPb = _cap_view(SPECP, g, cap, cap_b)

            def phase_a(t, g=g, cap=cap_b, s=s, X=Xb, Y=Yb, Z=Zb, MASK=MASKb,
                        SPECP=SPECPb, l=l):
                (qx, cx), (qy, cy), (qz, cz), (qm, cm), (qs, _) = _strip_views(
                    (X, Y, Z, MASK, SPECP), t, g, cap, 3
                )
                dx = qx[..., None] - cx[:, :, None, :]
                dy = qy[..., None] - cy[:, :, None, :]
                dz = qz[..., None] - cz[:, :, None, :]
                d2 = dx * dx + dy * dy + dz * dz
                valid = (cm[:, :, None, :] > 0) & (qm[..., None] > 0)
                d2m = jnp.where(valid, d2, big)
                # per-query GUARANTEED search reach: the 3^3 stencil covers
                # any radius up to s + (distance from the query to its own
                # cell's nearest face) — exactly s for a corner-sitting row,
                # up to 1.5 s mid-cell. Certifying against this reach instead
                # of a uniform s gives most rows free headroom against h
                # drift within a sub-chunk (same exactness: everything within
                # reach is provably present in the stencil).
                zt0 = (t // g).astype(jnp.int32)
                xt0 = (t % g).astype(jnp.int32)
                lox = xt0.astype(dtype) * s - half
                loz = zt0.astype(dtype) * s - half
                loy = (
                    jnp.arange(g, dtype=dtype)[None, :, None] * s - half
                )
                face = jnp.minimum(
                    jnp.minimum(qx - lox, lox + s - qx),
                    jnp.minimum(
                        jnp.minimum(qy - loy, loy + s - qy),
                        jnp.minimum(qz - loz, loz + s - qz),
                    ),
                )
                reach = s + jnp.clip(face, 0.0, 0.5 * s)
                reach2 = reach * reach
                hi0 = 1.001 * reach2
                lo0 = jnp.zeros(qm.shape, dtype)
                rk2, nfound = _bisect_rk(d2m, kf, hi0, lo0, 17, dtype)
                h_t = jnp.sqrt(rk2) / 2.0
                h_safe = jnp.where(h_t > 0, h_t, 1.0)
                w_k = W(jnp.sqrt(d2) / h_safe[..., None], h_safe[..., None])
                rho_t = m * jnp.sum(
                    jnp.where(valid & (d2m <= rk2[..., None]), w_k, 0.0), axis=-1
                )
                row_ok = (
                    (qm <= 0)
                    | (qs != l)
                    | ((nfound >= kh) & (rk2 <= reach2))
                )
                if _MLDEBUG:
                    qmask = (qm > 0) & (qs == l)
                    return (
                        h_t, rho_t, row_ok.astype(dtype),
                        jnp.sum(qmask & (nfound < kh)),
                        jnp.sum(qmask & (rk2 > reach2)),
                    )
                return h_t, rho_t, row_ok.astype(dtype)

            act_a_l = shard_ids(mlargs.act_a[l][bi])
            if pallas_a and not _MLDEBUG:
                # VMEM-resident phase A (kernels/pallas_strip_knn.py): the
                # active strips' cells are pre-stacked as (n_cells, 27*cap_b)
                # candidate rows so d2 is computed once on-chip instead of
                # re-streamed from HBM per bisection pass. The stack is built
                # from 27 shifted whole-plane SLICES (HBM-speed copies) plus
                # ONE strip-granular take — cell-granular index gathers
                # measured 2.4 s/eval on the TPU, 360 KB-row takes are DMA
                # speed. Sentinel strip ids (g*g) clamp to a real strip;
                # their outputs are dropped at the scatter, exactly like the
                # XLA path.
                from ..kernels.pallas_strip_knn import phase_a_cells

                na_l = act_a_l.shape[0]
                act_cl = jnp.clip(act_a_l, 0, g * g - 1)

                def strips27(P):
                    parts = [
                        lax.slice(
                            P,
                            (dz, dy, dxs * cap_b),
                            (dz + g, dy + g, (dxs + g) * cap_b),
                        ).reshape(g, g, g, cap_b)
                        for dz in range(3)
                        for dy in range(3)
                        for dxs in range(3)
                    ]
                    # (z, y, x, 27, cap_b) -> strips (z*g+x, y, 27*cap_b)
                    st = jnp.stack(parts, axis=3)
                    st = st.transpose(0, 2, 1, 3, 4).reshape(
                        g * g, g, 27 * cap_b
                    )
                    return jnp.take(st, act_cl, axis=0).reshape(
                        na_l * g, 27 * cap_b
                    )

                def stripsq(P):
                    q = lax.slice(
                        P, (1, 1, cap_b), (1 + g, 1 + g, (1 + g) * cap_b)
                    ).reshape(g, g, g, cap_b)
                    q = q.transpose(0, 2, 1, 3).reshape(g * g, g, cap_b)
                    return jnp.take(q, act_cl, axis=0).reshape(na_l * g, cap_b)

                QMLb = _cap_view(QML, g, cap, cap_b)
                qxc, qyc, qzc = stripsq(Xb), stripsq(Yb), stripsq(Zb)
                qmc = stripsq(QMLb)
                zi = jnp.repeat((act_cl // g).astype(jnp.int32), g)[:, None]
                xi = jnp.repeat((act_cl % g).astype(jnp.int32), g)[:, None]
                yi = jnp.tile(jnp.arange(g, dtype=jnp.int32), na_l)[:, None]
                lox = xi.astype(dtype) * s - half
                loy = yi.astype(dtype) * s - half
                loz = zi.astype(dtype) * s - half
                face = jnp.minimum(
                    jnp.minimum(qxc - lox, lox + s - qxc),
                    jnp.minimum(
                        jnp.minimum(qyc - loy, loy + s - qyc),
                        jnp.minimum(qzc - loz, loz + s - qzc),
                    ),
                )
                reach = s + jnp.clip(face, 0.0, 0.5 * s)
                h_c, rho_c, ok_c = phase_a_cells(
                    (qxc, qyc, qzc, qmc),
                    reach * reach,
                    (strips27(Xb), strips27(Yb), strips27(Zb), strips27(MASKb)),
                    m,
                    kh=kh,
                    cap=cap_b,
                    interpret=pallas_interpret,
                )
                h_st = h_c.reshape(na_l, 1, g, cap_b)
                rho_st = rho_c.reshape(na_l, 1, g, cap_b)
                ok_st = ok_c.reshape(na_l, 1, g, cap_b)
            elif _MLDEBUG:
                h_st, rho_st, ok_st, f_k, f_s = lax.map(
                    phase_a, act_a_l, batch_size=8
                )
                jax.debug.print(
                    "MLDEBUG L{l} b{b} rows: kh_short={k} rk_gt_reach={s}",
                    l=l, b=bi, k=jnp.sum(f_k), s=jnp.sum(f_s),
                )
            else:
                h_st, rho_st, ok_st = lax.map(phase_a, act_a_l, batch_size=8)
            Hg = _scatter_strips_into(Hg, h_st, act_a_l, g, cap, cap_b)
            RHOg = _scatter_strips_into(RHOg, rho_st, act_a_l, g, cap, cap_b)
            OKg = _scatter_strips_into(OKg, ok_st, act_a_l, g, cap, cap_b)
        rows_ok = rows_ok & jnp.all(OKg > 0)
        c = binfo[l]["c"]
        rank = binfo[l]["rank"]
        ix = c[:, 0] * cap + jnp.minimum(rank, cap - 1)
        sel = (species == l) & ~binfo[l]["dropped"]
        Hrow = jnp.where(sel, Hg[c[:, 2], c[:, 1], ix], Hrow)
        RHOrow = jnp.where(sel, RHOg[c[:, 2], c[:, 1], ix], RHOrow)

        # opacity clearance, certified per ROW (shared by the XLA and
        # Pallas phase-A paths): every opaque stencil cell must stay
        # beyond max(h + s/2, 2h) of each species-l row — h + s/2 bounds
        # the pair/gravity reach h + h_partner (partners at this level
        # have h_partner <= s/2 by routing), 2h the kNN radius, which
        # the reach certificate allows past s.
        opf = jnp.pad(binfo[l]["opaque"], 1)
        rcert_row = jnp.maximum(Hrow + 0.5 * s, 2.0 * Hrow)
        czr, cyr, cxr = c[:, 2], c[:, 1], c[:, 0]
        ok_op = jnp.ones((n,), bool)
        for ddz in range(3):
            for ddy in range(3):
                for ddx in range(3):
                    op = opf[czr + ddz, cyr + ddy, cxr + ddx]
                    lozr = (czr + ddz - 1).astype(dtype) * s - half
                    loyr = (cyr + ddy - 1).astype(dtype) * s - half
                    loxr = (cxr + ddx - 1).astype(dtype) * s - half
                    dxx = jnp.maximum(
                        jnp.maximum(loxr - pos[:, 0], pos[:, 0] - (loxr + s)),
                        0.0,
                    )
                    dyy = jnp.maximum(
                        jnp.maximum(loyr - pos[:, 1], pos[:, 1] - (loyr + s)),
                        0.0,
                    )
                    dzz = jnp.maximum(
                        jnp.maximum(lozr - pos[:, 2], pos[:, 2] - (lozr + s)),
                        0.0,
                    )
                    dmin = jnp.sqrt(dxx * dxx + dyy * dyy + dzz * dzz)
                    ok_op = ok_op & (~op | (dmin > rcert_row))
        if _MLDEBUG:
            jax.debug.print(
                "MLDEBUG L{l} rows: op_graze={o}",
                l=l, o=jnp.sum(sel & ~ok_op),
            )
        rows_ok = rows_ok & jnp.all(~sel | ok_op)

    return _mlevel_tail(
        pos, vel, m, K, h_hint, mlargs, levels, res_budget, mesh_level,
        c_buckets, species, spec_f, res_rows if res_budget > 0 else None,
        binfo, a_planes, s_l, Hrow, RHOrow, rows_ok, half,
        eos=eos, gamma=gamma, cs0=cs0, alpha=alpha, beta=beta, kh=kh,
        mesh_factor=mesh_factor, sigma_cells=sigma_cells, c_hw=c_hw,
        axis=axis, n_shards=n_shards, shard_ids=shard_ids,
    )


def _mlevel_tail(
    pos, vel, m, K, h_hint, mlargs, levels, res_budget, mesh_level,
    c_buckets, species, spec_f, res_rows, binfo, a_planes, s_l, Hrow,
    RHOrow, rows_ok, half, *, eos, gamma, cs0, alpha, beta, kh,
    mesh_factor, sigma_cells, c_hw,
    axis=None, n_shards=1, shard_ids=lambda ids: ids,
):
    """Phases B/C + residual lane + merge (continuation of
    mlevel_sph_forces; split only to keep functions reviewable)."""
    L = len(levels)
    n = pos.shape[0]
    dtype = pos.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)

    # ---- residual lane, part 1: exact r_k + rho (streaming bisection) ----
    if res_budget > 0:
        rsafe = jnp.minimum(res_rows, n - 1)
        rvalid = res_rows < n
        rk2_res, nfound_res, h_res, rho_res = _res_knn(
            pos, rsafe, rvalid, h_hint[rsafe], m, kh
        )
        rows_ok = rows_ok & jnp.all(~rvalid | (nfound_res >= kh))
        if _MLDEBUG:
            jax.debug.print(
                "MLDEBUG res rows: kh_short={k}",
                k=jnp.sum(rvalid & (nfound_res < kh)),
            )
        drop_to = jnp.where(rvalid, res_rows, n)
        Hrow = Hrow.at[drop_to].set(h_res, mode="drop")
        RHOrow = RHOrow.at[drop_to].set(rho_res, mode="drop")

    if axis is not None:
        # every row's h/rho was produced by exactly one shard (its strip's
        # owner, or its residual-slice owner); elsewhere the partial is 0
        Hrow = lax.psum(Hrow, axis)
        RHOrow = lax.psum(RHOrow, axis)

    # ---- derived per-row fields (merged across levels + residual) ----
    rho_safe = jnp.where(RHOrow > 0, RHOrow, 1.0)
    if eos == "polytropic":
        por2_row = K.astype(dtype) * rho_safe ** (gamma - 2.0)
        cs_row = jnp.sqrt(gamma * K.astype(dtype) * rho_safe ** (gamma - 1.0))
    else:
        por2_row = cs0**2 / rho_safe
        cs_row = jnp.full((n,), cs0, dtype)

    # ---- phase B per level ----
    acc_x = jnp.zeros((n,), dtype)
    acc_y = jnp.zeros((n,), dtype)
    acc_z = jnp.zeros((n,), dtype)
    visc_row = jnp.zeros((n,), dtype)
    div_row = jnp.zeros((n,), dtype)
    mu_row = jnp.zeros((n,), dtype)
    ggx = jnp.zeros((n,), dtype)
    ggy = jnp.zeros((n,), dtype)
    ggz = jnp.zeros((n,), dtype)
    gphi = jnp.zeros((n,), dtype)

    for l, (g, cap, buckets) in enumerate(levels):
        X, Y, Z, MASK, SPECP = a_planes[l]
        pz, py, px = binfo[l]["slots"]

        def to_plane(v, fill=0.0):
            return jnp.full(((g + 2), (g + 2), (g + 2) * cap), fill, dtype).at[
                pz, py, px
            ].set(v.astype(dtype), mode="drop")

        VX = to_plane(vel[:, 0])
        VY = to_plane(vel[:, 1])
        VZ = to_plane(vel[:, 2])
        Hp = to_plane(Hrow)
        RK2p = to_plane((2.0 * Hrow) ** 2)
        RHOp = to_plane(RHOrow)
        POR2p = to_plane(por2_row)
        CSp = to_plane(cs_row)
        level_planes = (
            X, Y, Z, VX, VY, VZ, MASK, SPECP, Hp, RK2p, RHOp, POR2p, CSp
        )
        grids = [jnp.zeros((g, g, g * cap), dtype) for _ in range(10)]

        def phase_b(t, g, cap, l, planes):
            views = _strip_views(planes, t, g, cap, 3)
            (qx, cx), (qy, cy), (qz, cz) = views[0:3]
            (qvx, cvx), (qvy, cvy), (qvz, cvz) = views[3:6]
            (qm, cm), (qs, cspec) = views[6:8]
            (qh, ch), (qrk2, crk2), (qrho, crho) = views[8:11]
            (qpor2, cpor2), (qcs, ccs) = views[11:13]

            dx = qx[..., None] - cx[:, :, None, :]
            dy = qy[..., None] - cy[:, :, None, :]
            dz = qz[..., None] - cz[:, :, None, :]
            d2 = dx * dx + dy * dy + dz * dz
            r = jnp.sqrt(d2)
            valid = (cm[:, :, None, :] > 0) & (qm[..., None] > 0)
            lf = jnp.asarray(float(l), dtype)
            q_is_l = qs[..., None] == lf
            c_is_l = cspec[:, :, None, :] == lf
            fwd = valid & q_is_l & (d2 <= qrk2[..., None])
            rev = valid & c_is_l & (d2 <= crk2[:, :, None, :])

            h_q = jnp.where(qh > 0, qh, 1.0)[..., None]
            h_c = jnp.where(ch > 0, ch, 1.0)[:, :, None, :]
            h_avg = 0.5 * (h_q + h_c)
            rho_avg = 0.5 * (qrho[..., None] + crho[:, :, None, :])
            rho_avg = jnp.where(valid, rho_avg, 1.0)

            vx = qvx[..., None] - cvx[:, :, None, :]
            vy = qvy[..., None] - cvy[:, :, None, :]
            vz = qvz[..., None] - cvz[:, :, None, :]
            v_dot_r = vx * dx + vy * dy + vz * dz
            mu = jnp.minimum(h_avg * v_dot_r / (d2 + 0.01 * h_avg**2), 0.0)
            pi_fwd = (-alpha * qcs[..., None] * mu + beta * mu * mu) / rho_avg
            pi_rev = (
                -alpha * ccs[:, :, None, :] * mu + beta * mu * mu
            ) / rho_avg

            dwdr_q = grad_W_over_r(r / h_q, r, h_q)
            dwdr_c = grad_W_over_r(r / h_c, r, h_c)

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

            # near-field gravity correction: pairs whose coarser member is
            # species l (residual pairs excluded: their species is L)
            maxspec = jnp.maximum(qs[..., None], cspec[:, :, None, :])
            r_safe = jnp.where(d2 > 0, r, 1.0)
            newt_g = jnp.where(d2 > 0, 1.0 / r_safe**3, 0.0)
            newt_p = jnp.where(d2 > 0, -1.0 / r_safe, 0.0)
            gmask = valid & (maxspec == lf) & (r <= 2.0 * h_avg)
            cgp = jnp.where(gmask, softened_gphi_over_r(r, h_avg) - newt_g, 0.0)
            cpp = jnp.where(gmask, softened_phi(r, h_avg) - newt_p, 0.0)
            gx_t = m * jnp.sum(cgp * dx, axis=-1)
            gy_t = m * jnp.sum(cgp * dy, axis=-1)
            gz_t = m * jnp.sum(cgp * dz, axis=-1)
            gp_t = m * jnp.sum(cpp, axis=-1)
            return (ax, ay, az, div_t, mu_max_t, visc_t, gx_t, gy_t, gz_t, gp_t)

        for bi, (cap_b, na_b, nb_b) in enumerate(buckets):
            planes_b = tuple(
                _cap_view(P, g, cap, cap_b) for P in level_planes
            )
            act_b_l = shard_ids(mlargs.act_b[l][bi])
            outs = lax.map(
                functools.partial(
                    phase_b, g=g, cap=cap_b, l=l, planes=planes_b
                ),
                act_b_l,
                batch_size=8,
            )
            for gi, o in enumerate(outs):
                grids[gi] = _scatter_strips_into(
                    grids[gi], o, act_b_l, g, cap, cap_b
                )
        c = binfo[l]["c"]
        rank = binfo[l]["rank"]
        ix = c[:, 0] * cap + jnp.minimum(rank, cap - 1)
        guard = ~binfo[l]["dropped"]
        sel = (species == l) & guard

        def ext(gr):
            return jnp.where(guard, gr[c[:, 2], c[:, 1], ix], 0.0)

        acc_x = acc_x + ext(grids[0])
        acc_y = acc_y + ext(grids[1])
        acc_z = acc_z + ext(grids[2])
        div_row = jnp.where(sel, grids[3][c[:, 2], c[:, 1], ix], div_row)
        mu_row = jnp.where(sel, grids[4][c[:, 2], c[:, 1], ix], mu_row)
        visc_row = visc_row + ext(grids[5])
        ggx = ggx + ext(grids[6])
        ggy = ggy + ext(grids[7])
        ggz = ggz + ext(grids[8])
        gphi = gphi + ext(grids[9])

    # ---- phase C: P3M 5^3 (Newtonian - mesh shape) tail on level 0 ----
    if mesh_level == 0:
        g0, cap0 = levels[0][0], levels[0][1]
        s0 = s_l[0]
        sigma = (s0 / mesh_factor) * sigma_cells
        c0 = binfo[0]["c"]
        rank0 = binfo[0]["rank"]
        c_depth = 2 * c_hw + 1
        if c_hw == 1:
            # tail reach fits the hydro stencil: reuse the level-0
            # phase-A planes (pad 1; they hold ALL binned particles)
            XC, YC, ZC, MC = a_planes[0][0], a_planes[0][1], a_planes[0][2], \
                a_planes[0][3]
        else:
            pzc = c0[:, 2] + c_hw
            pyc = c0[:, 1] + c_hw
            pxc = (c0[:, 0] + c_hw) * cap0 + jnp.minimum(rank0, cap0 - 1)
            gpc = g0 + 2 * c_hw
            shapec = (gpc, gpc, gpc * cap0)

            def to_planec(v, fill=0.0):
                return jnp.full(shapec, fill, dtype).at[pzc, pyc, pxc].set(
                    v.astype(dtype), mode="drop"
                )

            XC = to_planec(pos[:, 0])
            YC = to_planec(pos[:, 1])
            ZC = to_planec(pos[:, 2])
            MC = to_planec(jnp.ones((n,), dtype))

        def phase_c(t, cap_b, planes):
            (qx, cx), (qy, cy), (qz, cz), (qm, cm) = _strip_views(
                planes, t, g0, cap_b, c_depth
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

        cgrids = [jnp.zeros((g0, g0, g0 * cap0), dtype) for _ in range(4)]
        for (cap_b, nc_b), c_ids in zip(c_buckets, mlargs.act_c):
            planes_b = tuple(
                _cap_view(P, g0, cap0, cap_b, pad=c_hw)
                for P in (XC, YC, ZC, MC)
            )
            act_c_s = shard_ids(c_ids)
            outs_c = lax.map(
                functools.partial(phase_c, cap_b=cap_b, planes=planes_b),
                act_c_s,
                batch_size=8,
            )
            for gi, o in enumerate(outs_c):
                cgrids[gi] = _scatter_strips_into(
                    cgrids[gi], o, act_c_s, g0, cap0, cap_b
                )
        ix0 = c0[:, 0] * cap0 + jnp.minimum(rank0, cap0 - 1)
        ggx = ggx + cgrids[0][c0[:, 2], c0[:, 1], ix0]
        ggy = ggy + cgrids[1][c0[:, 2], c0[:, 1], ix0]
        ggz = ggz + cgrids[2][c0[:, 2], c0[:, 1], ix0]
        gphi = gphi + cgrids[3][c0[:, 2], c0[:, 1], ix0]

    # ---- residual lane, part 2: forces + scatter-back ----
    if res_budget > 0:
        rowB, recvC = _res_forces(
            pos, vel, m, rsafe, rvalid, rk2_res, h_res,
            Hrow, RHOrow, por2_row, cs_row, species, L,
            eos=eos, alpha=alpha, beta=beta,
        )
        # residual rows: their hydro plane-sum partials (reverse-receive
        # from level sources) are re-computed completely by sweep B2 ->
        # REPLACE; their per-level gravity sums are structurally zero
        # (maxspec == L never matches a level) while phase C's geometric
        # (Newtonian - mesh) term does include them -> ADD the lane's
        # (softened - Newtonian) term on top
        if axis is not None:
            # sharded REPLACE: zero every shard's plane partials at
            # residual rows, then let the owning shard ADD its complete
            # rows — the psum below then yields exactly rowB once
            res_all = species == len(levels)
            acc_x = jnp.where(res_all, 0.0, acc_x)
            acc_y = jnp.where(res_all, 0.0, acc_y)
            acc_z = jnp.where(res_all, 0.0, acc_z)
            visc_row = jnp.where(res_all, 0.0, visc_row)
            acc_x = acc_x.at[drop_to].add(rowB["ax"], mode="drop")
            acc_y = acc_y.at[drop_to].add(rowB["ay"], mode="drop")
            acc_z = acc_z.at[drop_to].add(rowB["az"], mode="drop")
            div_row = div_row.at[drop_to].add(rowB["div"], mode="drop")
            mu_row = mu_row.at[drop_to].add(rowB["mu"], mode="drop")
            visc_row = visc_row.at[drop_to].add(rowB["visc"], mode="drop")
        else:
            acc_x = acc_x.at[drop_to].set(rowB["ax"], mode="drop")
            acc_y = acc_y.at[drop_to].set(rowB["ay"], mode="drop")
            acc_z = acc_z.at[drop_to].set(rowB["az"], mode="drop")
            div_row = div_row.at[drop_to].set(rowB["div"], mode="drop")
            mu_row = mu_row.at[drop_to].set(rowB["mu"], mode="drop")
            visc_row = visc_row.at[drop_to].set(rowB["visc"], mode="drop")
        ggx = ggx.at[drop_to].add(rowB["gx"], mode="drop")
        ggy = ggy.at[drop_to].add(rowB["gy"], mode="drop")
        ggz = ggz.at[drop_to].add(rowB["gz"], mode="drop")
        gphi = gphi.at[drop_to].add(rowB["gp"], mode="drop")
        # non-residual receivers: contributions from residual sources
        acc_x = acc_x + recvC["ax"]
        acc_y = acc_y + recvC["ay"]
        acc_z = acc_z + recvC["az"]
        visc_row = visc_row + recvC["visc"]
        ggx = ggx + recvC["gx"]
        ggy = ggy + recvC["gy"]
        ggz = ggz + recvC["gz"]
        gphi = gphi + recvC["gp"]

    if axis is not None:
        acc_x = lax.psum(acc_x, axis)
        acc_y = lax.psum(acc_y, axis)
        acc_z = lax.psum(acc_z, axis)
        div_row = lax.psum(div_row, axis)
        mu_row = lax.psum(mu_row, axis)
        visc_row = lax.psum(visc_row, axis)
        ggx = lax.psum(ggx, axis)
        ggy = lax.psum(ggy, axis)
        ggz = lax.psum(ggz, axis)
        gphi = lax.psum(gphi, axis)
        rows_ok = lax.psum(rows_ok.astype(jnp.int32), axis) == n_shards

    out = ReducedForces(
        acc=jnp.stack([acc_x, acc_y, acc_z], axis=1),
        rho=RHOrow,
        h=Hrow,
        cs=cs_row,
        mu_max=mu_row,
        div_sum=div_row,
        visc_dk=visc_row,
    )
    return out, (ggx, ggy, ggz, gphi), rows_ok


# ---------------------------------------------------------------------------
# Streaming residual lane (no top_k, no gathers: bisection + masked sweeps)
# ---------------------------------------------------------------------------


def _res_knn(pos, rsafe, rvalid, h_hint_r, m, kh, *, block=2048, row_block=256):
    """Exact r_Kh / h / rho for residual rows by streaming count bisection
    over all N candidates (replaces the old outlier lane's top_k kNN).
    Returns (rk2, nfound, h, rho) over the padded budget rows."""
    n = pos.shape[0]
    B = rsafe.shape[0]
    dtype = pos.dtype
    kf = jnp.asarray(float(kh), dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nb = _ceil_to(n, block)
    xs = jnp.pad(pos[:, 0], (0, nb - n))
    ys = jnp.pad(pos[:, 1], (0, nb - n))
    zs = jnp.pad(pos[:, 2], (0, nb - n))
    ncb = nb // block

    q = pos[rsafe]
    hi0 = jnp.maximum((3.4 * h_hint_r.astype(dtype)) ** 2, 1e-30)
    Bp = _ceil_to(B, row_block)
    qp = jnp.pad(q, ((0, Bp - B), (0, 0)))
    hip = jnp.pad(hi0, (0, Bp - B), constant_values=1.0)

    def row_chunk(args):
        qb, hib = args
        rb = qb.shape[0]

        def d2_block(ci):
            bx = lax.dynamic_slice(xs, (ci * block,), (block,))
            by = lax.dynamic_slice(ys, (ci * block,), (block,))
            bz = lax.dynamic_slice(zs, (ci * block,), (block,))
            dx = qb[:, 0:1] - bx[None, :]
            dy = qb[:, 1:2] - by[None, :]
            dz = qb[:, 2:3] - bz[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            cid = ci * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
            return jnp.where(cid < n, d2, big)

        def one_pass(_, lohi):
            lo, hi = lohi
            span = hi - lo
            t1 = lo + 0.25 * span
            t2 = lo + 0.5 * span
            t3 = lo + 0.75 * span

            def col(ci, acc):
                c1, c2, c3 = acc
                d2 = d2_block(ci)
                return (
                    c1 + jnp.sum(d2 <= t1[:, None], axis=1).astype(dtype),
                    c2 + jnp.sum(d2 <= t2[:, None], axis=1).astype(dtype),
                    c3 + jnp.sum(d2 <= t3[:, None], axis=1).astype(dtype),
                )

            zero = jnp.zeros((rb,), dtype)
            c1, c2, c3 = lax.fori_loop(0, ncb, col, (zero, zero, zero))
            f1, f2, f3 = c1 >= kf, c2 >= kf, c3 >= kf
            lo2 = jnp.where(f1, lo, jnp.where(f2, t1, jnp.where(f3, t2, t3)))
            hi2 = jnp.where(f1, t1, jnp.where(f2, t2, jnp.where(f3, t3, hi)))
            return lo2, hi2

        lo, hi = lax.fori_loop(
            0, 14, one_pass, (jnp.zeros((rb,), dtype), hib)
        )

        def col_rk(ci, rk2):
            d2 = d2_block(ci)
            return jnp.maximum(
                rk2, jnp.max(jnp.where(d2 <= hi[:, None], d2, 0.0), axis=1)
            )

        rk2 = lax.fori_loop(0, ncb, col_rk, jnp.zeros((rb,), dtype))
        h = jnp.sqrt(rk2) / 2.0
        h_safe = jnp.where(h > 0, h, 1.0)

        def col_rho(ci, acc):
            nf, rho = acc
            d2 = d2_block(ci)
            inn = d2 <= rk2[:, None]
            w = W(jnp.sqrt(d2) / h_safe[:, None], h_safe[:, None])
            return (
                nf + jnp.sum(inn, axis=1).astype(dtype),
                rho + m * jnp.sum(jnp.where(inn, w, 0.0), axis=1),
            )

        nf, rho = lax.fori_loop(
            0, ncb, col_rho,
            (jnp.zeros((rb,), dtype), jnp.zeros((rb,), dtype)),
        )
        return rk2, nf, h, rho

    rk2, nf, h, rho = lax.map(
        row_chunk,
        (
            qp.reshape(Bp // row_block, row_block, 3),
            hip.reshape(Bp // row_block, row_block),
        ),
        batch_size=4,
    )
    return (
        rk2.reshape(Bp)[:B],
        nf.reshape(Bp)[:B],
        h.reshape(Bp)[:B],
        rho.reshape(Bp)[:B],
    )


def _res_forces(
    pos, vel, m, rsafe, rvalid, rk2_res, h_res,
    h_all, rho_all, por2_all, cs_all, species, L,
    *, eos, alpha, beta, block=2048, row_block=256, recv_block=1024,
):
    """Residual forces. Returns (rowB, recvC):

    rowB: the COMPLETE per-row outputs for residual rows — forward over
    their own exact kNN list, reverse receive from every other list, and
    the full (softened - Newtonian) near-gravity correction against all N
    (reference scatter semantics, hydroCalculation
    polytrope_hydroKDTree.jl:229-248).
    recvC: (N,) buffers of contributions from residual SOURCES to
    non-residual receivers (the transpose sweep)."""
    n = pos.shape[0]
    B = rsafe.shape[0]
    dtype = pos.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nb = _ceil_to(n, block)

    def padf(v, fill=0.0):
        return jnp.pad(v, (0, nb - n), constant_values=fill)

    xs, ys, zs = padf(pos[:, 0]), padf(pos[:, 1]), padf(pos[:, 2])
    vxs, vys, vzs = padf(vel[:, 0]), padf(vel[:, 1]), padf(vel[:, 2])
    hs = padf(h_all, 1.0)
    rhos = padf(rho_all, 1.0)
    por2s = padf(por2_all)
    css = padf(cs_all)
    ncb = nb // block

    # ---- part B2: complete rows for residual queries ----
    q = pos[rsafe]
    qv = vel[rsafe]
    h_q = jnp.where(h_res > 0, h_res, 1.0)
    rho_q = jnp.where(rho_all[rsafe] > 0, rho_all[rsafe], 1.0)
    por2_q = por2_all[rsafe]
    cs_q = cs_all[rsafe]
    Bp = _ceil_to(B, row_block)

    def rpad(v, fill=0.0):
        return jnp.pad(v, ((0, Bp - B),) + ((0, 0),) * (v.ndim - 1),
                       constant_values=fill)

    def row_chunk(args):
        qb, qvb, hqb, rhoqb, por2qb, csqb, rk2b = args
        rb = qb.shape[0]
        zero = jnp.zeros((rb,), dtype)

        def col(ci, acc):
            (ax, ay, az, div, mumax, visc, gx, gy, gz, gp) = acc
            bx = lax.dynamic_slice(xs, (ci * block,), (block,))
            by = lax.dynamic_slice(ys, (ci * block,), (block,))
            bz = lax.dynamic_slice(zs, (ci * block,), (block,))
            bvx = lax.dynamic_slice(vxs, (ci * block,), (block,))
            bvy = lax.dynamic_slice(vys, (ci * block,), (block,))
            bvz = lax.dynamic_slice(vzs, (ci * block,), (block,))
            bh = lax.dynamic_slice(hs, (ci * block,), (block,))
            brho = lax.dynamic_slice(rhos, (ci * block,), (block,))
            bpor2 = lax.dynamic_slice(por2s, (ci * block,), (block,))
            bcs = lax.dynamic_slice(css, (ci * block,), (block,))
            cid = ci * block + lax.broadcasted_iota(jnp.int32, (1, block), 1)
            cval = cid < n

            dx = qb[:, 0:1] - bx[None, :]
            dy = qb[:, 1:2] - by[None, :]
            dz = qb[:, 2:3] - bz[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            r = jnp.sqrt(d2)
            fwd = cval & (d2 <= rk2b[:, None])
            rev = cval & (d2 <= (2.0 * bh[None, :]) ** 2)

            h_avg = 0.5 * (hqb[:, None] + bh[None, :])
            rho_avg = 0.5 * (rhoqb[:, None] + brho[None, :])
            vx = qvb[:, 0:1] - bvx[None, :]
            vy = qvb[:, 1:2] - bvy[None, :]
            vz = qvb[:, 2:3] - bvz[None, :]
            v_dot_r = vx * dx + vy * dy + vz * dz
            mu = jnp.minimum(h_avg * v_dot_r / (d2 + 0.01 * h_avg**2), 0.0)
            pi_fwd = (-alpha * csqb[:, None] * mu + beta * mu * mu) / rho_avg
            pi_rev = (-alpha * bcs[None, :] * mu + beta * mu * mu) / rho_avg
            dwdr_q = grad_W_over_r(r / hqb[:, None], r, hqb[:, None])
            dwdr_c = grad_W_over_r(r / bh[None, :], r, bh[None, :])
            if eos == "polytropic":
                psum = por2qb[:, None] + bpor2[None, :]
                ct_fwd = m * (psum + pi_fwd) / 2.0
                ct_rev = m * (psum + pi_rev) / 2.0
            else:
                ct_fwd = m * (por2qb[:, None] + pi_fwd / 2.0)
                ct_rev = m * (bpor2[None, :] + pi_rev / 2.0)
            coeff = -jnp.where(fwd, ct_fwd * dwdr_q, 0.0) - jnp.where(
                rev, ct_rev * dwdr_c, 0.0
            )
            v_dot_dw_q = v_dot_r * dwdr_q
            v_dot_dw_c = v_dot_r * dwdr_c

            r_safe = jnp.where(d2 > 0, r, 1.0)
            newt_g = jnp.where(d2 > 0, 1.0 / r_safe**3, 0.0)
            newt_p = jnp.where(d2 > 0, -1.0 / r_safe, 0.0)
            gmask = cval & (r <= 2.0 * h_avg)
            cgp = jnp.where(
                gmask, softened_gphi_over_r(r, h_avg) - newt_g, 0.0
            )
            cpp = jnp.where(gmask, softened_phi(r, h_avg) - newt_p, 0.0)
            return (
                ax + jnp.sum(coeff * dx, axis=1),
                ay + jnp.sum(coeff * dy, axis=1),
                az + jnp.sum(coeff * dz, axis=1),
                div + m * jnp.sum(jnp.where(fwd, v_dot_dw_q, 0.0), axis=1),
                jnp.maximum(
                    mumax, jnp.max(jnp.where(fwd, mu, -big), axis=1)
                ),
                visc + jnp.sum(
                    jnp.where(fwd, m * pi_fwd * v_dot_dw_q / 2.0, 0.0)
                    + jnp.where(rev, m * pi_rev * v_dot_dw_c / 2.0, 0.0),
                    axis=1,
                ),
                gx + m * jnp.sum(cgp * dx, axis=1),
                gy + m * jnp.sum(cgp * dy, axis=1),
                gz + m * jnp.sum(cgp * dz, axis=1),
                gp + m * jnp.sum(cpp, axis=1),
            )

        init = (zero, zero, zero, zero, jnp.full((rb,), -big, dtype),
                zero, zero, zero, zero, zero)
        return lax.fori_loop(0, ncb, col, init)

    outs = lax.map(
        row_chunk,
        (
            rpad(q).reshape(Bp // row_block, row_block, 3),
            rpad(qv).reshape(Bp // row_block, row_block, 3),
            rpad(h_q, 1.0).reshape(Bp // row_block, row_block),
            rpad(rho_q, 1.0).reshape(Bp // row_block, row_block),
            rpad(por2_q).reshape(Bp // row_block, row_block),
            rpad(cs_q).reshape(Bp // row_block, row_block),
            rpad(rk2_res).reshape(Bp // row_block, row_block),
        ),
        batch_size=4,
    )
    names = ("ax", "ay", "az", "div", "mu", "visc", "gx", "gy", "gz", "gp")
    rowB = {k: v.reshape(Bp)[:B] for k, v in zip(names, outs)}

    # ---- part C: residual sources -> non-residual receivers ----
    Bb = _ceil_to(B, min(B if B else 1, 2048))
    src_block = min(Bb, 2048)
    nsb = Bb // src_block

    def spad(v, fill=0.0):
        return jnp.pad(v, (0, Bb - B), constant_values=fill)

    sx, sy, sz = spad(q[:, 0]), spad(q[:, 1]), spad(q[:, 2])
    svx, svy, svz = spad(qv[:, 0]), spad(qv[:, 1]), spad(qv[:, 2])
    sh = spad(h_q, 1.0)
    srho = spad(rho_q, 1.0)
    spor2 = spad(por2_q)
    scs = spad(cs_q)
    srk2 = spad(rk2_res)
    sval = spad(rvalid.astype(dtype))

    nrp = _ceil_to(n, recv_block)
    nonres = (species < L).astype(dtype)

    def rvpad(v, fill=0.0):
        return jnp.pad(v, ((0, nrp - n),) + ((0, 0),) * (v.ndim - 1),
                       constant_values=fill)

    def recv_chunk(args):
        pb, vb, hb, rhob, por2b, csb, nrb = args
        rb = pb.shape[0]
        zero = jnp.zeros((rb,), dtype)

        def col(ci, acc):
            ax, ay, az, visc, gx, gy, gz, gp = acc
            slc = lambda v: lax.dynamic_slice(v, (ci * src_block,), (src_block,))
            bx, by, bz = slc(sx), slc(sy), slc(sz)
            bvx, bvy, bvz = slc(svx), slc(svy), slc(svz)
            bh, brho, bpor2, bcs = slc(sh), slc(srho), slc(spor2), slc(scs)
            brk2, bval = slc(srk2), slc(sval)

            dx = pb[:, 0:1] - bx[None, :]
            dy = pb[:, 1:2] - by[None, :]
            dz = pb[:, 2:3] - bz[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            r = jnp.sqrt(d2)
            ok = (bval[None, :] > 0) & (nrb[:, None] > 0)
            rev = ok & (d2 <= brk2[None, :])

            h_avg = 0.5 * (hb[:, None] + bh[None, :])
            rho_avg = 0.5 * (rhob[:, None] + brho[None, :])
            vx = vb[:, 0:1] - bvx[None, :]
            vy = vb[:, 1:2] - bvy[None, :]
            vz = vb[:, 2:3] - bvz[None, :]
            v_dot_r = vx * dx + vy * dy + vz * dz
            mu = jnp.minimum(h_avg * v_dot_r / (d2 + 0.01 * h_avg**2), 0.0)
            pi_rev = (-alpha * bcs[None, :] * mu + beta * mu * mu) / rho_avg
            dwdr_c = grad_W_over_r(r / bh[None, :], r, bh[None, :])
            if eos == "polytropic":
                ct_rev = m * (
                    por2b[:, None] + bpor2[None, :] + pi_rev
                ) / 2.0
            else:
                ct_rev = m * (bpor2[None, :] + pi_rev / 2.0)
            coeff = -jnp.where(rev, ct_rev * dwdr_c, 0.0)

            r_safe = jnp.where(d2 > 0, r, 1.0)
            newt_g = jnp.where(d2 > 0, 1.0 / r_safe**3, 0.0)
            newt_p = jnp.where(d2 > 0, -1.0 / r_safe, 0.0)
            gmask = ok & (r <= 2.0 * h_avg)
            cgp = jnp.where(
                gmask, softened_gphi_over_r(r, h_avg) - newt_g, 0.0
            )
            cpp = jnp.where(gmask, softened_phi(r, h_avg) - newt_p, 0.0)
            return (
                ax + jnp.sum(coeff * dx, axis=1),
                ay + jnp.sum(coeff * dy, axis=1),
                az + jnp.sum(coeff * dz, axis=1),
                visc + jnp.sum(
                    jnp.where(rev, m * pi_rev * v_dot_r * dwdr_c / 2.0, 0.0),
                    axis=1,
                ),
                gx + m * jnp.sum(cgp * dx, axis=1),
                gy + m * jnp.sum(cgp * dy, axis=1),
                gz + m * jnp.sum(cgp * dz, axis=1),
                gp + m * jnp.sum(cpp, axis=1),
            )

        init = (zero,) * 8
        return lax.fori_loop(0, nsb, col, init)

    outs_c = lax.map(
        recv_chunk,
        (
            rvpad(pos).reshape(nrp // recv_block, recv_block, 3),
            rvpad(vel).reshape(nrp // recv_block, recv_block, 3),
            rvpad(h_all, 1.0).reshape(nrp // recv_block, recv_block),
            rvpad(rho_all, 1.0).reshape(nrp // recv_block, recv_block),
            rvpad(por2_all).reshape(nrp // recv_block, recv_block),
            rvpad(cs_all).reshape(nrp // recv_block, recv_block),
            rvpad(nonres).reshape(nrp // recv_block, recv_block),
        ),
        batch_size=4,
    )
    cnames = ("ax", "ay", "az", "visc", "gx", "gy", "gz", "gp")
    recvC = {k: v.reshape(nrp)[:n] for k, v in zip(cnames, outs_c)}
    return rowB, recvC
