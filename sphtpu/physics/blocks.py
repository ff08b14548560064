"""Block-compact SPH engine: packed queries, per-row reach windows.

Third-generation neighbor engine (gather -> strips/mlevel -> blocks).
The strip engines sweep (g, cap)-shaped slot planes; measured on the
deep-collapse fixture they execute ~88x more pair slots than the true
row x stencil-occupancy work (query slots are mostly padding, candidate
slots are capacity-padded). This engine sweeps COMPACT work instead:

*   Rows are packed densely in two orders: the QUERY order (sorted by
    per-row candidate-requirement class, then by fine cell, so each
    consecutive B=128-row block is capacity-homogeneous and spatially
    local) and the CANDIDATE order (sorted by h octave, then by that
    octave's cell, so any axis-aligned cell box of one octave is a short
    list of contiguous index runs).
*   Every row gets its OWN reach window: a per-octave axis-aligned cell
    box covering max(own kNN ball * margin, the P3M tail radius) — and
    nothing else. There are no levels, no slot capacities, no opaque
    cells, no graze routing, no O(B*N) residual lane, and no rev-reach
    coverage (covering each octave's max r_k was measured to inflate
    the tables 10-50x past the true ~230-720 rows a query needs) —
    arbitrary h contrast only changes per-row box sizes.
*   A block's candidate list is the union of its rows' boxes, padded to
    a menu capacity C_b. The host ships only the per-block per-octave
    BOXES (6 ints each); the engine materializes the index list from
    the octave prefix tables on device (searchsorted run expansion) —
    refreshes move KBs, not index tables.
*   One pair sweep per phase: phase A (4-ary bisected exact k-th
    distance + density, per-query certified reach), phase B (SPH pair
    forces + the softened / mesh-tail gravity corrections in the same
    sweep — there is no separate phase C). Every pair term is computed
    in the BALL OWNER's sweep: the reference's "rev" term equals the
    owner's fwd term (owner's kernel, owner's-cs viscosity), so the
    owner emits both endpoints' contributions — its own by tile
    reduction, the partner's by a per-bucket scatter-add through the
    candidate index tables. Gravity pair terms carry two-sided
    ownership weights (0.5/0.5 when both rows see the pair, 1/0 when
    only one does) so each pair integrates exactly once.

Exactness is certified per evaluation, like the strip engines
(tiles.py/mlevel.py): host boxes are built with drift margins
proportional to each row's OWN r_k (the CFL bound: |v| dt <= 0.3 h), and
the engine re-checks, per row x octave, that the found r_k and the tail
radius fit inside the planned coverage minus the octave's measured max
drift. A False certificate falls back to the gather engine via lax.cond
— stale plans cost speed, never correctness.

Reference parity: the pair physics is the same fwd/rev symmetrized kNN
scatter as polytrope_hydroKDTree.jl:222-248 / isothermal at :219-245
(see physics/mlevel.py, whose phase-B formulas this matches term for
term; the owner-sweep factoring is an algebraic regrouping, verified at
f64 roundoff against the gather oracle); gravity corrections as in
tiles.py (softened - Newton, or Newton - mesh-shape for P3M,
Hockney-Eastwood).
"""

from __future__ import annotations

import functools
import math
import os
import threading
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..kernels import W, grad_W_over_r, softened_gphi_over_r, softened_phi
from .mesh_gravity import newton_minus_mesh
from .tiles import ReducedForces

# query rows per block: one (B, C_b) pair tile per mapped step. Smaller
# blocks give tighter candidate unions (fewer swept slots) but lose more
# to per-block fixed costs; 128 measured best on the deep-collapse
# fixture (64: 2.36 s/eval, 32: 3.37 s/eval, 128: 1.71 s/eval).
BQ = int(os.environ.get("SPHTPU_BLOCKS_BQ", "128"))
# octave grid sizing: cell edge ~ OCT_CF * the octave's max ball, grids
# clipped to OCT_GMAX. Finer grids cut box-quantization dilation (the
# swept box snaps outward to cell edges); the prefix tables stay small
# (OCT_GMAX^3 ints).
OCT_CF = float(os.environ.get("SPHTPU_BLOCKS_OCT_CF", "0.33"))
OCT_GMAX = int(os.environ.get("SPHTPU_BLOCKS_OCT_GMAX", "128"))
# candidate-capacity menu (block lists pad to the smallest fitting
# entry). Every entry is a multiple of the grouped phase-B chunk width
# (kernels/pallas_grouped_pairs.CW = 512) so a block's candidate list is
# a whole number of consecutive chunks — 768 was dropped for this
# (blocks needing 513-768 pad to 1024; measured plan inflation < 2% on
# the deep fixture, vs one merged kernel launch for the whole eval).
C_MENU = (512, 1024, 1536, 2048, 3072, 4096, 6144, 8192, 12288,
          16384, 24576, 32768)
# own-ball margin on the r_k hint: covers h growth between refreshes
# (measured <= ~5%/step in deep collapse) + both partners' CFL drift
# (0.15 r_k per step each). Boxes are built for one ML_SUBCHUNK (2 steps).
R_OWN_MARGIN = 1.45
# refit margin ladder (block_args_for_spec): full margin first, then
# mild degradation — keeping the compiled spec with a narrower drift
# headroom beats a mid-collapse replan (fresh multi-minute compile);
# the per-eval certificate still guards correctness. Rungs below ~1.30
# were measured to backfire on the deep-collapse fixture (round-4
# diag): the surviving headroom no longer covers one sub-chunk of
# peak-rate drift, so the cert fails mid-window and every failure
# costs a gather-fallback eval ~4x the block eval (12.8k vs 50.0k
# ps/s). Placement-driven refit failures are instead absorbed by the
# top-bucket slot reserve in plan_blocks.
REFIT_MARGINS = (R_OWN_MARGIN, 1.38, 1.30)
# block-list granularity (shard divisibility and compile-key stability)
BLK_GRAN = 8


# lax.map batching of the per-block sweeps (vmaps BMAP blocks per loop
# iteration — wider shapes keep the VPU fed); dev-tunable for profiling
BMAP = int(os.environ.get("SPHTPU_BLOCKS_BMAP", "4"))
# dev knob: "a" skips phase B (phase-A-only timing), "b" skips the
# phase-A bisection work (rough B-only timing); unset = full
_PHASE = os.environ.get("SPHTPU_BLOCKS_PHASE", "")
# phase B Pallas kernel (kernels/pallas_block_pairs.py): after the
# planar-coordinate refactor it beats the XLA formulation on the
# deep-collapse fixture (1.10 vs 1.38 s/eval exact-gravity, round-4
# profile) — default ON wherever the phase-A kernel runs (TPU + f32);
# SPHTPU_BLOCKS_PB=0 forces XLA, =1 forces the kernel. Correctness
# pinned by tests/test_blocks.py::test_blocks_pallas_phase_b_matches_xla
_PB_ENV = os.environ.get("SPHTPU_BLOCKS_PB", "")

# h-hint bisection seed factor: the previous eval's h bounds the k-th
# distance within a few %/step (CFL-limited drift), so the bisection
# interval can start at (HINT_F * 2 h_hint)^2 instead of the coverage
# reach (which spans the whole DOMAIN for edge/tail-radius rows). The
# cap is certification-safe: if the true r_k outgrew it, the bisection
# undershoots, nfound < kh, and the row fails the exactness certificate
# (gather fallback) — never a silently wrong ball.
HINT_F = 1.5
# binary bisection passes for the hint-seeded Pallas phase A: interval /
# ulp(r_k^2) <= HINT_F^4 * 2^23 ~ 2^25.4 at f32; 28 passes with margin
# (the unseeded domain-spanning interval needed 44)
N_BISECT_HINT = 28


class BlockArgs(NamedTuple):
    """Per-chunk traced arguments (shapes static per spec; contents
    refresh every sub-chunk with no recompile)."""

    order_q: jnp.ndarray  # (Nq_pad,) int32 row id per packed query slot (N = pad)
    order_c: jnp.ndarray  # (N,) int32 row id per packed candidate slot
    pos_ref: jnp.ndarray  # (N, 3) plan-time positions (candidate order)
    half_ref: jnp.ndarray  # () plan-time domain half-edge
    boxes: tuple  # per bucket: (n_blocks_b, n_oct, 6) int32 octave cell boxes
    starts: tuple  # per octave: (g_o, g_o, g_o + 1) int32 absolute prefix


# BlockSpec (hashable compile key, carried in EngineConfig.blocks):
#   ( buckets,     # ((C_b, n_blocks_b), ...) ascending C
#     oct_grids,   # (g_o, ...) per octave, fine -> coarse
#     runs_xy,     # per bucket: per octave: (NX, NY) static max box extents
#     g_mesh,      # P3M mesh anchor grid (mesh cells = mesh_factor * g_mesh)
#   )


# ---------------------------------------------------------------------------
# Host planner
# ---------------------------------------------------------------------------


def _snap_up(menu, v):
    for c in menu:
        if c >= v:
            return c
    return None


def _ceil_to(x, k):
    return ((x + k - 1) // k) * k


# grid-size menu for compile-key stability: octave grids and the fine
# grid snap to these, so slow drift in max/typical r_k does not produce
# a new spec (and a fresh multi-minute compile) every chunk
GRID_MENU = (2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 80,
             96, 112, 128)


def _snap_grid(g):
    for m in GRID_MENU:
        if m >= g:
            return m
    return GRID_MENU[-1]


def _geometry(pos, h, oct_grids, gf, *, gravity, mesh_factor, sigma_cells,
              margin=R_OWN_MARGIN):
    """State-dependent planning geometry for FIXED grids: candidate
    packing (order_c + per-octave prefix tables), per-row octave boxes,
    and an O(1) box-count oracle. Shared by plan_blocks (fresh spec) and
    block_args_for_spec (refresh into a compiled spec). `margin` scales
    the own-ball coverage term (refits degrade it stepwise to keep a
    drifted state inside the compiled bucket shapes — see
    block_args_for_spec)."""
    n = pos.shape[0]
    rk = 2.0 * h
    half = float(np.abs(pos).max()) * (1 + 1e-6) + 1e-30
    n_oct = len(oct_grids)
    rk_min = float(rk.min())
    edges = rk_min * (2.0 ** np.arange(1, n_oct))
    oct_id = np.searchsorted(edges, rk, side="right").astype(np.int32)

    if gravity == "p3m":
        r_c = 4.4 * sigma_cells * (2.0 * half / (mesh_factor * gf))
    else:
        r_c = 0.0

    # per-row coverage radius: own kNN ball (with drift/growth margin)
    # union the P3M tail radius. NO rev-reach term: reverse-ball pair
    # terms are computed inside the ball OWNER's sweep and scattered to
    # the partner (the rev term equals the owner's fwd term — owner's
    # kernel, owner's-cs viscosity — so the owner emits both endpoints'
    # contributions). Covering each octave's max r_k here instead was
    # measured to inflate the candidate tables 10-50x past the true
    # ~230-720 rows a query needs on the deep-collapse fixture.
    R_req = np.maximum(rk * margin, r_c)  # (n,)

    # candidate packing: (octave, octave-cell) sort; per-octave prefix
    counts_o, starts_np = [], []
    order_c = np.empty(n, np.int64)
    base = 0
    for o, g_o in enumerate(oct_grids):
        rows_o = np.flatnonzero(oct_id == o)
        s_o = 2.0 * half / g_o
        c = np.clip(((pos[rows_o] + half) / s_o).astype(np.int64), 0, g_o - 1)
        cid = (c[:, 0] * g_o + c[:, 1]) * g_o + c[:, 2]  # x-major: z fastest
        srt = np.argsort(cid, kind="stable")
        order_c[base : base + rows_o.size] = rows_o[srt]
        cnt = np.bincount(cid, minlength=g_o**3)
        st = np.zeros(g_o**3 + 1, np.int64)
        st[1:] = np.cumsum(cnt)
        st += base
        # reshape to (x, y, z+1): starts[x, y, z0]..starts[x, y, z1+1]
        starts_np.append(
            np.concatenate(
                [st[:-1].reshape(g_o, g_o, g_o), st[1:].reshape(g_o, g_o, g_o)[:, :, -1:]],
                axis=2,
            ).astype(np.int32)
        )
        counts_o.append(cnt.reshape(g_o, g_o, g_o))
        base += rows_o.size

    # summed-area tables per octave for O(1) box counts (int32: values
    # are bounded by n; halves the cumsum+indexing traffic, measured the
    # hottest part of a refresh)
    prefixes = []
    for o, g_o in enumerate(oct_grids):
        P = np.zeros((g_o + 1, g_o + 1, g_o + 1), np.int32)
        core = P[1:, 1:, 1:]
        np.cumsum(counts_o[o], axis=0, dtype=np.int32, out=core)
        np.cumsum(core, axis=1, out=core)
        np.cumsum(core, axis=2, out=core)
        prefixes.append(P)

    def boxcount(o, lo, hi):
        P = prefixes[o]
        x0, y0, z0 = lo[:, 0], lo[:, 1], lo[:, 2]
        x1, y1, z1 = hi[:, 0] + 1, hi[:, 1] + 1, hi[:, 2] + 1
        return (
            P[x1, y1, z1] - P[x0, y1, z1] - P[x1, y0, z1] - P[x1, y1, z0]
            + P[x0, y0, z1] + P[x0, y1, z0] + P[x1, y0, z0] - P[x0, y0, z0]
        )

    # per-row octave boxes + C requirement (one box family: phases A and
    # B share the same candidate tables)
    row_lo, row_hi = [], []
    creq = np.zeros(n, np.int64)
    for o, g_o in enumerate(oct_grids):
        s_o = 2.0 * half / g_o
        lo = np.clip(((pos - R_req[:, None] + half) / s_o).astype(np.int64), 0, g_o - 1)
        hi = np.clip(((pos + R_req[:, None] + half) / s_o).astype(np.int64), 0, g_o - 1)
        row_lo.append(lo)
        row_hi.append(hi)
        creq += boxcount(o, lo, hi)

    if int(creq.max()) > C_MENU[-1]:
        return None

    # spatial-first query order: Morton code of the fine cell, so every
    # consecutive BQ-row block is a tight spatial patch and its union
    # bounding box stays close to the rows' own boxes (a class-first sort
    # was measured to scatter same-class rows across the domain — shell
    # blocks' bounding boxes swallowed the core)
    s_f = 2.0 * half / gf
    cf = np.clip(((pos + half) / s_f).astype(np.int64), 0, gf - 1)
    order_q = np.argsort(_morton3(cf), kind="stable")

    # blocks: consecutive BQ rows of order_q; a block whose union box
    # count blows the capacity menu (Morton jumps occasionally group
    # distant patches) is recursively split and its pieces padded.
    # The common case (every full block fits) is fully vectorized — this
    # runs on every sub-chunk refresh, so python-per-block was a real
    # tax (~0.35 s/refresh at N=1e5)
    nb_full = (n + BQ - 1) // BQ
    oq2d = np.concatenate(
        [order_q, np.repeat(order_q[-1:], nb_full * BQ - n)]
    ).reshape(nb_full, BQ)  # union-neutral padding (duplicate last row)
    lo_all = [row_lo[o][oq2d].min(axis=1) for o in range(n_oct)]
    hi_all = [row_hi[o][oq2d].max(axis=1) for o in range(n_oct)]
    cnt_all = sum(
        boxcount(o, lo_all[o], hi_all[o]) for o in range(n_oct)
    )

    def union_count(rows):
        lo = [row_lo[o][rows].min(0) for o in range(n_oct)]
        hi = [row_hi[o][rows].max(0) for o in range(n_oct)]
        cnt = sum(
            int(boxcount(o, lo[o][None], hi[o][None])[0])
            for o in range(n_oct)
        )
        return cnt, lo, hi

    groups = []  # (rows, cnt, lo, hi)

    def emit(rows):
        cnt, lo, hi = union_count(rows)
        if cnt <= C_MENU[-1] or rows.size <= 1:
            if cnt > C_MENU[-1]:
                raise _PlanInfeasible()
            groups.append((rows, cnt, lo, hi))
        else:
            mid = rows.size // 2
            emit(rows[:mid])
            emit(rows[mid:])

    over = np.flatnonzero(cnt_all > C_MENU[-1])
    try:
        for b in over:
            emit(order_q[b * BQ : min((b + 1) * BQ, n)])
    except _PlanInfeasible:
        return None

    n_ok = nb_full - over.size
    n_blocks = n_ok + len(groups)
    oq = np.full(n_blocks * BQ, n, np.int64)
    blk_lo = [np.empty((n_blocks, 3), np.int64) for _ in oct_grids]
    blk_hi = [np.empty((n_blocks, 3), np.int64) for _ in oct_grids]
    blk_cnt = np.zeros(n_blocks, np.int64)
    blk_ext = np.zeros((n_blocks, n_oct, 2), np.int64)
    keep = np.setdiff1d(np.arange(nb_full), over, assume_unique=True)
    oq_keep = oq2d[keep]
    # sentinel out the duplicate-padding of the (kept) last block
    if keep.size and keep[-1] == nb_full - 1 and n % BQ:
        oq_keep[-1, n % BQ :] = n
    oq[: n_ok * BQ] = oq_keep.reshape(-1)
    blk_cnt[:n_ok] = cnt_all[keep]
    for o in range(n_oct):
        blk_lo[o][:n_ok] = lo_all[o][keep]
        blk_hi[o][:n_ok] = hi_all[o][keep]
        blk_ext[:n_ok, o, 0] = hi_all[o][keep, 0] - lo_all[o][keep, 0] + 1
        blk_ext[:n_ok, o, 1] = hi_all[o][keep, 1] - lo_all[o][keep, 1] + 1
    for k, (rows, cnt, lo, hi) in enumerate(groups):
        b = n_ok + k
        oq[b * BQ : b * BQ + rows.size] = rows
        blk_cnt[b] = cnt
        for o in range(n_oct):
            blk_lo[o][b] = lo[o]
            blk_hi[o][b] = hi[o]
            blk_ext[b, o] = (hi[o][0] - lo[o][0] + 1, hi[o][1] - lo[o][1] + 1)
    return {
        "n": n, "half": half, "order_c": order_c, "starts": starts_np,
        "oq": oq, "n_blocks": n_blocks, "blk_lo": blk_lo, "blk_hi": blk_hi,
        "blk_cnt": blk_cnt, "blk_ext": blk_ext, "pos": pos,
    }


def _pack_bucket_boxes(pad_ids, blk_lo, blk_hi, n_oct):
    """Box array for one bucket's (possibly sentinel-padded) block list."""
    bx = np.zeros((pad_ids.size, n_oct, 6), np.int32)
    for k, b in enumerate(pad_ids):
        for o in range(n_oct):
            if b < 0:
                # sentinel block: empty box (hi < lo -> zero runs)
                bx[k, o] = (0, -1, 0, -1, 0, -1)
            else:
                bx[k, o] = (
                    blk_lo[o][b][0], blk_hi[o][b][0],
                    blk_lo[o][b][1], blk_hi[o][b][1],
                    blk_lo[o][b][2], blk_hi[o][b][2],
                )
    return bx


def _emit_args(spec, geo, assign):
    """BlockArgs for `spec` given the geometry and a per-bucket list of
    assigned block ids (each list sentinel-padded to the bucket's nb)."""
    n = geo["n"]
    n_oct = len(spec[1])
    boxes, oq_segs = [], []
    for pad_ids in assign:
        boxes.append(_pack_bucket_boxes(pad_ids, geo["blk_lo"], geo["blk_hi"], n_oct))
        for b in pad_ids:
            if b < 0:
                oq_segs.append(np.full(BQ, n, np.int64))
            else:
                oq_segs.append(geo["oq"][b * BQ : (b + 1) * BQ])
    return BlockArgs(
        order_q=np.concatenate(oq_segs).astype(np.int32),
        order_c=geo["order_c"].astype(np.int32),
        pos_ref=geo["pos"].astype(np.float64),
        half_ref=np.float64(geo["half"]),
        boxes=tuple(boxes),
        starts=tuple(geo["starts"]),
    )


def plan_blocks(
    pos,
    h,
    kh: int,
    *,
    gravity: str = "exact",
    mesh_factor: int = 5,
    sigma_cells: float = 2.2,
    fine_grid: int = 0,
    shards: int = 1,
    slots_max: float = 6e9,
):
    """Build (spec, BlockArgs-as-numpy) for the current state, or None
    when some block's requirement exceeds the C menu / slots_max (caller
    keeps the strip engines)."""
    pos = np.asarray(pos, np.float64)
    h = np.asarray(h, np.float64)
    rk = 2.0 * h
    half = float(np.abs(pos).max()) * (1 + 1e-6) + 1e-30

    # octaves over r_k (fine -> coarse), coarsest octaves merged so the
    # per-octave machinery stays bounded
    rk_min, rk_max = float(rk.min()), float(rk.max())
    n_oct = min(max(int(math.ceil(math.log2(rk_max / rk_min + 1e-12))) + 1, 1), 8)

    # per-octave grids: cell edge ~ OCT_CF x the octave's max ball so box
    # quantization dilation stays low; snapped to GRID_MENU for
    # compile-key stability
    edges = rk_min * (2.0 ** np.arange(1, n_oct))
    oct_id = np.searchsorted(edges, rk, side="right")
    oct_grids = []
    for o in range(n_oct):
        sel = oct_id == o
        scale = max(rk[sel].max() if sel.any() else 0.0, rk_min * 2.0**o)
        g_o = int(2.0 * half / (OCT_CF * scale)) if scale > 0 else 4
        oct_grids.append(_snap_grid(min(max(g_o, 2), OCT_GMAX)))
    oct_grids = tuple(oct_grids)

    gf = fine_grid if fine_grid else _snap_grid(_fine_grid_for(pos, h, half))

    geo = _geometry(
        pos, h, oct_grids, gf,
        gravity=gravity, mesh_factor=mesh_factor, sigma_cells=sigma_cells,
    )
    if geo is None:
        return None

    blk_cap = np.asarray([_snap_up(C_MENU, int(c)) for c in geo["blk_cnt"]])

    # bucket blocks by capacity; pad each bucket's block list
    gran = _lcm(BLK_GRAN, shards)
    caps_present = sorted(set(blk_cap.tolist()))
    buckets, runs_zy, assign = [], [], []
    total_slots = 0.0
    for cb in caps_present:
        ids = np.flatnonzero(blk_cap == cb)
        nb = max(_ceil_to(ids.size, gran), gran)
        # drift reserve: peak-rate h growth migrates blocks up-capacity
        # between refits, and placement failures concentrate in the
        # largest bucket (round-4 deep-peak refits died with the two top
        # buckets full and every mid bucket near-empty, deficit 1-2
        # slots). One spare granule of top-bucket slots lets
        # block_args_for_spec re-place the drifted state in the compiled
        # shapes instead of replanning; costs ~6% slot-work on the deep
        # fixture.
        if cb == caps_present[-1]:
            nb += gran
        pad_ids = np.concatenate([ids, np.full(nb - ids.size, -1, np.int64)])
        # static per-bucket max (x, y) box extents (z handled by runs),
        # padded one cell of drift headroom so a refreshed state's
        # slightly-wider boxes still fit the compiled shapes
        rz = []
        top = cb == caps_present[-1]
        for o in range(len(oct_grids)):
            # the top bucket is also the drift-reserve home for blocks
            # migrating up from ANY region, so its static extents cover
            # the global max (a refit-time migrator's box must fit the
            # compiled runs, not just its plan-time occupants')
            sel = slice(None) if top else ids
            nx = int(geo["blk_ext"][sel, o, 0].max()) if ids.size else 1
            ny = int(geo["blk_ext"][sel, o, 1].max()) if ids.size else 1
            g_o = oct_grids[o]
            rz.append((min(nx + 1, g_o), min(ny + 1, g_o)))
        buckets.append((int(cb), int(nb)))
        runs_zy.append(tuple(rz))
        assign.append(pad_ids)
        total_slots += nb * BQ * cb
    if total_slots > slots_max:
        return None

    spec = (tuple(buckets), oct_grids, tuple(runs_zy), int(gf))
    return spec, _emit_args(spec, geo, assign)


class _PlanInfeasible(Exception):
    pass


def _morton3(c):
    """Interleave 3x up-to-7-bit cell coords into a Morton key."""
    out = np.zeros(c.shape[0], np.int64)
    for bit in range(7):
        for ax in range(3):
            out |= ((c[:, ax] >> bit) & 1) << (3 * bit + ax)
    return out


def _fine_grid_for(pos, h, half):
    s = float(np.quantile(2.0 * np.asarray(h), 0.3))
    return int(min(max(int(2.0 * half / max(s, 1e-30)), 4), 64))


def _lcm(a, b):
    return a * b // math.gcd(a, b)


# why the last block_args_for_spec call returned None (diagnostics only).
# Thread-local so concurrent drivers (multi-chip / worker threads) cannot
# attribute a failure to the wrong refit; read via last_refit_fail().
_REFIT_TLS = threading.local()


def last_refit_fail():
    """Reason string for why this thread's last block_args_for_spec call
    returned None (None when it succeeded or was never called)."""
    return getattr(_REFIT_TLS, "reason", None)


def block_args_for_spec(pos, h, spec, *, gravity="exact", mesh_factor=5,
                        sigma_cells=2.2):
    """Refresh BlockArgs for an ALREADY-COMPILED spec from the current
    state, or None when the state no longer fits it (a block's
    requirement exceeds every bucket with a free slot, a box outgrows a
    bucket's static run extents, or the octave count changed). This is
    the compile hysteresis: grids and bucket shapes come from the spec;
    only the traced contents (packing, boxes, prefix tables) rebuild."""
    _REFIT_TLS.reason = None
    pos = np.asarray(pos, np.float64)
    h = np.asarray(h, np.float64)
    buckets, oct_grids, runs_zy, gf = spec
    rk = 2.0 * h
    rk_min, rk_max = float(rk.min()), float(rk.max())
    n_oct_now = min(
        max(int(math.ceil(math.log2(rk_max / rk_min + 1e-12))) + 1, 1), 8
    )
    if n_oct_now != len(oct_grids):
        _REFIT_TLS.reason = f"octaves {len(oct_grids)} -> {n_oct_now}"
        return None
    # margin ladder: full drift margin first; when the drifted state's
    # boxes no longer fit the compiled bucket shapes (peak-rate h drift
    # widens them), retry with stepwise-smaller own-ball margins instead
    # of replanning — a degraded margin only narrows the drift headroom
    # the per-eval certificate checks (worst case: a cert-gated gather
    # fallback for one sub-chunk), while a replan costs a fresh
    # multi-minute XLA compile mid-collapse (VERDICT r3 weak-2).
    for margin in REFIT_MARGINS:
        geo = _geometry(
            pos, h, oct_grids, gf,
            gravity=gravity, mesh_factor=mesh_factor,
            sigma_cells=sigma_cells, margin=margin,
        )
        if geo is None:
            _REFIT_TLS.reason = (
                f"geometry infeasible (creq/block-split over menu) "
                f"at margin {margin}"
            )
            continue
        # first-fit each block into the cheapest bucket it fits
        # (capacity, static run extents, free slots)
        cnt = geo["blk_cnt"]
        ext = geo["blk_ext"]
        slots_left = [nb for _, nb in buckets]
        assign_lists = [[] for _ in buckets]
        placed_all = True
        for b in np.argsort(-cnt):  # big blocks first: fewest homes
            placed = False
            for k, (cb, nb) in enumerate(buckets):
                if slots_left[k] == 0 or cnt[b] > cb:
                    continue
                if any(
                    ext[b, o, 0] > runs_zy[k][o][0]
                    or ext[b, o, 1] > runs_zy[k][o][1]
                    for o in range(len(oct_grids))
                ):
                    continue
                assign_lists[k].append(int(b))
                slots_left[k] -= 1
                placed = True
                break
            if not placed:
                _REFIT_TLS.reason = (
                    f"block unplaceable at margin {margin}: "
                    f"cnt={int(cnt[b])} ext={ext[b].tolist()} "
                    f"slots_left={slots_left} buckets={buckets} "
                    f"runs={runs_zy}"
                )
                placed_all = False
                break
        if not placed_all:
            continue
        assign = []
        for (cb, nb), ids in zip(buckets, assign_lists):
            pad = np.full(nb - len(ids), -1, np.int64)
            assign.append(np.concatenate([np.asarray(ids, np.int64), pad]))
        _REFIT_TLS.reason = None
        return _emit_args(spec, geo, assign)
    return None


# ---------------------------------------------------------------------------
# Device engine
# ---------------------------------------------------------------------------


def _bisect_rk(d2m, kf, hi0, lo0, passes, dtype):
    """4-ary count bisection for the k-th smallest masked distance (same
    scheme as tiles.py / mlevel.py phase A)."""
    def body(_, lohi):
        lo, hi = lohi
        span = hi - lo
        t1 = lo + 0.25 * span
        t2 = lo + 0.5 * span
        t3 = lo + 0.75 * span
        c1 = jnp.sum((d2m <= t1[..., None]).astype(dtype), axis=-1)
        c2 = jnp.sum((d2m <= t2[..., None]).astype(dtype), axis=-1)
        c3 = jnp.sum((d2m <= t3[..., None]).astype(dtype), axis=-1)
        ge1 = c1 >= kf
        ge2 = c2 >= kf
        ge3 = c3 >= kf
        new_lo = jnp.where(ge1, lo, jnp.where(ge2, t1, jnp.where(ge3, t2, t3)))
        new_hi = jnp.where(ge1, t1, jnp.where(ge2, t2, jnp.where(ge3, t3, hi)))
        return new_lo, new_hi
    lo, hi = lax.fori_loop(0, passes, body, (lo0, hi0))
    inw = d2m <= hi[..., None]
    rk2 = jnp.max(jnp.where(inw, d2m, 0.0), axis=-1)
    nfound = jnp.sum((d2m <= rk2[..., None]).astype(dtype), axis=-1)
    return rk2, nfound


def _cand_indices(box, starts_o_list, runs_zy_b, n_sentinel, C_b):
    """(C_b,) absolute packed-candidate indices for one block, built from
    its per-octave cell boxes by run expansion. box: (n_oct, 6) int32."""
    run_starts = []
    run_lens = []
    for o, starts_o in enumerate(starts_o_list):
        x0, x1, y0, y1, z0, z1 = (box[o, i] for i in range(6))
        NX, NY = runs_zy_b[o]
        g_o = starts_o.shape[0]
        dx = jnp.arange(NX, dtype=jnp.int32)
        dy = jnp.arange(NY, dtype=jnp.int32)
        xs = jnp.clip(x0 + dx, 0, g_o - 1)[:, None]
        ys = jnp.clip(y0 + dy, 0, g_o - 1)[None, :]
        live = ((x0 + dx)[:, None] <= x1) & ((y0 + dy)[None, :] <= y1)
        z0c = jnp.clip(z0, 0, g_o - 1)
        z1c = jnp.clip(z1 + 1, 0, g_o)
        st = starts_o[xs, ys, z0c]
        en = starts_o[xs, ys, z1c]
        ln = jnp.where(live & (z1 >= z0), en - st, 0)
        run_starts.append(st.reshape(-1))
        run_lens.append(ln.reshape(-1))
    run_starts = jnp.concatenate(run_starts)
    run_lens = jnp.concatenate(run_lens)
    cum = jnp.cumsum(run_lens)
    slot = jnp.arange(C_b, dtype=jnp.int32)
    # run-id per slot by scatter + cumulative max: each LIVE run scatters
    # its id at its start offset (live starts are distinct; dead runs
    # share a live successor's offset and are simply not scattered), and
    # a running max fills the ids forward. searchsorted here instead was
    # ~13 serial gather passes per slot — measured 0.82 s/eval on the
    # deep-collapse fixture, 55% of the whole force pass.
    off = cum - run_lens  # start offset of run i
    ids = jnp.arange(run_lens.shape[0], dtype=jnp.int32)
    pos_s = jnp.where(run_lens > 0, off, C_b)  # dead -> dropped (OOB)
    rid = jnp.zeros((C_b,), jnp.int32).at[pos_s].max(ids, mode="drop")
    rid = lax.associative_scan(jnp.maximum, rid)
    idx = run_starts[rid] + (slot - off[rid])
    return jnp.where(slot < cum[-1], idx, n_sentinel)


def _shard_slicer(axis, n_shards):
    """Per-bucket (b0, nb_s) block-list slice for this device (the whole
    list when unsharded)."""
    if axis is not None:
        shard_at = lax.axis_index(axis)

        def shard_blocks(nb):
            k = nb // n_shards
            return shard_at * k, k
    else:

        def shard_blocks(nb):
            return 0, nb

    return shard_blocks


class CandTables(NamedTuple):
    """Hoisted per-chunk index state for block_sph_forces.

    idx:    per-bucket (nb_s, C_b) candidate-ORDER indices (sentinel n)
    rows:   per-bucket (nb_s, C_b) particle-ROW ids (sentinel n) — the
            candidate-side accumulators scatter straight into row order
    inv_oq: (n,) packed-query slot of each row (order_q is injective on
            real rows), turning every query-side unpack into a GATHER
    """

    idx: tuple
    rows: tuple
    inv_oq: jnp.ndarray


def build_cand_tables(bargs: BlockArgs, spec, n, *, axis=None, n_shards=1):
    """CandTables for this device's slice of every bucket's block list.
    The tables depend only on the plan (boxes + prefix tables), not on
    the state, so chunk runners build them ONCE per sub-chunk outside
    the step scan and thread them into block_sph_forces via idx_tables —
    rebuilding them per force evaluation measured 0.2 s/eval on the
    deep-collapse fixture (0.82 s/eval with the searchsorted expansion
    the scatter+cummax replaced); XLA does not hoist the build out of
    the scan on its own."""
    buckets, oct_grids, runs_zy, _ = spec
    n_oct = len(oct_grids)
    shard_blocks = _shard_slicer(axis, n_shards)
    oc_pad = jnp.concatenate(
        [bargs.order_c.astype(jnp.int32), jnp.full((1,), n, jnp.int32)]
    )
    tables, rows = [], []
    for (C_b, nb), bx, rz in zip(buckets, bargs.boxes, runs_zy):
        b0, nb_s = shard_blocks(nb)
        b0 = jnp.asarray(b0, jnp.int32)
        z32 = jnp.zeros((), jnp.int32)
        boxes_s = lax.dynamic_slice(bx, (b0, z32, z32), (nb_s, n_oct, 6))
        idx = lax.map(
            lambda bb, C_b=C_b, rz=rz: _cand_indices(
                bb, bargs.starts, rz, n, C_b
            ),
            boxes_s,
            batch_size=min(32, nb_s),
        )
        tables.append(idx)
        rows.append(oc_pad[idx])
    oq = bargs.order_q
    inv_oq = (
        jnp.zeros((n,), jnp.int32)
        .at[oq]
        .set(jnp.arange(oq.shape[0], dtype=jnp.int32), mode="drop")
    )
    return CandTables(tuple(tables), tuple(rows), inv_oq)


@functools.partial(
    jax.jit,
    static_argnames=(
        "eos", "kh", "spec", "gravity", "mesh_factor", "sigma_cells",
        "axis", "n_shards", "pallas_a", "pallas_interpret", "grouped",
    ),
)
def block_sph_forces(
    pos,
    vel,
    m,
    K,
    h_hint,
    bargs: BlockArgs,
    *,
    eos: str,
    gamma,
    cs0,
    alpha,
    beta,
    kh: int,
    spec: tuple,
    gravity: str = "exact",
    mesh_factor: int = 5,
    sigma_cells: float = 2.2,
    axis: str = None,
    n_shards: int = 1,
    pallas_a: bool = None,
    pallas_interpret: bool = False,
    grouped: bool = None,
    idx_tables: tuple = None,
):
    """Block-compact force evaluation. Same contract as tile_sph_forces /
    mlevel_sph_forces: (ReducedForces, (gx, gy, gz, phi) near-gravity
    corrections, ok). ok False => caller falls back (gather engine).

    axis (under shard_map): work-sharding — inputs replicated, each of
    `n_shards` devices sweeps its contiguous slice of every bucket's
    block list, per-row outputs psum-combined (each real row is written
    by exactly one device; sentinel blocks contribute zeros).

    idx_tables: precomputed build_cand_tables output (this device's
    slice, same axis/n_shards) — chunk runners hoist the build out of
    the step scan; None rebuilds per call (standalone/test use)."""
    buckets, oct_grids, runs_zy, g_mesh = spec
    n = pos.shape[0]
    dtype = pos.dtype
    n_oct = len(oct_grids)
    kf = jnp.asarray(float(kh), dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    half_ref = jnp.asarray(bargs.half_ref, dtype)
    p3m = gravity == "p3m"

    # packed views, one sentinel row appended (index n)
    def padrow(a, fill=0.0):
        pad = jnp.full((1,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    oq = bargs.order_q  # (Nq_pad,) with sentinel n
    oc = bargs.order_c  # (N,)
    posp = padrow(pos.astype(dtype), 0.0)
    pq = posp[oq]  # (Nq_pad, 3)
    pc = pos[oc]  # (N, 3)
    vq = padrow(vel.astype(dtype))[oq]
    vc = vel[oc]
    qmask = (oq < n).astype(dtype)
    # planar packed-query coordinates: pair tiles work on per-axis
    # (BQ, C_b) planes ((X, 3)-trailing arrays lane-pad 3->128 on TPU,
    # same lesson as physics/gravity.py)
    pqx, pqy, pqz = pq[:, 0], pq[:, 1], pq[:, 2]
    vqx, vqy, vqz = vq[:, 0], vq[:, 1], vq[:, 2]

    # drift since plan, per octave segment (candidate order is octave-major;
    # octave segment ends are the last entries of each prefix table)
    pref = jnp.asarray(bargs.pos_ref, dtype)
    drift_c = jnp.sqrt(jnp.sum((pc - pref[oc]) ** 2, axis=1))
    oct_end = jnp.stack([s[-1, -1, -1] for s in bargs.starts])  # (n_oct,)
    slot_ids = jnp.arange(n, dtype=jnp.int32)
    oct_of_slot = jnp.searchsorted(oct_end, slot_ids, side="right").astype(jnp.int32)
    dmax_o = jnp.stack([
        jnp.max(jnp.where(oct_of_slot == o, drift_c, 0.0)) for o in range(n_oct)
    ])  # (n_oct,)

    # shard slicer over each bucket's block list
    shard_blocks = _shard_slicer(axis, n_shards)

    # ---- phase A: exact r_k + rho per packed-query row ----
    Hq = jnp.zeros((oq.shape[0],), dtype)
    RHOq = jnp.zeros((oq.shape[0],), dtype)
    rows_ok = jnp.asarray(True)

    s_os = [2.0 * half_ref / g_o for g_o in oct_grids]

    def covered_radii(qx, qy, qz, qm, box):
        """(B, n_oct) guaranteed-coverage radius of each query against its
        block's octave box (0 where the box is empty/sentinel). A box side
        sitting on the grid edge covers to infinity on that side: binning
        CLIPS positions into the grid, so the edge cells own all space
        beyond them — nothing can exist outside the grid."""
        covs = []
        for o in range(n_oct):
            s_o = s_os[o]
            g_o = oct_grids[o]
            x0, x1, y0, y1, z0, z1 = (box[o, i] for i in range(6))
            c = jnp.full(qx.shape, big, dtype)
            for q_ax, lo_i, hi_i in ((qx, x0, x1), (qy, y0, y1), (qz, z0, z1)):
                lo = lo_i.astype(dtype) * s_o - half_ref
                hi = (hi_i.astype(dtype) + 1.0) * s_o - half_ref
                d_lo = jnp.where(lo_i == 0, big, q_ax - lo)
                d_hi = jnp.where(hi_i == g_o - 1, big, hi - q_ax)
                c = jnp.minimum(c, jnp.minimum(d_lo, d_hi))
            covs.append(
                jnp.where((x1 >= x0) & (qm > 0), jnp.maximum(c, 0.0), 0.0)
            )
        return jnp.stack(covs, axis=1)

    # per-bucket candidate index tables + bulk prestacked gathers: the
    # index build (run expansion) and HBM gathers run ONCE per bucket as
    # large flat ops; the mapped per-slab body then only slices — in-loop
    # per-block gathers measured ~0.5 s/eval slower (same lesson as the
    # strip engines' Pallas prestack)
    if idx_tables is None:
        # standalone/test use; chunk runners hoist this per sub-chunk
        idx_tables = build_cand_tables(
            bargs, spec, n, axis=axis, n_shards=n_shards
        )
    # ONE fused candidate-position row gather for ALL buckets: TPU
    # gather cost is per index row, so the 3-wide minor dim rides along
    # ~free — this replaces 3 per-bucket (nb_s * C_b)-row gathers
    # (measured the hottest glue around the pair kernels, round 5)
    idx_flat = jnp.concatenate([t.reshape(-1) for t in idx_tables.idx])
    cpos_flat = padrow(pc)[idx_flat]  # (T, 3)
    cmask_flat = (idx_flat < n).astype(dtype)  # (T,)
    cpos3 = cpos_flat.T  # (3, T): contiguous per-axis bucket slices
    blk_base = 0
    tab_base = 0
    bucket_geo = []  # (C_b, nb, b0, nb_s, q_base, idx_all, rows, boxes_s, cpre)
    for bi, ((C_b, nb), bx, rz) in enumerate(zip(buckets, bargs.boxes, runs_zy)):
        b0, nb_s = shard_blocks(nb)
        b0 = jnp.asarray(b0, jnp.int32)
        z32 = jnp.zeros((), jnp.int32)
        boxes_s = lax.dynamic_slice(bx, (b0, z32, z32), (nb_s, n_oct, 6))
        idx_all = idx_tables.idx[bi]  # (nb_s, C_b), hoisted per chunk
        t0, t1 = tab_base, tab_base + nb_s * C_b
        cpre = tuple(
            cpos3[a, t0:t1].reshape(nb_s, C_b) for a in range(3)
        ) + (cmask_flat[t0:t1].reshape(nb_s, C_b),)
        bucket_geo.append(
            (C_b, nb, b0, nb_s, blk_base, idx_all, idx_tables.rows[bi],
             boxes_s, cpre)
        )
        blk_base += nb * BQ
        tab_base = t1

    def qslab(arr, q_base, b0, nb_s, width=None):
        """Slice a packed-query array into (nb_s, BQ[, width]) slabs."""
        q0 = jnp.asarray(q_base + b0 * BQ, jnp.int32)
        if arr.ndim == 1:
            return lax.dynamic_slice(arr, (q0,), (nb_s * BQ,)).reshape(nb_s, BQ)
        return lax.dynamic_slice(
            arr, (q0, jnp.zeros((), jnp.int32)), (nb_s * BQ, arr.shape[1])
        ).reshape(nb_s, BQ, arr.shape[1])

    use_pallas = (
        pallas_a
        if pallas_a is not None
        else jax.default_backend() == "tpu" and dtype == jnp.float32
    )
    # phase B path choice (see _PB_ENV above): default follows the
    # phase-A kernel policy (TPU + f32), env-overridable either way;
    # pallas_interpret routes both kernels through interpret mode (CPU
    # parity tests)
    use_pallas_b = (
        pallas_interpret
        or _PB_ENV == "1"
        or (_PB_ENV != "0" and use_pallas)
    )

    # the true r_k never exceeds the domain diameter, and edge boxes
    # cover "to infinity" — so min(reach, diam) is a convergent
    # bisection seed AND an exact certification bound. The h-hint cap
    # (HINT_F * 2 h_hint) tightens it to the ball's own scale wherever a
    # hint exists (hintless rows keep the domain seed), which is what
    # lets the Pallas kernel run N_BISECT_HINT passes instead of 44.
    diam = 2.0 * jnp.sqrt(jnp.asarray(3.0, dtype)) * half_ref * 1.5
    hint_row = jnp.where(
        h_hint.astype(dtype) > 0,
        (HINT_F * 2.0) * h_hint.astype(dtype),
        diam,
    )
    hcapq = padrow(hint_row, 0.0)[oq]  # sentinel rows masked by qm
    if use_pallas or use_pallas_b:
        vcxp = padrow(vc[:, 0])
        vcyp = padrow(vc[:, 1])
        vczp = padrow(vc[:, 2])

    a_results = []
    for (C_b, nb, b0, nb_s, q_base, idx_all, rows_t, boxes_s, cpre) in bucket_geo:
        cxg, cyg, czg, cmg = cpre
        if use_pallas:
            # VMEM-resident kernel (kernels/pallas_strip_knn.py): d2 is
            # computed once on-chip per query block and the whole
            # bisection + density pass runs without re-streaming the
            # (BQ, C_b) tile from HBM — the XLA formulation below was
            # measured HBM-bound at ~1.1 s/eval on the deep-collapse
            # fixture (17 bisection passes re-reading d2m)
            from ..kernels.pallas_strip_knn import phase_a_cells

            qxs = qslab(pqx, q_base, b0, nb_s)  # (nb_s, BQ)
            qys = qslab(pqy, q_base, b0, nb_s)
            qzs = qslab(pqz, q_base, b0, nb_s)
            qms = qslab(qmask, q_base, b0, nb_s)
            cov = jax.vmap(covered_radii)(qxs, qys, qzs, qms, boxes_s)
            reach = jnp.maximum(
                jnp.min(
                    jnp.where(cov > 0, cov - dmax_o[None, None, :], big),
                    axis=-1,
                ),
                0.0,
            )
            qcap = qslab(hcapq, q_base, b0, nb_s)
            r2 = jnp.minimum(jnp.minimum(reach, diam), qcap) ** 2
            h_b, rho_b, ok_b = phase_a_cells(
                (qxs, qys, qzs, qms),
                r2,
                (cxg, cyg, czg, cmg),
                m,
                kh=kh,
                cap=BQ,
                # hint-seeded interval: resolves r_k^2 to f32 ulp in
                # N_BISECT_HINT passes (see HINT_F above); rows without a
                # hint keep the domain seed and would fail certification
                # if under-resolved — never wrong, only a fallback
                n_bisect=N_BISECT_HINT,
                interpret=pallas_interpret,
            )
            a_results.append((h_b, rho_b, ok_b, q_base, b0, nb_s, nb))
            continue

        def phase_a(slab):
            qx, qy, qz, qm, qcap, cx, cy, cz, cm, box = slab
            dx = qx[:, None] - cx[None, :]
            dy = qy[:, None] - cy[None, :]
            dz = qz[:, None] - cz[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            valid = (cm[None, :] > 0) & (qm[:, None] > 0)
            d2m = jnp.where(valid, d2, big)
            cov = covered_radii(qx, qy, qz, qm, box)  # (B, n_oct)
            reach = jnp.min(
                jnp.where(cov > 0, cov - dmax_o[None, :], big), axis=1
            )
            reach = jnp.maximum(reach, 0.0)
            hi0 = 1.001 * jnp.minimum(jnp.minimum(reach, diam), qcap) ** 2
            lo0 = jnp.zeros((BQ,), dtype)
            # enough passes to resolve the k-th distance to ulp even
            # when the seed spans the whole domain (edge/tail-radius
            # rows): 22 4-ary passes = 44 interval bits (f32), 34 = 68
            # (f64) — the strips' 17 was sized for a 1.5-cell seed
            passes = 22 if dtype == jnp.float32 else 34
            rk2, nfound = _bisect_rk(d2m, kf, hi0, lo0, passes, dtype)
            h_t = jnp.sqrt(rk2) / 2.0
            h_safe = jnp.where(h_t > 0, h_t, 1.0)
            w_k = W(jnp.sqrt(d2) / h_safe[:, None], h_safe[:, None])
            rho_t = m * jnp.sum(
                jnp.where(valid & (d2 <= rk2[:, None]), w_k, 0.0), axis=-1
            )
            row_ok = (qm <= 0) | (
                (nfound >= kf) & (rk2 <= reach * reach)
            )
            return h_t, rho_t, row_ok.astype(dtype)

        xs = (
            qslab(pqx, q_base, b0, nb_s),
            qslab(pqy, q_base, b0, nb_s),
            qslab(pqz, q_base, b0, nb_s),
            qslab(qmask, q_base, b0, nb_s),
            qslab(hcapq, q_base, b0, nb_s),
            cxg,
            cyg,
            czg,
            cmg,
            boxes_s,
        )
        h_b, rho_b, ok_b = lax.map(phase_a, xs, batch_size=BMAP)
        a_results.append((h_b, rho_b, ok_b, q_base, b0, nb_s, nb))

    # scatter phase-A outputs into packed-query arrays (contiguous slices
    # per bucket shard; under sharding each device writes its slice and
    # the psum at the end combines)
    for (h_b, rho_b, ok_b, q_base, b0, nb_s, nb) in a_results:
        q0 = q_base + b0 * BQ
        Hq = lax.dynamic_update_slice(Hq, h_b.reshape(-1), (q0,))
        RHOq = lax.dynamic_update_slice(RHOq, rho_b.reshape(-1), (q0,))
        rows_ok = rows_ok & jnp.all(ok_b > 0)

    # map packed-query results to row space (a gather by the hoisted
    # inverse packing permutation — order_q hits every row exactly
    # once), then to candidate space; under sharding a device reads 0
    # for rows it doesn't own and the psum fills them in
    n_rows = n
    Hrow = Hq[idx_tables.inv_oq]
    RHOrow = RHOq[idx_tables.inv_oq]
    if axis is not None:
        Hrow = lax.psum(Hrow, axis)
        RHOrow = lax.psum(RHOrow, axis)

    # EOS row fields
    rho_safe = jnp.where(RHOrow > 0, RHOrow, 1.0)
    if eos == "polytropic":
        P_row = K * rho_safe**gamma
        cs_row = jnp.sqrt(gamma * P_row / rho_safe)
    else:
        P_row = cs0 * cs0 * rho_safe
        cs_row = jnp.full((n_rows,), cs0, dtype)
    por2_row = P_row / (rho_safe * rho_safe)

    # candidate-order packed fields for phase B. The kNN ball radius
    # r_k = 2h is recomputed from h inside the pair tiles (2*h is exact
    # and (2h)^2 rounds identically wherever it is computed), so no rk2
    # field is packed or gathered.
    hc = Hrow[oc]
    rhoc = RHOrow[oc]
    por2c = por2_row[oc]
    hcp = padrow(hc)
    rhocp = padrow(rhoc, 1.0)
    por2cp = padrow(por2c)

    # query-order packed fields
    hq_full = padrow(Hrow)[oq]
    rhoq_full = padrow(RHOrow, 1.0)[oq]
    por2q_full = padrow(por2_row)[oq]
    csq_full = padrow(cs_row)[oq]

    if p3m:
        # sigma tied to the CURRENT domain scale, exactly like the mesh
        # deposit in p3m_mesh_force (a = 2 half_now / gm)
        half_now = jnp.max(jnp.abs(pos)) * (1.0 + 1e-6) + jnp.asarray(1e-30, dtype)
        sigma = sigma_cells * (2.0 * half_now / (mesh_factor * g_mesh))
        r_c_now = 4.4 * sigma
    else:
        sigma = None
        r_c_now = jnp.asarray(0.0, dtype)

    # ---- phase B: pair forces + gravity corrections, certs ----
    # Every pair term is computed in the BALL OWNER's sweep (fwd mask
    # only — there is no rev mask and no rev-reach coverage): the pair
    # algebra makes the partner's "rev" term equal the owner's own fwd
    # term (owner's kernel, owner's-cs viscosity, symmetric pressure
    # sum), so the owner emits BOTH endpoints' contributions — its own
    # by tile reduction, the partner's by a per-bucket scatter-add over
    # the candidate index tables. Gravity pair corrections use two-sided
    # ownership weights (0.5 when both rows see the pair, 1 when only
    # one does) so each pair integrates exactly once.
    # grouped phase B (kernels/pallas_grouped_pairs.py): ONE pallas
    # launch, ONE fused (T, 6) dynamic-field gather and ONE (T, 8)
    # scatter-add for ALL buckets — the per-bucket path below pays ~58
    # launches + ~10 per-field gathers per eval on the deep fixture
    # (VERDICT r4 next-2). Requires every C_b to be a multiple of the
    # chunk width (true for plans from the current C_MENU; legacy specs
    # with 768-capacity buckets fall back to the per-bucket path).
    from ..kernels.pallas_grouped_pairs import CW as _GCW

    use_grouped = (
        use_pallas_b
        and _PHASE != "a"
        and (
            grouped
            if grouped is not None
            else os.environ.get("SPHTPU_BLOCKS_GROUPED", "1") != "0"
        )
        and all(C_b % _GCW == 0 for C_b, _ in buckets)
    )

    names = ("ax", "ay", "az", "div", "mu", "visc", "gx", "gy", "gz", "gp")
    s_names = ("sax", "say", "saz", "svisc", "sgx", "sgy", "sgz", "sgp")
    packed = {
        k: (jnp.full((oq.shape[0],), -big, dtype) if k == "mu"
            else jnp.zeros((oq.shape[0],), dtype))
        for k in names
    }
    cacc = jnp.zeros((n + 1, 8), dtype)

    if use_grouped:
        from ..kernels.pallas_grouped_pairs import phase_b_grouped

        # dynamic candidate fields: ONE fused row gather (the positions
        # and mask were gathered once above, shared with phase A)
        dyn = jnp.stack(
            [vc[:, 0], vc[:, 1], vc[:, 2], hc, rhoc, por2c], axis=1
        )  # (N, 6) candidate order
        dyn_flat = padrow(dyn)[idx_flat]  # (T, 6)
        cstack = jnp.concatenate(
            [cpos_flat, dyn_flat, cmask_flat[:, None]], axis=1
        )  # (T, 10): x y z vx vy vz h rho por2 mask
        cstack = jnp.swapaxes(cstack.reshape(-1, _GCW, 10), 1, 2)

        # device-local packed-query slabs, bucket-major (same order as
        # the flat candidate table)
        qarrs = (pqx, pqy, pqz, vqx, vqy, vqz, qmask, hq_full,
                 rhoq_full, por2q_full, csq_full)
        qparts = [[] for _ in qarrs]
        qblk, first = [], []
        blk_off = 0
        for (C_b, nb, b0, nb_s, q_base, idx_all, rows_t, boxes_s, cpre) \
                in bucket_geo:
            for fi, arr in enumerate(qarrs):
                qparts[fi].append(qslab(arr, q_base, b0, nb_s))
            ck = C_b // _GCW
            for j in range(nb_s):
                qblk.extend([blk_off + j] * ck)
                first.extend([1] + [0] * (ck - 1))
            blk_off += nb_s
        qfields = tuple(jnp.concatenate(p, axis=0) for p in qparts)

        qouts, couts = phase_b_grouped(
            qfields, cstack, m, alpha, beta, sigma, r_c_now,
            eos=eos, p3m=p3m, cap=BQ, qblk=tuple(qblk),
            first=tuple(first), interpret=pallas_interpret,
        )

        # per-bucket certificates + writes into the packed-query arrays
        row_loc = 0
        for (C_b, nb, b0, nb_s, q_base, idx_all, rows_t, boxes_s, cpre) \
                in bucket_geo:
            sl = slice(row_loc, row_loc + nb_s)
            qxs, qys, qzs = (qfields[a][sl] for a in range(3))
            qms = qfields[6][sl]
            qhs = qfields[7][sl]
            cov = jax.vmap(covered_radii)(qxs, qys, qzs, qms, boxes_s)
            reach = jnp.maximum(
                jnp.min(
                    jnp.where(cov > 0, cov - dmax_o[None, None, :], big),
                    axis=-1,
                ),
                0.0,
            )
            need = jnp.maximum(2.0 * qhs, r_c_now)
            rows_ok = rows_ok & jnp.all((qms <= 0) | (need <= reach))
            q0 = q_base + b0 * BQ
            for k, qo in zip(names, qouts):
                packed[k] = lax.dynamic_update_slice(
                    packed[k], qo[sl].reshape(-1), (q0,)
                )
            row_loc += nb_s

        # ONE fused row-order scatter-add over the whole flat table
        rows_flat = jnp.concatenate(
            [r.reshape(-1) for r in idx_tables.rows]
        )
        upd = jnp.swapaxes(couts, 1, 2).reshape(-1, 8)  # (T, 8)
        cacc = cacc.at[rows_flat].add(upd)

    b_results = []
    for (C_b, nb, b0, nb_s, q_base, idx_all, rows_t, boxes_s, cpre) in (
            [] if use_grouped else bucket_geo):
        cxg, cyg, czg, cmg = cpre
        if use_pallas_b and _PHASE != "a":
            # VMEM-resident phase B (kernels/pallas_block_pairs.py): one
            # pass over the (BQ, C_b) pair tile produces all 10 query
            # reductions AND the 8 candidate scatter accumulators.
            # Default on TPU + f32 (see _PB_ENV above): measured 0.29
            # s/eval faster than the XLA formulation on the deep fixture
            from ..kernels.pallas_block_pairs import phase_b_blocks

            qxs = qslab(pqx, q_base, b0, nb_s)
            qys = qslab(pqy, q_base, b0, nb_s)
            qzs = qslab(pqz, q_base, b0, nb_s)
            qms = qslab(qmask, q_base, b0, nb_s)
            qhs = qslab(hq_full, q_base, b0, nb_s)
            qf = (
                qxs, qys, qzs,
                qslab(vqx, q_base, b0, nb_s),
                qslab(vqy, q_base, b0, nb_s),
                qslab(vqz, q_base, b0, nb_s),
                qms,
                qhs,
                qslab(rhoq_full, q_base, b0, nb_s),
                qslab(por2q_full, q_base, b0, nb_s),
                qslab(csq_full, q_base, b0, nb_s),
            )
            cf = (
                cxg, cyg, czg,
                vcxp[idx_all], vcyp[idx_all], vczp[idx_all],
                cmg, hcp[idx_all],
                rhocp[idx_all], por2cp[idx_all],
            )
            qouts, couts = phase_b_blocks(
                qf, cf, m, alpha, beta, sigma, r_c_now,
                eos=eos, p3m=p3m, cap=BQ, interpret=pallas_interpret,
            )
            # certificate (pair-tile-free; same as the XLA path's)
            cov = jax.vmap(covered_radii)(qxs, qys, qzs, qms, boxes_s)
            reach = jnp.maximum(
                jnp.min(
                    jnp.where(cov > 0, cov - dmax_o[None, None, :], big),
                    axis=-1,
                ),
                0.0,
            )
            need = jnp.maximum(2.0 * qhs, r_c_now)
            ok_b = ((qms <= 0) | (need <= reach)).astype(dtype)
            outs = qouts + (ok_b,) + couts
            b_results.append((outs, q_base, b0, nb_s, rows_t))
            continue

        # candidate-order packed fields (planar; cm/cx/cy/cz shared with
        # phase A via cpre — no re-gather, no mask gather at all)
        vcg = tuple(padrow(vc[:, a])[idx_all] for a in range(3))
        cand = (cxg, cyg, czg) + vcg + (
            cmg, hcp[idx_all], rhocp[idx_all], por2cp[idx_all],
        )
        qs = tuple(
            qslab(a, q_base, b0, nb_s)
            for a in (pqx, pqy, pqz, vqx, vqy, vqz, qmask, hq_full,
                      rhoq_full, por2q_full, csq_full)
        )

        def phase_b(slab):
            (qx, qy, qz, qvx, qvy, qvz, qm, qh, qrho, qpor2, qcs,
             cx, cy, cz, cvx, cvy, cvz, cm, ch, crho, cpor2, box) = slab

            dx = qx[:, None] - cx[None, :]
            dy = qy[:, None] - cy[None, :]
            dz = qz[:, None] - cz[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            r = jnp.sqrt(d2)
            valid = (cm[None, :] > 0) & (qm[:, None] > 0)

            # r_k = 2h recomputed in-tile: bit-identical to a packed rk2
            # ((2h)^2 rounds the same wherever it is squared)
            qrk2 = (2.0 * qh) ** 2
            fwd = valid & (d2 <= qrk2[:, None])

            h_q = jnp.where(qh > 0, qh, 1.0)[:, None]
            h_c = jnp.where(ch > 0, ch, 1.0)[None, :]
            h_avg = 0.5 * (h_q + h_c)
            rho_avg = jnp.where(valid, 0.5 * (qrho[:, None] + crho[None, :]), 1.0)

            dvx = qvx[:, None] - cvx[None, :]
            dvy = qvy[:, None] - cvy[None, :]
            dvz = qvz[:, None] - cvz[None, :]
            v_dot_r = dvx * dx + dvy * dy + dvz * dz
            mu = jnp.minimum(h_avg * v_dot_r / (d2 + 0.01 * h_avg**2), 0.0)
            # viscosity with the BALL OWNER's sound speed: this is
            # pi_fwd for the owner AND pi_rev for the partner (the
            # reference's rev term uses the ball owner's cs)
            pi_own = (-alpha * qcs[:, None] * mu + beta * mu * mu) / rho_avg

            dwdr_q = grad_W_over_r(r / h_q, r, h_q)

            if eos == "polytropic":
                ct_own = m * (qpor2[:, None] + cpor2[None, :] + pi_own) / 2.0
            else:
                # isothermal asymmetric ct: the receiver's P/rho^2 term
                # is the OWNER's por2 in the rev direction too
                # (reference polytrope/isothermal pair loops) — so one
                # owner-side coefficient serves both endpoints
                ct_own = m * (qpor2[:, None] + pi_own / 2.0)

            coeff = jnp.where(fwd, ct_own * dwdr_q, 0.0)
            cdx = coeff * dx
            cdy = coeff * dy
            cdz = coeff * dz
            ax = -jnp.sum(cdx, axis=-1)
            ay = -jnp.sum(cdy, axis=-1)
            az = -jnp.sum(cdz, axis=-1)
            # partner halves: acc_c += +coeff * d (direction flips)
            sax = jnp.sum(cdx, axis=0)
            say = jnp.sum(cdy, axis=0)
            saz = jnp.sum(cdz, axis=0)

            v_dot_dw_q = v_dot_r * dwdr_q
            div_t = m * jnp.sum(jnp.where(fwd, v_dot_dw_q, 0.0), axis=-1)
            mu_max_t = jnp.max(jnp.where(fwd, mu, -big), axis=-1)
            visc_pair = jnp.where(fwd, m * pi_own * v_dot_dw_q / 2.0, 0.0)
            visc_t = jnp.sum(visc_pair, axis=-1)
            svisc = jnp.sum(visc_pair, axis=0)

            # gravity corrections, each pair owned by whichever row(s)
            # can see it (vis = within the row's certified visibility
            # radius max(r_k, r_tail)); weights sum to exactly 1
            r_safe = jnp.where(d2 > 0, r, 1.0)
            newt_g = jnp.where(d2 > 0, 1.0 / r_safe**3, 0.0)
            newt_p = jnp.where(d2 > 0, -1.0 / r_safe, 0.0)
            gmask = valid & (r <= 2.0 * h_avg)
            cgp = jnp.where(gmask, softened_gphi_over_r(r, h_avg) - newt_g, 0.0)
            cpp = jnp.where(gmask, softened_phi(r, h_avg) - newt_p, 0.0)
            if p3m:
                inv_r = lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
                tg, tp = newton_minus_mesh(d2, inv_r, sigma)
                cgp = cgp + jnp.where(valid, tg, 0.0)
                cpp = cpp + jnp.where(valid, tp, 0.0)
            # visibility radii from 2h directly (both sides use the same
            # formula, so the per-pair ownership weights stay consistent
            # between the owner's and the partner's sweeps)
            vq_r = jnp.maximum(2.0 * qh, r_c_now)[:, None]
            vc_r = jnp.maximum(2.0 * ch, r_c_now)[None, :]
            w = jnp.where(
                r <= vq_r, jnp.where(r <= vc_r, 0.5, 1.0), 0.0
            )
            cgw = w * cgp
            cpw = w * cpp
            gwx = cgw * dx
            gwy = cgw * dy
            gwz = cgw * dz
            gx_t = m * jnp.sum(gwx, axis=-1)
            gy_t = m * jnp.sum(gwy, axis=-1)
            gz_t = m * jnp.sum(gwz, axis=-1)
            gp_t = m * jnp.sum(cpw, axis=-1)
            sgx = -m * jnp.sum(gwx, axis=0)
            sgy = -m * jnp.sum(gwy, axis=0)
            sgz = -m * jnp.sum(gwz, axis=0)
            sgp = m * jnp.sum(cpw, axis=0)

            # certificates: per row x octave coverage of the fwd ball
            # and the p3m tail radius, against measured drift
            cov = covered_radii(qx, qy, qz, qm, box)  # (B, n_oct)
            need = jnp.maximum(2.0 * qh, r_c_now)[:, None]
            ok_row = jnp.all(
                (qm[:, None] <= 0) | (need + dmax_o[None, :] <= cov),
                axis=1,
            )
            return (ax, ay, az, div_t, mu_max_t, visc_t, gx_t, gy_t, gz_t,
                    gp_t, ok_row.astype(dtype),
                    sax, say, saz, svisc, sgx, sgy, sgz, sgp)

        if _PHASE != "a":
            outs = lax.map(phase_b, qs + cand + (boxes_s,), batch_size=BMAP)
        else:
            outs = tuple(
                jnp.zeros((nb_s, BQ), dtype) for _ in range(11)
            ) + tuple(jnp.zeros((nb_s, C_b), dtype) for _ in range(8))
        b_results.append((outs, q_base, b0, nb_s, rows_t))

    # candidate-side accumulator, straight into ROW order (the hoisted
    # rows tables map table slots to particle rows; sentinel -> sink row
    # n), all 8 fields fused in the minor dim: ONE (M, 8) scatter-add
    # per bucket (or one TOTAL in the grouped path above). The previous
    # eight 1-D candidate-order scatters plus the permutation scatters
    # in unpack/scat were the force pass's hottest ops by far — the
    # round-4 device trace showed ~19 ms per 1-D scatter-add, together
    # more than half the dispatch (TPU scatter cost is per index ROW,
    # so the 8-wide minor dim rides along ~free).
    for (outs, q_base, b0, nb_s, rows_t) in b_results:
        q0 = q_base + b0 * BQ
        for k, o in zip(names, outs[:10]):
            packed[k] = lax.dynamic_update_slice(packed[k], o.reshape(-1), (q0,))
        rows_ok = rows_ok & jnp.all(outs[10] > 0)
        upd = jnp.stack([o.reshape(-1) for o in outs[11:]], axis=-1)
        cacc = cacc.at[rows_t.reshape(-1)].add(upd)

    # query-side unpack is a GATHER through the hoisted inverse packing
    # permutation (order_q hits every row exactly once, so the old
    # .at[oq].add/.max scatters were permutation-shaped; a sharded
    # device reads init values (0 / -big) for rows it doesn't own —
    # exactly what the psum/pmax downstream expects)
    inv_oq = idx_tables.inv_oq

    def unpack(a):
        return a[inv_oq]

    s_col = {k: i for i, k in enumerate(s_names)}

    def scat(k):
        return cacc[:n_rows, s_col[k]]

    acc = jnp.stack([
        unpack(packed["ax"]) + scat("sax"),
        unpack(packed["ay"]) + scat("say"),
        unpack(packed["az"]) + scat("saz"),
    ], axis=1)
    div_row = unpack(packed["div"])
    mu_row = unpack(packed["mu"])
    visc_row = unpack(packed["visc"]) + scat("svisc")
    ggx = unpack(packed["gx"]) + scat("sgx")
    ggy = unpack(packed["gy"]) + scat("sgy")
    ggz = unpack(packed["gz"]) + scat("sgz")
    gphi = unpack(packed["gp"]) + scat("sgp")

    if axis is not None:
        acc, div_row, visc_row, ggx, ggy, ggz, gphi = (
            lax.psum(t, axis) for t in
            (acc, div_row, visc_row, ggx, ggy, ggz, gphi)
        )
        mu_row = lax.pmax(mu_row, axis)
        rows_ok = jnp.all(lax.all_gather(rows_ok, axis))

    red = ReducedForces(
        acc=acc, rho=RHOrow, h=Hrow, cs=cs_row,
        mu_max=mu_row, div_sum=div_row, visc_dk=visc_row,
    )
    return red, (ggx, ggy, ggz, gphi), rows_ok
