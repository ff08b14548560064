"""Sharded masked cell-tile engine: z-slab decomposition + ppermute halos.

The reference is single-process (SURVEY.md §2: no distributed backend
exists there); round 1's shard layer all_gathered the full particle set
per force eval — correct, but per-chip memory and work grew with total N.
This module shards the TILE GRID itself so per-chip state is the slab the
chip owns plus a fixed-depth halo:

*   The driver partitions the tile grid's z-layers into contiguous slabs,
    one per device, balanced by particle count (plan_slabs). Particles are
    permuted into a (n_dev, n_loc) padded row layout; ownership is frozen
    for one chunk (re-planned between chunks, where the driver already
    re-sizes the grid from the evolving h).
*   The domain half-width — and hence the cell edge s — is FROZEN for the
    chunk (plan margin covers drift). A breathing grid would change every
    particle's layer index; a frozen one bounds per-step layer drift by
    the CFL bound itself: |v| dt <= 0.3 h <= 0.15 s, so `halo` layers
    cover a whole chunk and certification catches the rest.
*   Each force eval does TWO ppermute halo exchanges over the ICI ring:
    positions/velocities/masses-of-existence before the k-th-distance
    phase, and the phase-A outputs (h, rho, P/rho^2, cs) the reverse mask
    needs afterwards. Multi-hop rings (hops > 1) cover slabs thinner than
    the halo+stencil reach; buffers are fixed-size (`budget`) and
    certified against overflow.
*   Within a device the hot loops are the SAME gather/scatter/top_k-free
    masked tile sweeps as the single-chip engine (physics/tiles.py): slot
    planes, 3x3-stacked candidate slices, 4-ary count bisection for the
    exact r_Kh (h = r_Kh/2, polytrope_hydroKDTree.jl:151), forward+reverse
    masked pair terms for the symmetric scatter (hydroCalculation,
    polytrope_hydroKDTree.jl:229-245).
*   Far-field gravity: "exact" runs the pure-Newtonian all-pairs sweep as
    a ring — each chip rotates the other slabs' (pos, mask) blocks through
    over ICI (the ring-attention-shaped systolic pattern, SURVEY.md §2) —
    with the tiles' in-slab (softened - Newtonian) correction completing
    the reference's softened interaction exactly. "p3m" deposits local
    mass CIC onto the global mesh, psums the (small, N-independent) mesh,
    and every chip runs the FFT solve redundantly — far cheaper than
    sharding the FFT at these mesh sizes — plus the in-tile 5^3 tail
    correction (physics/mesh_gravity.py).

Certification is collective: slot overflow, per-row k-found, halo-budget
and drift bounds are psum-reduced so every chip agrees. A failed
evaluation FREEZES the chunk (state stops advancing, steps report
cert_fail); the host re-plans the slabs and reruns the remaining steps —
a stale plan costs a re-plan round trip, never physics.

Tests: tests/test_shard_tiles.py pins sharded == unsharded (both gravity
modes) on the 8-virtual-device CPU mesh.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.config import EngineConfig, Params
from ..kernels import W, grad_W_over_r, softened_gphi_over_r, softened_phi
from ..physics.mesh_gravity import _cic, greens_hat, newton_minus_mesh

AXIS = "dp"


# ---------------------------------------------------------------------------
# Host-side slab planning
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class SlabPlan:
    """Static geometry of one chunk's slab decomposition (part of the
    compile key) plus the host-side layout arrays (not traced)."""

    grid: int  # tile cells per edge
    cap: int  # slots per cell
    lz_max: int  # thickest slab, layers
    halo: int  # drift halo depth, layers
    hops: int  # ring hops per direction per exchange
    budget: int  # halo-exchange rows per (direction, hop)
    n_loc: int  # padded rows per device
    n_dev: int
    half: float  # frozen domain half-width (code units)
    # host arrays (numpy; not part of the compile key)
    z0s: np.ndarray = dataclasses.field(compare=False)  # (n_dev+1,) layer bounds
    order: np.ndarray = dataclasses.field(compare=False)  # (n_dev*n_loc,) row -> global id, -1 pad

    @property
    def static_key(self):
        return (
            self.grid, self.cap, self.lz_max, self.halo, self.hops,
            self.budget, self.n_loc, self.n_dev,
        )


def plan_slabs(
    pos_code: np.ndarray,
    h: np.ndarray,
    kh: int,
    n_dev: int,
    *,
    chunk_steps: int = 10,
    safety: float = 1.05,
    cap_max: int = 256,
    headroom: float = 1.25,
    slots_max: int = 12_000_000,
) -> Optional[SlabPlan]:
    """Choose (grid, cap, slabs, halo, hops, budget) for one chunk.

    Mono-level sizing (cell edge >= safety * 2 * max h, the same
    certification bound as physics/tiles.py choose_tile_params); slab
    boundaries balance particle counts. Returns None when the state cannot
    certify (capacity, geometry) — the caller uses the gather formulation.
    """
    pos_code = np.asarray(pos_code)
    h = np.asarray(h)
    n = pos_code.shape[0]

    # frozen domain: a small margin keeps chunk-long drift inside the box
    # (per-step drift <= 0.15 cell edges by the CFL bound); escapes fail
    # certification and trigger a host re-plan, never wrong physics
    half = float(np.abs(pos_code).max()) * (1.0 + 1e-6) * 1.02

    g = max(int(2.0 * half / (safety * 2.0 * float(h.max()))), 2)
    if g < n_dev:  # fewer layers than devices: no slab per chip
        return None
    s = 2.0 * half / g
    c = np.clip((pos_code + half) // s, 0, g - 1).astype(np.int64)
    cells = (c[:, 2] * g + c[:, 1]) * g + c[:, 0]
    cmax = int(np.bincount(cells, minlength=g**3).max())
    layer_counts = np.bincount(c[:, 2], minlength=g)

    geo = plan_slabs_from_hists(
        n, half, g, layer_counts, cmax, n_dev,
        chunk_steps=chunk_steps, cap_max=cap_max, headroom=headroom,
        slots_max=slots_max,
    )
    if geo is None:
        return None
    z0s, n_loc = geo["z0s"], geo["n_loc"]

    dev_of = np.searchsorted(z0s, c[:, 2], side="right") - 1
    order = np.full(n_dev * n_loc, -1, dtype=np.int64)
    for p in range(n_dev):
        rows = np.flatnonzero(dev_of == p)
        order[p * n_loc : p * n_loc + rows.size] = rows

    return SlabPlan(
        grid=g, cap=geo["cap"], lz_max=geo["lz_max"], halo=geo["halo"],
        hops=geo["hops"], budget=geo["budget"], n_loc=n_loc, n_dev=n_dev,
        half=half, z0s=z0s, order=order,
    )


def plan_slabs_from_hists(
    n: int,
    half: float,
    g: int,
    layer_counts: np.ndarray,
    cmax: int,
    n_dev: int,
    *,
    chunk_steps: int = 10,
    cap_max: int = 256,
    headroom: float = 1.25,
    slots_max: int = 12_000_000,
):
    """Slab geometry from HISTOGRAMS only (no positions): the shared core
    of plan_slabs (single host: histograms from the full state) and the
    multi-host state-sharded planner (shard/mh_slabs.py: per-process
    local histograms summed by one small allgather). Every quantity —
    boundaries, capacities, halo budgets — is a pure function of the
    z-layer histogram and the max cell occupancy, so processes that
    agree on those sums derive the identical plan with no global
    positions anywhere. Returns a dict of geometry fields or None."""
    cap = max(32, int(-(-headroom * cmax // 32)) * 32)
    if cap > cap_max or g**3 * cap > slots_max:
        return None

    # balanced contiguous layer partition by particle count
    cum = np.concatenate([[0], np.cumsum(layer_counts)])
    z0s = np.zeros(n_dev + 1, dtype=np.int64)
    z0s[n_dev] = g
    for p in range(1, n_dev):
        target = n * p / n_dev
        # strictly increasing with >= 1 layer per device (g >= n_dev holds)
        z0s[p] = min(
            max(int(np.searchsorted(cum, target)), z0s[p - 1] + 1),
            g - (n_dev - p),
        )

    lzs = np.diff(z0s)
    lz_max = int(lzs.max())
    halo = max(1, math.ceil(0.155 * chunk_steps))

    def count_z(lo, hi):
        """Particles with layer in [lo, hi) — from the histogram."""
        lo = max(int(lo), 0)
        hi = min(int(hi), g)
        return int(cum[hi] - cum[lo]) if hi > lo else 0

    counts = np.array([count_z(z0s[p], z0s[p + 1]) for p in range(n_dev)])
    n_loc = int(-(-int(counts.max()) // 256) * 256)

    # ring reach: receiver q needs layers [z0_q - halo - 2,
    # z_end_q + halo + 2); sender p's rows stay within
    # [z0_p - halo, z_end_p + halo). hops = max |q - p| with overlap.
    hops = 1
    for q in range(n_dev):
        for p in range(n_dev):
            if p == q:
                continue
            lo_q, hi_q = z0s[q] - halo - 2, z0s[q + 1] + halo + 2
            lo_p, hi_p = z0s[p] - halo, z0s[p + 1] + halo
            if hi_p > lo_q and lo_p < hi_q:
                hops = max(hops, abs(q - p))

    # per-(direction, hop) send budget from the initial state + margin
    max_send = 0
    for r in range(1, hops + 1):
        for i in range(n_dev):
            if i + r < n_dev:  # up: i -> i+r
                thr = z0s[i + r] - halo - 2
                max_send = max(
                    max_send, count_z(max(thr, z0s[i]), z0s[i + 1])
                )
            if i - r >= 0:  # down: i -> i-r
                thr = z0s[i - r + 1] + halo + 2
                max_send = max(
                    max_send, count_z(z0s[i], min(thr, z0s[i + 1]))
                )
    budget = int(-(-int(max_send * 1.5 + 64) // 256) * 256)

    return {
        "cap": cap, "z0s": z0s, "lz_max": lz_max, "halo": halo,
        "hops": hops, "budget": budget, "n_loc": n_loc,
    }


def slab_plan_still_ok(
    plan: SlabPlan,
    pos_code: np.ndarray,
    h: np.ndarray,
    *,
    edge_margin: float = 1.02,
    budget_margin: float = 1.1,
) -> bool:
    """Compile-aware hysteresis forecast: can an ALREADY-COMPILED slab
    geometry still certify on the current state? A slab compile costs
    minutes (remote AOT) and plan_slabs re-derives grid/cap/budget from
    the drifted state every chunk — so any cached plan that passes this
    host-side check is reused instead (the in-engine collective
    certificate remains the safety net; a wrong forecast costs a frozen
    chunk + re-plan, never physics). Mirrors the in-engine checks of
    make_slab_force_eval: frozen-domain inbox, mono-level cell-edge bound,
    slot capacity, per-device ownership drift within the halo, and the
    halo-exchange send budgets."""
    pos_code = np.asarray(pos_code)
    h = np.asarray(h)
    n = pos_code.shape[0]
    if plan.order.size < n or (plan.order >= 0).sum() != n:
        return False
    if float(np.abs(pos_code).max()) * (1.0 + 1e-6) >= plan.half:
        return False
    g = plan.grid
    s = 2.0 * plan.half / g
    if 2.0 * float(h.max()) * edge_margin > s:
        return False
    c = np.clip((pos_code + plan.half) // s, 0, g - 1).astype(np.int64)
    cells = (c[:, 2] * g + c[:, 1]) * g + c[:, 0]
    if int(np.bincount(cells, minlength=g**3).max()) > plan.cap:
        return False
    # ownership drift: each frozen-owner row must sit within its device's
    # halo reach (the engine's drift_ok term)
    z0s, H = plan.z0s, plan.halo
    mask = plan.order >= 0
    dev_of_row = np.repeat(np.arange(plan.n_dev), plan.n_loc)[mask]
    zc = c[plan.order[mask], 2]
    lo = z0s[dev_of_row] - H
    hi = z0s[dev_of_row + 1] + H
    if not bool(np.all((zc >= lo) & (zc < hi))):
        return False
    # halo send budgets (the engine's send_ok term), with margin
    for r in range(1, plan.hops + 1):
        for i in range(plan.n_dev):
            own = dev_of_row == i
            if i + r < plan.n_dev:
                thr = z0s[i + r] - H - 2
                if int(np.sum(own & (zc >= thr))) * budget_margin > plan.budget:
                    return False
            if i - r >= 0:
                thr = z0s[i - r + 1] + H + 2
                if int(np.sum(own & (zc < thr))) * budget_margin > plan.budget:
                    return False
    return True


class SlabState(NamedTuple):
    """Chunk-local sharded state: (n_dev * n_loc) padded row layout."""

    pos: jnp.ndarray  # (n_dev*n_loc, 3)
    vel: jnp.ndarray
    K: jnp.ndarray  # (n_dev*n_loc,)
    valid: jnp.ndarray  # (n_dev*n_loc,) bool
    t: jnp.ndarray  # scalar


def pack_state(state, plan: SlabPlan, mesh: Mesh) -> SlabState:
    """Permute an engine State (host or device arrays) into the padded
    slab layout and place it sharded over the mesh."""
    pos = np.asarray(state.pos)
    vel = np.asarray(state.vel)
    K = np.asarray(state.K)
    o = plan.order
    safe = np.maximum(o, 0)
    valid = o >= 0
    sl = SlabState(
        pos=np.where(valid[:, None], pos[safe], 0.0).astype(pos.dtype),
        vel=np.where(valid[:, None], vel[safe], 0.0).astype(vel.dtype),
        K=np.where(valid, K[safe], 0.0).astype(K.dtype),
        valid=valid,
        t=np.asarray(state.t),
    )
    specs = SlabState(
        pos=P(AXIS, None), vel=P(AXIS, None), K=P(AXIS), valid=P(AXIS), t=P()
    )
    return jax.tree.map(
        lambda x, sp: jax.device_put(x, NamedSharding(mesh, sp)), sl, specs
    )


def unpack_rows(arr: np.ndarray, plan: SlabPlan, n: int) -> np.ndarray:
    """Invert the pack permutation for a (n_dev*n_loc, ...) output."""
    out = np.zeros((n,) + arr.shape[1:], arr.dtype)
    mask = plan.order >= 0
    out[plan.order[mask]] = arr[mask]
    return out


# ---------------------------------------------------------------------------
# Device-side force evaluation (runs under shard_map)
# ---------------------------------------------------------------------------


def _rank_in_cell(cid, n_cells, order_key=None):
    """Ranks 0.. within equal cid groups (cid >= n_cells rows are dropped
    by the caller); same argsort trick as physics/tiles._bin_particles."""
    n = cid.shape[0]
    order = jnp.argsort(cid)
    cid_s = cid[order]
    iota = lax.broadcasted_iota(jnp.int32, (n, 1), 0).squeeze(-1)
    newseg = jnp.concatenate([jnp.ones((1,), bool), cid_s[1:] != cid_s[:-1]])
    seg_start = lax.cummax(jnp.where(newseg, iota, 0))
    rank_s = iota - seg_start
    return jnp.zeros((n,), jnp.int32).at[order].set(rank_s)


def _select_rows(mask, budget, n_loc):
    """Fixed-size selection: rows (budget,) into [0, n_loc), valid flags,
    overflow bool."""
    rows = jnp.nonzero(mask, size=budget, fill_value=n_loc)[0].astype(jnp.int32)
    ok = jnp.sum(mask) <= budget
    return rows, rows < n_loc, ok


def _gather_rows(fields, rows, valid):
    """Stack (n_loc,) fields into a (budget, F) payload, zeros at pads."""
    safe = jnp.minimum(rows, fields[0].shape[0] - 1)
    cols = [jnp.where(valid, f[safe], 0.0) for f in fields]
    return jnp.stack(cols, axis=1)


def _ring_sendrecv(payloads_up, payloads_dn, n_dev, hops):
    """ppermute each hop's payload; returns (recv_up_from_below,
    recv_dn_from_above) lists, zeros where no partner exists."""
    recv = []
    for r in range(1, hops + 1):
        perm_up = [(i, i + r) for i in range(n_dev - r)]
        perm_dn = [(i, i - r) for i in range(r, n_dev)]
        recv.append(lax.ppermute(payloads_up[r - 1], AXIS, perm_up))
        recv.append(lax.ppermute(payloads_dn[r - 1], AXIS, perm_dn))
    return recv


def make_slab_force_eval(cfg: EngineConfig, plan: SlabPlan):
    """Per-device force evaluation closure. Call under shard_map as
    eval(params, z0s, half, pos_l, vel_l, K_l, valid_l, ghat) with local
    (n_loc,*) blocks; returns (acc, aux dict incl. phi, ok) for local
    rows. ok is collective (psum-reduced): False on ANY device's
    certification failure means the result must be discarded."""
    g = plan.grid
    cap = plan.cap
    H = plan.halo
    hops = plan.hops
    B = plan.budget
    n_loc = plan.n_loc
    n_dev = plan.n_dev
    kh = cfg.kh
    qz = plan.lz_max + 2 * H  # query layer extent per device
    Z = qz + 4  # plane z-extent: queries +-2 candidate layers
    gp = g + 2
    xslots = gp * cap
    p3m = cfg.gravity == "p3m"

    def eval_forces(p: Params, z0s_j, half, pos_l, vel_l, K_l, valid_l, ghat):
        dtype = pos_l.dtype
        dev = lax.axis_index(AXIS)
        z0 = z0s_j[dev]
        lz = z0s_j[dev + 1] - z0
        half = jnp.asarray(half, dtype)
        s = 2.0 * half / g
        big = jnp.asarray(jnp.finfo(dtype).max, dtype)

        # ---- frozen-domain + drift certification ----
        inbox = jnp.max(jnp.where(valid_l[:, None], jnp.abs(pos_l), 0.0)) < half
        cell = jnp.clip(
            jnp.floor((pos_l + half) / s).astype(jnp.int32), 0, g - 1
        )
        zc, yc, xc = cell[:, 2], cell[:, 1], cell[:, 0]
        zl = zc - (z0 - H - 2)  # plane-local layer, queries in [2, 2+qz)
        drift_ok = jnp.all(
            ~valid_l | ((zc >= z0 - H) & (zc < z0 + lz + H))
        )

        # ---- halo exchange 1: pos + vel ----
        ups, dns = [], []
        send_ok = jnp.asarray(True)
        sel = []  # (rows, rvalid) per hop-direction, reused for exchange 2
        fields1 = [
            pos_l[:, 0], pos_l[:, 1], pos_l[:, 2],
            vel_l[:, 0], vel_l[:, 1], vel_l[:, 2],
        ]
        zcf = zc
        for r in range(1, hops + 1):
            # up: partner dev+r needs zc >= z0s[dev+r] - H - 2
            pu = jnp.minimum(dev + r, n_dev)
            thr_u = z0s_j[pu] - H - 2
            mu = valid_l & (zcf >= thr_u) & (dev + r < n_dev)
            rows_u, rv_u, ok_u = _select_rows(mu, B, n_loc)
            pay_u = jnp.concatenate(
                [
                    _gather_rows(fields1, rows_u, rv_u),
                    rv_u[:, None].astype(dtype),
                ],
                axis=1,
            )
            # down: partner dev-r needs zc < z0s[dev-r+1] + H + 2
            pd = jnp.maximum(dev - r + 1, 0)
            thr_d = z0s_j[pd] + H + 2
            md = valid_l & (zcf < thr_d) & (dev - r >= 0)
            rows_d, rv_d, ok_d = _select_rows(md, B, n_loc)
            pay_d = jnp.concatenate(
                [
                    _gather_rows(fields1, rows_d, rv_d),
                    rv_d[:, None].astype(dtype),
                ],
                axis=1,
            )
            ups.append(pay_u)
            dns.append(pay_d)
            sel.append((rows_u, rv_u))
            sel.append((rows_d, rv_d))
            send_ok = send_ok & ok_u & ok_d

        recv = _ring_sendrecv(ups, dns, n_dev, hops)
        halo = jnp.concatenate(recv, axis=0)  # (2*hops*B, 7)
        hx, hy, hz = halo[:, 0], halo[:, 1], halo[:, 2]
        hvx, hvy, hvz = halo[:, 3], halo[:, 4], halo[:, 5]
        hval = halo[:, 6] > 0

        # halo slot assignment: local ranks first, halo ranks continue
        hcell = jnp.clip(
            jnp.floor(
                (jnp.stack([hx, hy, hz], axis=1) + half) / s
            ).astype(jnp.int32),
            0,
            g - 1,
        )
        hzl = hcell[:, 2] - (z0 - H - 2)
        n_cells = Z * g * g
        cid_l = jnp.where(
            valid_l & (zl >= 0) & (zl < Z),
            (zl * g + yc) * g + xc,
            n_cells,
        )
        rank_l = _rank_in_cell(cid_l, n_cells)
        counts = (
            jnp.zeros((n_cells + 1,), jnp.int32)
            .at[cid_l]
            .add(1, mode="drop")[:n_cells]
        )
        cid_h = jnp.where(
            hval & (hzl >= 0) & (hzl < Z),
            (hzl * g + hcell[:, 1]) * g + hcell[:, 0],
            n_cells,
        )
        rank_h = _rank_in_cell(cid_h, n_cells) + jnp.where(
            cid_h < n_cells, counts[jnp.minimum(cid_h, n_cells - 1)], 0
        )
        overflow = (
            jnp.max(jnp.where(cid_l < n_cells, rank_l, 0)) >= cap
        ) | (jnp.max(jnp.where(cid_h < n_cells, rank_h, 0)) >= cap)

        # padded-plane slot indices (one-cell y/x halo; z already padded)
        def slots(zl_, yc_, xc_, rank_, live):
            pz = jnp.where(live, zl_, Z)  # out-of-range rows drop
            py = yc_ + 1
            px = (xc_ + 1) * cap + jnp.minimum(rank_, cap - 1)
            return pz, py, px

        live_l = valid_l & (cid_l < n_cells)
        live_h = hval & (cid_h < n_cells)
        lz_p, ly_p, lx_p = slots(zl, yc, xc, rank_l, live_l)
        hz_p, hy_p, hx_p = slots(hzl, hcell[:, 1], hcell[:, 0], rank_h, live_h)

        plane_shape = (Z + 1, gp, xslots)  # +1 z row as the drop bin

        def to_plane(v_loc, v_halo):
            pl = jnp.zeros(plane_shape, dtype)
            pl = pl.at[lz_p, ly_p, lx_p].set(v_loc.astype(dtype), mode="drop")
            pl = pl.at[hz_p, hy_p, hx_p].set(v_halo.astype(dtype), mode="drop")
            return pl[:Z]

        zeros_h = jnp.zeros_like(hx)
        X = to_plane(pos_l[:, 0], hx)
        Y = to_plane(pos_l[:, 1], hy)
        Zp = to_plane(pos_l[:, 2], hz)
        VX = to_plane(vel_l[:, 0], hvx)
        VY = to_plane(vel_l[:, 1], hvy)
        VZ = to_plane(vel_l[:, 2], hvz)
        ones_l = jnp.ones((n_loc,), dtype)
        ones_h = jnp.ones_like(hx)
        CMASK = to_plane(ones_l, ones_h)  # candidate: local + halo
        QMASK = to_plane(ones_l, zeros_h)  # query: local only

        # ---- phase A: 4-ary bisected exact r_kh + density ----
        kf = jnp.asarray(float(kh), dtype)
        n_tiles = qz * g  # zchunk=1, ychunk=g, window=1

        def tile_slices(planes, t, depth):
            """(queries, stacked candidates) for tile t: query layer
            t//g (plane z = t//g + 2), x-window t%g, full y;
            depth^2 (z,y)-shifted candidate stacks of depth-cell x windows.
            Planes must carry depth//2 cells of y/x padding."""
            tz = t // g
            x0 = (t % g) * cap
            outs = []
            d2o = depth // 2
            for pl in planes:
                sub = lax.dynamic_slice(
                    pl,
                    (tz + 2 - d2o, 0, x0),
                    (depth, g + 2 * d2o, depth * cap),
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

        def phase_a(t):
            (qx, cx), (qy, cy), (qz_, cz_), (qm, cm), (qq, _) = tile_slices(
                (X, Y, Zp, CMASK, QMASK), t, 3
            )
            dx = qx[..., None] - cx[:, :, None, :]
            dy = qy[..., None] - cy[:, :, None, :]
            dz = qz_[..., None] - cz_[:, :, None, :]
            d2 = dx * dx + dy * dy + dz * dz
            valid = (cm[:, :, None, :] > 0) & (qm[..., None] > 0)
            d2m = jnp.where(valid, d2, big)
            hi0 = jnp.full(qm.shape, 1.001, dtype) * s * s
            lo0 = jnp.zeros(qm.shape, dtype)

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
                lo2 = jnp.where(
                    f1, lo, jnp.where(f2, t1, jnp.where(f3, t2, t3))
                )
                hi2 = jnp.where(
                    f1, t1, jnp.where(f2, t2, jnp.where(f3, t3, hi))
                )
                return lo2, hi2

            lo, hi = lax.fori_loop(0, 17, bis, (lo0, hi0))
            inw = d2m <= hi[..., None]
            rk2 = jnp.max(jnp.where(inw, d2m, 0.0), axis=-1)
            nfound = jnp.sum(d2m <= rk2[..., None], axis=-1)
            h_t = jnp.sqrt(rk2) / 2.0
            h_safe = jnp.where(h_t > 0, h_t, 1.0)
            w_k = W(jnp.sqrt(d2) / h_safe[..., None], h_safe[..., None])
            rho_t = p.m * jnp.sum(
                jnp.where(valid & (d2m <= rk2[..., None]), w_k, 0.0), axis=-1
            )
            row_ok = (qq <= 0) | ((nfound >= kh) & (jnp.sqrt(rk2) <= s))
            return h_t, rho_t, row_ok.astype(dtype)

        h_tiles, rho_tiles, ok_tiles = lax.map(
            phase_a, jnp.arange(n_tiles), batch_size=8
        )
        # (n_tiles, 1, g, cap) -> (qz, g, g*cap)
        def assemble(t):
            return jnp.transpose(
                t.reshape(qz, g, g, cap), (0, 2, 1, 3)
            ).reshape(qz, g, g * cap)

        Hg = assemble(h_tiles)
        RHOg = assemble(rho_tiles)
        rows_ok = jnp.all(assemble(ok_tiles) > 0)

        # per-row extraction (queries live at zl-2 in the assembled grid)
        ez = jnp.clip(zl - 2, 0, qz - 1)
        ex = xc * cap + jnp.minimum(rank_l, cap - 1)
        h_p = Hg[ez, yc, ex]
        rho_p = RHOg[ez, yc, ex]
        rho_safe = jnp.where(rho_p > 0, rho_p, 1.0)
        if cfg.eos == "polytropic":
            por2_p = K_l * rho_safe ** (p.gamma - 2.0)
            cs_p = jnp.sqrt(p.gamma * K_l * rho_safe ** (p.gamma - 1.0))
        else:
            por2_p = p.cs0**2 / rho_safe
            cs_p = jnp.full_like(rho_safe, p.cs0)

        # ---- halo exchange 2: phase-A outputs for the reverse mask ----
        fields2 = [h_p, rho_p, por2_p, cs_p]
        ups2 = [
            _gather_rows(fields2, sel[2 * (r - 1)][0], sel[2 * (r - 1)][1])
            for r in range(1, hops + 1)
        ]
        dns2 = [
            _gather_rows(fields2, sel[2 * (r - 1) + 1][0], sel[2 * (r - 1) + 1][1])
            for r in range(1, hops + 1)
        ]
        recv2 = _ring_sendrecv(ups2, dns2, n_dev, hops)
        halo2 = jnp.concatenate(recv2, axis=0)  # (2*hops*B, 4)

        def to_plane2f(v_loc, v_halo):
            pl = jnp.zeros(plane_shape, dtype)
            pl = pl.at[lz_p, ly_p, lx_p].set(v_loc.astype(dtype), mode="drop")
            pl = pl.at[hz_p, hy_p, hx_p].set(v_halo.astype(dtype), mode="drop")
            return pl[:Z]

        Hp = to_plane2f(h_p, halo2[:, 0])
        RK2p = to_plane2f((2.0 * h_p) ** 2, (2.0 * halo2[:, 0]) ** 2)
        RHOp = to_plane2f(rho_p, halo2[:, 1])
        POR2p = to_plane2f(por2_p, halo2[:, 2])
        CSp = to_plane2f(cs_p, halo2[:, 3])

        # ---- phase B: forces + near-gravity correction term 1 ----
        def phase_b(t):
            views = tile_slices(
                (X, Y, Zp, VX, VY, VZ, CMASK, QMASK, Hp, RK2p, RHOp,
                 POR2p, CSp),
                t, 3,
            )
            (qx, cx), (qy, cy), (qz_, cz_) = views[0:3]
            (qvx, cvx), (qvy, cvy), (qvz, cvz) = views[3:6]
            (qm, cm), (qq, _) = views[6:8]
            (qh, ch), (qrk2, crk2), (qrho, crho) = views[8:11]
            (qpor2, cpor2), (qcs, ccs) = views[11:13]

            dx = qx[..., None] - cx[:, :, None, :]
            dy = qy[..., None] - cy[:, :, None, :]
            dz = qz_[..., None] - cz_[:, :, None, :]
            d2 = dx * dx + dy * dy + dz * dz
            r = jnp.sqrt(d2)
            valid = (cm[:, :, None, :] > 0) & (qq[..., None] > 0)
            fwd = valid & (d2 <= qrk2[..., None])
            rev = valid & (d2 <= crk2[:, :, None, :])

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
            pi_fwd = (-p.alpha * qcs[..., None] * mu + p.beta * mu * mu) / rho_avg
            pi_rev = (
                -p.alpha * ccs[:, :, None, :] * mu + p.beta * mu * mu
            ) / rho_avg

            dwdr_q = grad_W_over_r(r / h_q, r, h_q)
            dwdr_c = grad_W_over_r(r / h_c, r, h_c)

            if cfg.eos == "polytropic":
                psum_t = qpor2[..., None] + cpor2[:, :, None, :]
                ct_fwd = p.m * (psum_t + pi_fwd) / 2.0
                ct_rev = p.m * (psum_t + pi_rev) / 2.0
            else:
                ct_fwd = p.m * (qpor2[..., None] + pi_fwd / 2.0)
                ct_rev = p.m * (cpor2[:, :, None, :] + pi_rev / 2.0)

            coeff = -jnp.where(fwd, ct_fwd * dwdr_q, 0.0) - jnp.where(
                rev, ct_rev * dwdr_c, 0.0
            )
            ax = jnp.sum(coeff * dx, axis=-1)
            ay = jnp.sum(coeff * dy, axis=-1)
            az = jnp.sum(coeff * dz, axis=-1)

            v_dot_dw_q = v_dot_r * dwdr_q
            v_dot_dw_c = v_dot_r * dwdr_c
            div_t = p.m * jnp.sum(jnp.where(fwd, v_dot_dw_q, 0.0), axis=-1)
            mu_max_t = jnp.max(jnp.where(fwd, mu, -big), axis=-1)
            visc_t = jnp.sum(
                jnp.where(fwd, p.m * pi_fwd * v_dot_dw_q / 2.0, 0.0)
                + jnp.where(rev, p.m * pi_rev * v_dot_dw_c / 2.0, 0.0),
                axis=-1,
            )

            r_safe = jnp.where(d2 > 0, r, 1.0)
            newt_g = jnp.where(d2 > 0, 1.0 / r_safe**3, 0.0)
            newt_p = jnp.where(d2 > 0, -1.0 / r_safe, 0.0)
            gmask = valid & (r <= 2.0 * h_avg)
            cgp = jnp.where(gmask, softened_gphi_over_r(r, h_avg) - newt_g, 0.0)
            cpp = jnp.where(gmask, softened_phi(r, h_avg) - newt_p, 0.0)
            ggx = p.m * jnp.sum(cgp * dx, axis=-1)
            ggy = p.m * jnp.sum(cgp * dy, axis=-1)
            ggz = p.m * jnp.sum(cgp * dz, axis=-1)
            gphi_t = p.m * jnp.sum(cpp, axis=-1)
            return (ax, ay, az, div_t, mu_max_t, visc_t, ggx, ggy, ggz, gphi_t)

        outs = lax.map(phase_b, jnp.arange(n_tiles), batch_size=8)
        (AXg, AYg, AZg, DIVg, MUg, VKg, GXg, GYg, GZg, GPg) = tuple(
            assemble(o) for o in outs
        )

        if p3m:
            # ---- phase C: (2W+1)^3 (Newtonian - mesh shape) tail ----
            # W = cfg.c_halfwidth tail-stencil half-width: 1 at the
            # default mesh_factor=10 (reuses phase A's 3^3 planes), 2 at
            # mesh_factor=5 (dedicated 2-cell-padded planes). The slab
            # halo reach is planned for W<=2 (plan_slabs' +2 terms).
            sigma = (s / cfg.mesh_factor) * cfg.sigma_cells
            c_hw = cfg.c_halfwidth
            if c_hw == 1:
                planes_c = (X, Y, Zp, CMASK, QMASK)
            else:
                gp2 = g + 2 * c_hw
                plane2_shape = (Z, gp2, gp2 * cap)

                def to_plane_c(v_loc, v_halo):
                    pl = jnp.zeros(plane2_shape, dtype)
                    pz_l = jnp.where(live_l, zl, Z + 9)
                    pz_h = jnp.where(live_h, hzl, Z + 9)
                    pl = pl.at[
                        pz_l,
                        yc + c_hw,
                        (xc + c_hw) * cap + jnp.minimum(rank_l, cap - 1),
                    ].set(v_loc.astype(dtype), mode="drop")
                    pl = pl.at[
                        pz_h,
                        hcell[:, 1] + c_hw,
                        (hcell[:, 0] + c_hw) * cap
                        + jnp.minimum(rank_h, cap - 1),
                    ].set(v_halo.astype(dtype), mode="drop")
                    return pl

                planes_c = (
                    to_plane_c(pos_l[:, 0], hx),
                    to_plane_c(pos_l[:, 1], hy),
                    to_plane_c(pos_l[:, 2], hz),
                    to_plane_c(ones_l, ones_h),
                    to_plane_c(ones_l, jnp.zeros_like(hx)),
                )

            def phase_c(t):
                (qx, cx), (qy, cy), (qz_, cz_), (cmq, cm), (qq, _) = (
                    tile_slices(planes_c, t, 2 * c_hw + 1)
                )
                dx = qx[..., None] - cx[:, :, None, :]
                dy = qy[..., None] - cy[:, :, None, :]
                dz = qz_[..., None] - cz_[:, :, None, :]
                d2 = dx * dx + dy * dy + dz * dz
                valid = (cm[:, :, None, :] > 0) & (qq[..., None] > 0)
                inv_r = lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
                cgp, cpp = newton_minus_mesh(d2, inv_r, sigma)
                cgp = jnp.where(valid, cgp, 0.0)
                cpp = jnp.where(valid, cpp, 0.0)
                return (
                    p.m * jnp.sum(cgp * dx, axis=-1),
                    p.m * jnp.sum(cgp * dy, axis=-1),
                    p.m * jnp.sum(cgp * dz, axis=-1),
                    p.m * jnp.sum(cpp, axis=-1),
                )

            cgx, cgy, cgz, cgp_ = lax.map(
                phase_c, jnp.arange(n_tiles), batch_size=8
            )
            GXg = GXg + assemble(cgx)
            GYg = GYg + assemble(cgy)
            GZg = GZg + assemble(cgz)
            GPg = GPg + assemble(cgp_)

        acc = jnp.stack(
            [AXg[ez, yc, ex], AYg[ez, yc, ex], AZg[ez, yc, ex]], axis=1
        )
        gcorr = jnp.stack(
            [GXg[ez, yc, ex], GYg[ez, yc, ex], GZg[ez, yc, ex]], axis=1
        )
        gphi_corr = GPg[ez, yc, ex]
        mu_p = MUg[ez, yc, ex]
        div_p = DIVg[ez, yc, ex]
        visc_p = VKg[ez, yc, ex]

        # ---- far-field gravity ----
        if p3m:
            g_far, phi_far = _p3m_mesh_sharded(
                pos_l, p.m * valid_l.astype(dtype), ghat, half,
                gm=cfg.mesh_factor * g, pad_n=_pad_for(cfg, g),
            )
        else:
            g_far, phi_far = _newton_ring(
                pos_l, valid_l, p.m, n_dev, dtype
            )
        g_tot = g_far + gcorr
        phi = phi_far + gphi_corr
        acc = acc - g_tot  # G = 1 in code units

        ok_local = inbox & drift_ok & send_ok & (~overflow) & rows_ok
        ok = (
            lax.psum(ok_local.astype(jnp.int32), AXIS) == n_dev
        )
        aux = dict(
            rho=rho_p, h=h_p, cs=cs_p, mu_max=mu_p, div_sum=div_p,
            visc_dk=visc_p, phi=phi,
        )
        return acc, aux, ok

    return eval_forces


def _pad_for(cfg: EngineConfig, grid: int) -> int:
    from ..physics.mesh_gravity import good_fft_size

    return good_fft_size(2 * (cfg.mesh_factor * grid + 2))


def _newton_ring(pos_l, valid_l, m, n_dev, dtype, block: int = 2048):
    """Pure-Newtonian all-pairs sweep as a ring over device blocks: the
    local block queries each rotating remote block (column-blocked), one
    cyclic ppermute per round. O(N^2 / n_dev) work and O(n_loc) memory
    per chip."""
    n_loc = pos_l.shape[0]
    nb = -(-n_loc // block) * block
    posp = jnp.pad(pos_l, ((0, nb - n_loc), (0, 0)))
    maskp = jnp.pad(valid_l.astype(dtype), (0, nb - n_loc))
    qx, qy, qzc = pos_l[:, 0:1], pos_l[:, 1:2], pos_l[:, 2:3]

    def one_block(carry, _):
        gx, gy, gz, ph, blk_pos, blk_m = carry

        def col(ci, acc2):
            gx2, gy2, gz2, ph2 = acc2
            px = lax.dynamic_slice(blk_pos[:, 0], (ci * block,), (block,))
            py = lax.dynamic_slice(blk_pos[:, 1], (ci * block,), (block,))
            pz = lax.dynamic_slice(blk_pos[:, 2], (ci * block,), (block,))
            pm = lax.dynamic_slice(blk_m, (ci * block,), (block,))
            dx = qx - px[None, :]
            dy = qy - py[None, :]
            dz = qzc - pz[None, :]
            d2 = dx * dx + dy * dy + dz * dz
            w = jnp.where((d2 > 0) & (pm[None, :] > 0), 1.0, 0.0)
            inv_r = lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
            inv_r3 = w * inv_r * inv_r * inv_r
            return (
                gx2 + jnp.sum(inv_r3 * dx, axis=1),
                gy2 + jnp.sum(inv_r3 * dy, axis=1),
                gz2 + jnp.sum(inv_r3 * dz, axis=1),
                ph2 - jnp.sum(w * inv_r, axis=1),
            )

        gx, gy, gz, ph = lax.fori_loop(0, nb // block, col, (gx, gy, gz, ph))
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        blk_pos = lax.ppermute(blk_pos, AXIS, perm)
        blk_m = lax.ppermute(blk_m, AXIS, perm)
        return (gx, gy, gz, ph, blk_pos, blk_m), None

    zero = jnp.zeros((n_loc,), dtype)
    (gx, gy, gz, ph, _, _), _ = lax.scan(
        one_block, (zero, zero, zero, zero, posp, maskp), None, length=n_dev
    )
    g_vec = m * jnp.stack([gx, gy, gz], axis=1)
    return g_vec, m * ph


def _p3m_mesh_sharded(pos_l, w_l, ghat, half, *, gm: int, pad_n: int):
    """Sharded mesh solve: local CIC deposit with per-row mass weights,
    psum of the (N-independent) mesh, replicated FFT solve, local
    interpolation. Mirrors physics/mesh_gravity.p3m_mesh_force."""
    dtype = pos_l.dtype
    a = 2.0 * half / gm
    idx, w = _cic(pos_l, half, a, pad_n)
    rho = jnp.zeros((pad_n * pad_n * pad_n,), dtype).at[idx.reshape(-1)].add(
        (w_l[:, None] * w).reshape(-1)
    )
    rho = lax.psum(rho, AXIS)
    rho_hat = jnp.fft.rfftn(rho.reshape(pad_n, pad_n, pad_n))
    phi_hat = rho_hat * ghat

    kfreq = (2.0 * jnp.pi) * jnp.fft.fftfreq(pad_n).astype(dtype)
    krfreq = (2.0 * jnp.pi) * jnp.fft.rfftfreq(pad_n).astype(dtype)
    kz = kfreq[:, None, None]
    ky = kfreq[None, :, None]
    kx = krfreq[None, None, :]

    phi_grid = jnp.fft.irfftn(phi_hat, s=(pad_n,) * 3).reshape(-1)
    gx_grid = jnp.fft.irfftn(1j * kx * phi_hat, s=(pad_n,) * 3).reshape(-1)
    gy_grid = jnp.fft.irfftn(1j * ky * phi_hat, s=(pad_n,) * 3).reshape(-1)
    gz_grid = jnp.fft.irfftn(1j * kz * phi_hat, s=(pad_n,) * 3).reshape(-1)

    def interp(grid):
        return jnp.sum(grid[idx] * w, axis=1)

    inv_a = 1.0 / a
    phi = interp(phi_grid) * inv_a
    g_vec = jnp.stack(
        [interp(gx_grid), interp(gy_grid), interp(gz_grid)], axis=1
    ) * (inv_a * inv_a)
    return g_vec.astype(dtype), phi.astype(dtype)


# ---------------------------------------------------------------------------
# Sharded step + chunk runner
# ---------------------------------------------------------------------------


def make_slab_chunk_runner(cfg: EngineConfig, plan: SlabPlan, mesh: Mesh):
    """Jitted chunk(slab_state, params, z0s, half, n_steps) -> (slab_state,
    stats (S,10), valid (S,), cert_fail (S,), h_rows, rho_rows). z0s and
    half are traced (the compile key is plan.static_key + n_steps only, so
    re-planned chunks with the same geometry reuse the compile).

    Steps freeze when t >= t_end OR when a force evaluation fails
    certification; cert_fail marks the latter so the host can re-plan the
    slabs and resume. Stats rows match polytrope_sim.jl:202."""
    eval_forces = make_slab_force_eval(cfg, plan)
    n_total = cfg.n
    n_dev = plan.n_dev

    def local_step(p, z0s_j, half, st: SlabState, ghat):
        pos_l, vel_l, K_l, valid_l = st.pos, st.vel, st.K, st.valid
        dtype = pos_l.dtype
        vf = valid_l.astype(dtype)
        acc, aux, ok1 = eval_forces(
            p, z0s_j, half, pos_l, vel_l, K_l, valid_l, ghat
        )

        big = jnp.asarray(jnp.finfo(dtype).max, dtype)

        def vmin(x):
            return lax.pmin(jnp.min(jnp.where(valid_l, x, big)), AXIS)

        vel_r2 = jnp.sum(vel_l * vel_l, axis=1)
        a_r = jnp.sqrt(jnp.sum(acc * acc, axis=1))
        rho_s = jnp.where(aux["rho"] > 0, aux["rho"], 1.0)
        abs_div = jnp.abs(-aux["div_sum"] / rho_s)
        dt = 0.3 * jnp.minimum(
            jnp.minimum(vmin(1.0 / abs_div), vmin(aux["h"] / jnp.sqrt(vel_r2))),
            jnp.minimum(
                vmin(jnp.sqrt(aux["h"] / a_r)),
                vmin(
                    aux["h"]
                    / (aux["cs"] + 1.2 * (p.alpha * aux["cs"] + p.beta * aux["mu_max"]))
                ),
            ),
        )

        T = 0.5 * p.m * lax.psum(jnp.sum(vf * vel_r2), AXIS)
        V = 0.5 * p.m * lax.psum(jnp.sum(vf * aux["phi"]), AXIS)
        if cfg.eos == "polytropic":
            U = p.m * lax.psum(
                jnp.sum(vf * K_l / (p.gamma - 1.0) * rho_s ** (p.gamma - 1.0)),
                AXIS,
            )
            Etot = T + V + U
        else:
            U = p.U0
            Etot = T + V + 2.0 * U
        r_com = lax.psum(jnp.sum(vf[:, None] * pos_l, axis=0), AXIS) / n_total
        p_lin = p.m * lax.psum(jnp.sum(vf[:, None] * vel_l, axis=0), AXIS)
        ang = p.m * lax.psum(
            jnp.sum(vf[:, None] * jnp.cross(pos_l - r_com, vel_l), axis=0),
            AXIS,
        )
        stats = jnp.stack(
            [
                st.t, T, V, U, Etot, r_com[0], r_com[1], r_com[2],
                jnp.sqrt(jnp.sum(p_lin**2)), jnp.sqrt(jnp.sum(ang**2)),
            ]
        )

        accm = acc * vf[:, None]
        pos_half = pos_l + vel_l * (dt / 2.0)
        vel_half = vel_l + accm * (dt / 2.0)
        if cfg.eos == "polytropic":
            K_l = K_l + (
                0.5 * (p.gamma - 1.0) / rho_s ** (p.gamma - 1.0) * aux["visc_dk"]
            ) * (dt / 2.0) * vf
        acc2, aux2, ok2 = eval_forces(
            p, z0s_j, half, pos_half, vel_half, K_l, valid_l, ghat
        )
        rho2_s = jnp.where(aux2["rho"] > 0, aux2["rho"], 1.0)
        if cfg.eos == "polytropic":
            K_l = K_l + (
                0.5 * (p.gamma - 1.0) / rho2_s ** (p.gamma - 1.0) * aux2["visc_dk"]
            ) * (dt / 2.0) * vf
        acc2m = acc2 * vf[:, None]
        vel_new = vel_l + acc2m * dt
        pos_new = pos_l + vel_new * dt - 0.5 * acc2m * dt**2
        st2 = SlabState(pos_new, vel_new, K_l, valid_l, st.t + dt)
        return st2, stats, aux2["h"], aux2["rho"], ok1 & ok2

    state_specs = SlabState(
        pos=P(AXIS, None), vel=P(AXIS, None), K=P(AXIS), valid=P(AXIS), t=P()
    )
    param_specs = jax.tree.map(
        lambda _: P(), Params(*([0] * len(Params._fields)))
    )

    def chunk_local(st, p, z0s_j, half, n_steps):
        dtype = st.pos.dtype
        ghat = (
            greens_hat(_pad_for(cfg, plan.grid), cfg.sigma_cells, dtype)
            if cfg.gravity == "p3m"
            else None
        )
        h0 = jnp.zeros((st.pos.shape[0],), dtype)

        def body(carry, _):
            stc, alive, h, rho = carry
            cont = alive & (stc.t < p.t_end)

            def do(args):
                s_, h_, rho_ = args
                s2, stats, h2, rho2, ok = local_step(p, z0s_j, half, s_, ghat)
                # a failed certification must not commit the step
                s3 = jax.tree.map(
                    lambda a, b: jnp.where(ok, a, b), s2, s_
                )
                return (s3, ok, jnp.where(ok, h2, h_), jnp.where(ok, rho2, rho_),
                        stats, ok)

            def skip(args):
                s_, h_, rho_ = args
                return (s_, alive, h_, rho_,
                        jnp.zeros((10,), dtype), jnp.asarray(True))

            s3, alive2, h2, rho2, stats, ok = lax.cond(
                cont, do, skip, (stc, h, rho)
            )
            executed = cont & ok
            cert_fail = cont & ~ok
            return (s3, alive2 & alive, h2, rho2), (stats, executed, cert_fail)

        (st_out, _, h_last, rho_last), (stats, valid, cert) = lax.scan(
            body, (st, jnp.asarray(True), h0, h0), None, length=n_steps
        )
        return st_out, stats, valid, cert, h_last, rho_last

    @functools.partial(jax.jit, static_argnames=("n_steps",))
    def chunk(st: SlabState, p: Params, z0s_j, half, n_steps: int):
        inner = jax.shard_map(
            functools.partial(chunk_local, n_steps=n_steps),
            mesh=mesh,
            in_specs=(state_specs, param_specs, P(), P()),
            out_specs=(state_specs, P(), P(), P(), P(AXIS), P(AXIS)),
            check_vma=False,
        )
        return inner(st, p, z0s_j, half)

    return chunk
