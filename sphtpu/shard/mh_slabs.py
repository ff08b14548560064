"""State-sharded multi-host z-slab layer: N scales with processes.

Round 4's DCN layer (shard/multihost.py) kept the full particle state
REPLICATED on every process — a pod bought work parallelism only, and
max N stayed one host's RAM/HBM (VERDICT r4 missing-1). This module
shards the STATE itself across processes: each process's host memory
and devices only ever hold the slab rows its devices own (plus the
engine's fixed-size halo buffers), so maximum N scales with the number
of processes. The reference has no counterpart (it is single-process,
SURVEY.md §2); this is the distributed backend SURVEY.md §5 makes
first-class.

Design (three pieces, all reusing the single-host z-slab engine):

*   Planning is process-local + one small allgather. Every process
    computes HISTOGRAMS of its own rows — z-layer counts, per-cell
    occupancy max, max |pos|, max h — at the shared candidate grid;
    the histograms are summed across processes (two scalar+O(grid^3)
    `process_allgather` rounds, no positions anywhere), and every
    process derives the IDENTICAL SlabPlan deterministically from the
    sums via shard.tiles.plan_slabs_from_hists (the exact core the
    single-host planner runs — parity is by construction, pinned by
    tests/test_multihost.py).
*   pack/unpack touch only local rows. Each process fills only its
    addressable devices' (n_loc, ...) slab buffers from its local rows
    and assembles the global SlabState with
    jax.make_array_from_process_local_data; after a chunk it reads back
    only its addressable shards. No cross-process data motion outside
    the engine's own ppermute halos.
*   Row migration at plan boundaries is a bounded allgather of MOVERS
    only. Between plans, CFL drift moves a thin boundary film of rows
    across slab boundaries; each process keeps its stayers and ships
    only rows whose new owner is another process (padded to the max
    mover count, exchanged in one allgather); everyone keeps the movers
    that land in its new range. At bootstrap the same path shuffles an
    arbitrary initial distribution into slab ownership.

The chunk runner is the UNCHANGED z-slab engine
(shard.tiles.make_slab_chunk_runner) over the multi-host global mesh
(shard.multihost.global_mesh — process-major, so the per-step ppermute
boundary hops and psum diagnostics are the only DCN traffic).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .tiles import AXIS, SlabPlan, SlabState, plan_slabs_from_hists


class LocalRows(NamedTuple):
    """One process's particle rows (host numpy, any order). `gid` is the
    global particle id: it never leaves the host, and it is what lets
    snapshots / parity tests reassemble a globally-ordered state from
    per-process pieces."""

    pos: np.ndarray  # (nl, 3) float64
    vel: np.ndarray  # (nl, 3)
    K: np.ndarray  # (nl,)
    h: np.ndarray  # (nl,)
    gid: np.ndarray  # (nl,) int64


def _allgather_sum(arrs):
    """Sum each (same-shape-on-every-process) numpy array over processes
    with one allgather round. Single-process: returns inputs unchanged."""
    if jax.process_count() == 1:
        return list(arrs)
    from jax.experimental import multihost_utils

    flat = np.concatenate([np.asarray(a, np.float64).ravel() for a in arrs])
    summed = np.sum(
        np.asarray(multihost_utils.process_allgather(flat)), axis=0
    )
    out = []
    off = 0
    for a in arrs:
        a = np.asarray(a)
        out.append(summed[off : off + a.size].reshape(a.shape))
        off += a.size
    return out


def _allgather_max(vals):
    """Element-wise max of a small float vector over processes."""
    if jax.process_count() == 1:
        return np.asarray(vals, np.float64)
    from jax.experimental import multihost_utils

    return np.max(
        np.asarray(
            multihost_utils.process_allgather(
                np.asarray(vals, np.float64)
            )
        ),
        axis=0,
    )


def mh_plan_slabs(
    local: LocalRows,
    kh: int,
    n_dev: int,
    *,
    chunk_steps: int = 10,
    safety: float = 1.05,
    cap_max: int = 256,
    headroom: float = 1.25,
    slots_max: int = 12_000_000,
) -> Optional[SlabPlan]:
    """The multi-host twin of shard.tiles.plan_slabs: identical geometry
    (same half/grid/cap/z0s/budget formulas via plan_slabs_from_hists)
    derived from per-process histograms, with `order=None` — ownership
    is process-local (see mh_pack), never a global permutation array."""
    pos = np.asarray(local.pos, np.float64)
    h = np.asarray(local.h, np.float64)
    nl = pos.shape[0]

    maxes = _allgather_max(
        [
            float(np.abs(pos).max()) if nl else 0.0,
            float(h.max()) if nl else 0.0,
        ]
    )
    half = float(maxes[0]) * (1.0 + 1e-6) * 1.02
    hmax = float(maxes[1])
    g = max(int(2.0 * half / (safety * 2.0 * hmax)), 2)
    if g < n_dev:
        return None
    s = 2.0 * half / g
    c = np.clip((pos + half) // s, 0, g - 1).astype(np.int64)
    cells = (c[:, 2] * g + c[:, 1]) * g + c[:, 0]
    cell_counts = np.bincount(cells, minlength=g**3).astype(np.float64)
    layer_counts = np.bincount(c[:, 2], minlength=g).astype(np.float64)
    n_f = np.asarray([float(nl)])
    cell_counts, layer_counts, n_f = _allgather_sum(
        [cell_counts, layer_counts, n_f]
    )
    n = int(round(float(n_f[0])))
    cmax = int(round(float(cell_counts.max())))

    geo = plan_slabs_from_hists(
        n, half, g, layer_counts.astype(np.int64), cmax, n_dev,
        chunk_steps=chunk_steps, cap_max=cap_max, headroom=headroom,
        slots_max=slots_max,
    )
    if geo is None:
        return None
    return SlabPlan(
        grid=g, cap=geo["cap"], lz_max=geo["lz_max"], halo=geo["halo"],
        hops=geo["hops"], budget=geo["budget"], n_loc=geo["n_loc"],
        n_dev=n_dev, half=half, z0s=geo["z0s"],
        order=None,  # ownership is process-local in the multi-host mode
    )


def _dev_of_rows(pos: np.ndarray, plan: SlabPlan) -> np.ndarray:
    s = 2.0 * plan.half / plan.grid
    zc = np.clip((pos[:, 2] + plan.half) // s, 0, plan.grid - 1).astype(
        np.int64
    )
    return np.searchsorted(plan.z0s, zc, side="right") - 1


def _local_device_range(mesh: Mesh):
    """This process's contiguous [d0, d1) positions on the (process-major)
    mesh axis."""
    devs = mesh.devices.reshape(-1)
    mine = [i for i, d in enumerate(devs) if d.process_index == jax.process_index()]
    if not mine:
        return 0, 0
    d0, d1 = min(mine), max(mine) + 1
    assert d1 - d0 == len(mine), "mesh must be process-major (contiguous)"
    return d0, d1


def mh_migrate(local: LocalRows, plan: SlabPlan, mesh: Mesh) -> LocalRows:
    """Re-home rows to their owner process under `plan` with one bounded
    allgather of the movers. Stayers never leave the host; at steady
    state movers are the CFL-drift boundary film (a few % of rows), at
    bootstrap this same path shuffles any initial distribution."""
    d0, d1 = _local_device_range(mesh)
    dev = _dev_of_rows(np.asarray(local.pos, np.float64), plan)
    stay = (dev >= d0) & (dev < d1)
    movers = ~stay

    if jax.process_count() == 1:
        return local

    from jax.experimental import multihost_utils

    n_mov = int(movers.sum())
    max_mov = int(
        np.max(
            np.asarray(
                multihost_utils.process_allgather(
                    np.asarray([n_mov], np.int64)
                )
            )
        )
    )
    keep = LocalRows(*(np.asarray(f)[stay] for f in local))
    if max_mov == 0:
        return keep

    # one (n_proc, max_mov, 9) allgather: pos3 + vel3 + K + h + gid
    pack = np.zeros((max_mov, 9), np.float64)
    pack[:n_mov, 0:3] = local.pos[movers]
    pack[:n_mov, 3:6] = local.vel[movers]
    pack[:n_mov, 6] = local.K[movers]
    pack[:n_mov, 7] = local.h[movers]
    pack[:n_mov, 8] = local.gid[movers].astype(np.float64)
    # gid >= 0 always; -1 marks padding rows
    pack[n_mov:, 8] = -1.0
    all_pack = np.asarray(
        multihost_utils.process_allgather(pack)
    ).reshape(-1, 9)
    real = all_pack[:, 8] >= 0
    inc_pos = all_pack[real, 0:3]
    inc_dev = _dev_of_rows(inc_pos, plan)
    mine = (inc_dev >= d0) & (inc_dev < d1)
    inc = all_pack[real][mine]
    return LocalRows(
        pos=np.concatenate([keep.pos, inc[:, 0:3]]),
        vel=np.concatenate([keep.vel, inc[:, 3:6]]),
        K=np.concatenate([keep.K, inc[:, 6]]),
        h=np.concatenate([keep.h, inc[:, 7]]),
        gid=np.concatenate([keep.gid, inc[:, 8].astype(np.int64)]),
    )


class LocalLayout(NamedTuple):
    """Per-process slot assignment for one packed chunk: row i of the
    process-local buffer holds local-row index `src[i]` (or -1 pad)."""

    src: np.ndarray  # (local_ndev * n_loc,) int64 into LocalRows, -1 pad
    gid: np.ndarray  # (local_ndev * n_loc,) int64 global ids, -1 pad
    d0: int
    d1: int


def mh_pack(
    local: LocalRows, plan: SlabPlan, mesh: Mesh, dtype, t=0.0
) -> tuple[SlabState, LocalLayout]:
    """Global SlabState from process-LOCAL rows only: each process fills
    its own devices' (n_loc, ...) buffers and the global array is
    assembled shard-locally (jax.make_array_from_process_local_data) —
    at no point does any process materialize another process's rows.
    Rows must already be owned (mh_migrate)."""
    d0, d1 = _local_device_range(mesh)
    nd_loc = d1 - d0
    dev = _dev_of_rows(np.asarray(local.pos, np.float64), plan)
    assert bool(np.all((dev >= d0) & (dev < d1))), "rows not migrated"

    n_loc = plan.n_loc
    src = np.full(nd_loc * n_loc, -1, np.int64)
    for k, d in enumerate(range(d0, d1)):
        rows = np.flatnonzero(dev == d)
        if rows.size > n_loc:
            raise ValueError(
                f"device {d}: {rows.size} rows exceed n_loc={n_loc}"
            )
        src[k * n_loc : k * n_loc + rows.size] = rows
    valid = src >= 0
    safe = np.maximum(src, 0)

    def buf(a):
        a = np.asarray(a, dtype)
        out = a[safe]
        if out.ndim == 1:
            return np.where(valid, out, 0).astype(dtype)
        return np.where(valid[:, None], out, 0).astype(dtype)

    t_val = np.asarray(t, dtype)
    local_state = SlabState(
        pos=buf(local.pos), vel=buf(local.vel), K=buf(local.K),
        valid=valid, t=t_val,
    )
    specs = SlabState(
        pos=P(AXIS, None), vel=P(AXIS, None), K=P(AXIS), valid=P(AXIS),
        t=P(),
    )
    gshape = SlabState(
        pos=(plan.n_dev * n_loc, 3), vel=(plan.n_dev * n_loc, 3),
        K=(plan.n_dev * n_loc,), valid=(plan.n_dev * n_loc,), t=(),
    )

    def place(x, sp, gs):
        sh = NamedSharding(mesh, sp)
        if jax.process_count() == 1:
            return jax.device_put(x, sh)
        return jax.make_array_from_process_local_data(sh, x, gs)

    global_state = jax.tree.map(place, local_state, specs, gshape)
    layout = LocalLayout(
        src=src, gid=np.where(valid, local.gid[safe], -1), d0=d0, d1=d1
    )
    return global_state, layout


def mh_unpack(arr: jax.Array, layout: LocalLayout) -> np.ndarray:
    """This process's rows of a (n_dev*n_loc, ...) chunk output, in the
    packed slot order of `layout` (pads included). Touches only the
    addressable shards."""
    shards = sorted(arr.addressable_shards, key=lambda s: s.index[0].start)
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def mh_local_rows(
    st: SlabState, h_rows: jax.Array, layout: LocalLayout
) -> LocalRows:
    """LocalRows (compacted, pads dropped) from a chunk's output state —
    the host-side handoff between chunks / into mh_plan_slabs."""
    valid = layout.src >= 0
    return LocalRows(
        pos=mh_unpack(st.pos, layout)[valid].astype(np.float64),
        vel=mh_unpack(st.vel, layout)[valid].astype(np.float64),
        K=mh_unpack(st.K, layout)[valid].astype(np.float64),
        h=mh_unpack(h_rows, layout)[valid].astype(np.float64),
        gid=layout.gid[valid],
    )


def gather_to_primary(local: LocalRows, n: int):
    """Full state on process 0 only (snapshot I/O); other processes
    return None. One allgather, used at snapshot cadence — the sole
    place the global state materializes, and only on the I/O process."""
    if jax.process_count() == 1:
        out = {
            "pos": np.zeros((n, 3)), "vel": np.zeros((n, 3)),
            "K": np.zeros(n), "h": np.zeros(n),
        }
        for k in out:
            out[k][local.gid] = getattr(local, k)
        return out
    from jax.experimental import multihost_utils

    nl = local.gid.shape[0]
    max_nl = int(
        np.max(
            np.asarray(
                multihost_utils.process_allgather(
                    np.asarray([nl], np.int64)
                )
            )
        )
    )
    pack = np.full((max_nl, 9), -1.0, np.float64)
    pack[:nl, 0:3] = local.pos
    pack[:nl, 3:6] = local.vel
    pack[:nl, 6] = local.K
    pack[:nl, 7] = local.h
    pack[:nl, 8] = local.gid.astype(np.float64)
    allp = np.asarray(multihost_utils.process_allgather(pack)).reshape(-1, 9)
    if jax.process_index() != 0:
        return None
    real = allp[:, 8] >= 0
    gid = allp[real, 8].astype(np.int64)
    out = {
        "pos": np.zeros((n, 3)), "vel": np.zeros((n, 3)),
        "K": np.zeros(n), "h": np.zeros(n),
    }
    out["pos"][gid] = allp[real, 0:3]
    out["vel"][gid] = allp[real, 3:6]
    out["K"][gid] = allp[real, 6]
    out["h"][gid] = allp[real, 7]
    return out
