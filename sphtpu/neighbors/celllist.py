"""Hierarchical Morton-grid kNN: experimental multi-level neighbor path.

STATUS: not on the production path. The engine's answer to strong h
contrast is the two-species split (physics/tiles.py grid sized for the
dense bulk + physics/outliers.py exact lane for the large-h tail), which
measured faster than per-level searches here. This module is kept (with
its tests) as the working basis for a future true multi-level tile
engine, where per-level cell blocking would replace the outlier budget
entirely.

Replaces the reference's KD-tree (getNeighbors,
polytrope_hydroKDTree.jl:118-163) with the space-filling-curve layout GPU
SPH codes use (see PAPERS.md), adapted to XLA's static-shape world:

1.  One Morton sort of the particles on the finest grid (nothing
    recompiles between steps; the sort is the only O(N log N) piece).
2.  Each particle searches the 27 neighbor cells *at its own level* of a
    power-of-two cell hierarchy, chosen so the cell edge is ~2.1x its
    previous smoothing length. Because coarse cells are Morton-prefix
    ranges, every level's cells are contiguous runs of the SAME sorted
    array — 27 searchsorted ranges per particle, no per-level re-sort.
    (This is how adaptive-h clustering is handled with static shapes: the
    dense core uses fine cells, the sparse halo coarse ones, and each
    row's candidate count stays bounded by ~2.2k.)
3.  One top_k over the gathered candidates replaces the blocked sweep's
    per-tile merges.
4.  Exactness is certified per row: no truncated range and found k-th
    distance <= own cell edge (then the 27-cell block provably contains
    all true neighbors). Uncertified rows get a second pass one level
    coarser with a bigger capacity, under a fixed row budget.
5.  If the residual budget overflows, the whole call falls back to the
    exact blocked sweep inside lax.cond — bad hints degrade performance,
    never correctness. Overflows are reported in NeighborInfo, not
    silently dropped.

The h hint exploits temporal coherence (h moves O(CFL) per step); the
engine feeds the previous evaluation's h.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from .knn import knn


class NeighborInfo(NamedTuple):
    certified: jnp.ndarray  # bool: fast path provably exact (no full fallback)
    n_residual: jnp.ndarray  # int32: rows that needed the coarser second pass
    fell_back: jnp.ndarray  # bool: full blocked fallback was used


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _spread_bits10(v: jnp.ndarray) -> jnp.ndarray:
    """Space the low 10 bits of v three apart (Morton component)."""
    v = v.astype(jnp.uint32)
    v = (v | (v << 16)) & jnp.uint32(0x030000FF)
    v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x09249249)
    return v


def morton3(cx: jnp.ndarray, cy: jnp.ndarray, cz: jnp.ndarray) -> jnp.ndarray:
    """30-bit Morton key from 10-bit cell coordinates."""
    return (
        _spread_bits10(cx)
        | (_spread_bits10(cy) << 1)
        | (_spread_bits10(cz) << 2)
    ).astype(jnp.int32)


def _candidate_pass(
    pos, pos_sorted, sorted_keys, order, coords, level, g0_log2, k, cap, row_block
):
    """One candidate-gather + select pass at the given per-row level.

    coords: (N,3) finest-grid integer coords of each query row.
    level: (N,) per-row level (0 = finest). Returns (idx, r_kth, ok_row):
    neighbor indices in original numbering, k-th distance, and a per-row
    flag that the search was provably exhaustive (no truncation, k found).
    """
    n = pos.shape[0]
    dtype = pos.dtype
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nc = 27 * cap

    # coarse coords of each row at its level
    shift = level.astype(jnp.int32)
    ccoords = coords >> shift[:, None]
    g_level = (jnp.int32(1) << (g0_log2 - shift))  # cells per edge at level

    lo_list, hi_list = [], []
    for dz in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                xx = ccoords[:, 0] + dx
                yy = ccoords[:, 1] + dy
                zz = ccoords[:, 2] + dz
                ok = (
                    (xx >= 0) & (xx < g_level)
                    & (yy >= 0) & (yy < g_level)
                    & (zz >= 0) & (zz < g_level)
                )
                m = morton3(
                    jnp.clip(xx, 0, g_level - 1).astype(jnp.uint32),
                    jnp.clip(yy, 0, g_level - 1).astype(jnp.uint32),
                    jnp.clip(zz, 0, g_level - 1).astype(jnp.uint32),
                )
                lo = jnp.where(ok, m << (3 * shift), 0)
                hi = jnp.where(ok, (m + 1) << (3 * shift), 0)
                lo_list.append(lo)
                hi_list.append(hi)
    lo = jnp.stack(lo_list, axis=1)  # (N, 27) fine-key lower bounds
    hi = jnp.stack(hi_list, axis=1)

    starts = jnp.searchsorted(sorted_keys, lo).astype(jnp.int32)
    ends = jnp.searchsorted(sorted_keys, hi).astype(jnp.int32)
    truncated = jnp.any((ends - starts) > cap, axis=1)

    np_rows = _ceil_to(n, row_block)
    pad = np_rows - n
    st_p = jnp.pad(starts, ((0, pad), (0, 0)))
    en_p = jnp.pad(ends, ((0, pad), (0, 0)))
    q_p = jnp.pad(pos, ((0, pad), (0, 0)))
    # planar SoA: (X, 3)-trailing layouts lane-pad 3 -> 128 on TPU (42x
    # waste), so coordinates are gathered as three (rows, C) planes
    xs, ys, zs = pos_sorted[:, 0], pos_sorted[:, 1], pos_sorted[:, 2]

    def row_chunk(args):
        st, en, qp = args
        span = jax.lax.broadcasted_iota(jnp.int32, (1, 1, cap), 2)
        raw = st[:, :, None] + span
        valid = (raw < en[:, :, None]).reshape(-1, nc)
        cand_s = jnp.minimum(raw, n - 1).reshape(-1, nc)
        dx = qp[:, 0:1] - xs[cand_s]
        dy = qp[:, 1:2] - ys[cand_s]
        dz = qp[:, 2:3] - zs[cand_s]
        d2 = dx * dx + dy * dy + dz * dz
        d2 = jnp.where(valid, d2, big)
        neg_top, sel = lax.top_k(-d2, k)
        idx_chunk = order[jnp.take_along_axis(cand_s, sel, axis=1)]
        d2k = jnp.maximum(-neg_top[:, -1], 0.0)
        nvalid = jnp.sum(valid, axis=1)
        return idx_chunk, d2k, nvalid

    idx_c, d2k, nvalid = lax.map(
        row_chunk,
        (
            st_p.reshape(np_rows // row_block, row_block, 27),
            en_p.reshape(np_rows // row_block, row_block, 27),
            q_p.reshape(np_rows // row_block, row_block, 3),
        ),
    )
    idx_c = idx_c.reshape(np_rows, k)[:n]
    r_kth = jnp.sqrt(d2k.reshape(np_rows)[:n])
    ok_row = (~truncated) & (nvalid.reshape(np_rows)[:n] >= k)
    return idx_c, r_kth, ok_row


@functools.partial(
    jax.jit,
    static_argnames=("k", "cap", "cap_residual", "g0_log2_max", "row_block"),
)
def knn_celllist(
    pos: jnp.ndarray,
    k: int,
    h_hint: jnp.ndarray,
    *,
    cap: int = 128,
    cap_residual: int = 512,
    g0_log2_max: int = 9,
    safety: float = 1.05,
    row_block: int = 8192,
):
    """Exact kNN of pos against itself. Returns (idx (N,k) int32 sorted by
    approximate distance ascending — self first, NeighborInfo)."""
    n = pos.shape[0]
    dtype = pos.dtype
    g0_log2 = jnp.int32(g0_log2_max)

    half = jnp.max(jnp.abs(pos)) * (1.0 + 1e-6) + jnp.asarray(1e-30, dtype)
    s0 = 2.0 * half / (1 << g0_log2_max)

    coords = jnp.clip(
        jnp.floor((pos + half) / s0).astype(jnp.int32), 0, (1 << g0_log2_max) - 1
    )
    keys = morton3(
        coords[:, 0].astype(jnp.uint32),
        coords[:, 1].astype(jnp.uint32),
        coords[:, 2].astype(jnp.uint32),
    )
    order = jnp.argsort(keys).astype(jnp.int32)
    sorted_keys = keys[order]
    pos_sorted = pos[order]

    # per-row level: smallest level whose cell edge >= safety * 2 h
    need = safety * 2.0 * h_hint
    level = jnp.clip(
        jnp.ceil(jnp.log2(jnp.maximum(need / s0, 1.0))), 0, g0_log2_max
    ).astype(jnp.int32)
    s_level = s0 * (2.0 ** level.astype(dtype))

    idx_a, rk_a, ok_a = _candidate_pass(
        pos, pos_sorted, sorted_keys, order, coords, level, g0_log2, k, cap,
        row_block,
    )
    cert_a = ok_a & (rk_a <= s_level)

    # residual: one level coarser, bigger capacity, only flagged rows
    level_b = jnp.minimum(level + 1, g0_log2_max)
    s_level_b = s0 * (2.0 ** level_b.astype(dtype))
    budget = max(_ceil_to(max(n // 16, 64), 8), 8)
    res_rows = jnp.nonzero(~cert_a, size=budget, fill_value=n)[0].astype(jnp.int32)
    n_res = jnp.sum(~cert_a).astype(jnp.int32)

    def residual_pass():
        safe_rows = jnp.minimum(res_rows, n - 1)
        idx_b, rk_b, ok_b = _candidate_pass(
            pos[safe_rows],
            pos_sorted,
            sorted_keys,
            order,
            coords[safe_rows],
            level_b[safe_rows],
            g0_log2,
            k,
            cap_residual,
            min(512, budget),
        )
        cert_b = ok_b & (rk_b <= s_level_b[safe_rows])
        scatter_rows = jnp.where(
            (res_rows < n) & cert_b, res_rows, n
        )  # out-of-range rows dropped
        idx_fixed = idx_a.at[scatter_rows].set(idx_b, mode="drop")
        all_ok = jnp.all(cert_b | (res_rows >= n))
        return idx_fixed, all_ok

    def no_residual():
        return idx_a, jnp.asarray(True)

    idx_ab, res_ok = lax.cond(n_res > 0, residual_pass, no_residual)

    certified = (n_res <= budget) & res_ok
    idx = lax.cond(certified, lambda: idx_ab, lambda: knn(pos, pos, k)[0])
    return idx, NeighborInfo(certified, n_res, ~certified)
