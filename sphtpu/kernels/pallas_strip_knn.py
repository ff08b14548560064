"""Pallas TPU kernel for the multi-level engine's phase A (exact k-th
distance + density), VMEM-resident, query-blocked.

Same motivation as kernels/pallas_knn.py (the mono tile engine's kernel):
the XLA strip formulation re-streams the (queries x 27*cap) squared-
distance tile from HBM on every count-bisection pass — the dominant HBM
traffic of a force eval. Here d2 is computed ONCE into VMEM per query
block and the whole bisection + density pass runs on-chip.

Differences from pallas_knn.py, both required by the multi-level engine
(physics/mlevel.py):

*   Per-query certification radius. The engine certifies found r_k
    against the per-query GUARANTEED stencil reach (cell edge s + the
    query's distance to its own cell's nearest face), not a uniform s —
    so the threshold arrives as a (n_cells, cap) plane (`reach2`) and
    seeds the bisection interval.
*   Query blocking via the pallas GRID, not in-kernel unrolling.
    Multi-level capacities go up to 512 (CAP_MENU); a (cap, 27*cap)
    pair tile at cap >= 160 exceeds the 16 MB scoped VMEM (measured on
    the mono kernel; in-kernel unrolled query blocks still OOMed —
    mosaic keeps unrolled iterations' temporaries alive). With
    grid = (n_cells, cap // qb) each grid step owns ONE (qb, 27*cap)
    block's temporaries, mosaic double-buffers the block fetches, and
    the candidate row is re-fetched per query block (83 KB * 4 fields
    at cap 192 — noise next to the d2 restream it replaces).

The candidate stack order is free (all reductions are over the candidate
axis), so the wrapper takes the query planes separately instead of
slicing the center cell out of the stack.

Semantics are bit-compatible with the engine's XLA strip path: binary
bisection halves [0, 1.001 * reach2] 34 times, reaching f32 ulp at any
representable r_k <= 1.5 s — the same fixed point as the engine's 17
4-ary passes; ties at the k-th distance are all included (they sit at
q = 2 where W vanishes). The query mask is the SPECIES-l mask, not the
occupancy mask: off-species rows come back h = rho = 0, ok = 1 — the
engine only consumes species-l rows from this pass (the opacity-
clearance certificate runs per ROW in XLA, shared with the strip path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cubic_spline import W

N_BISECT = 34


def _qb_for(cap: int, cw: int = 0) -> int:
    """Largest divisor of cap (multiple of 8) keeping the ~10 live
    (qb, cw) f32 temporaries of one grid step under ~12 MB. cw defaults
    to the strip geometry's 27*cap."""
    if not cw:
        cw = 27 * cap
    limit = max(312_498 // cw, 8)
    qb = 8
    for d in range(8, cap + 1, 8):
        if cap % d == 0 and d <= limit:
            qb = d
    return qb


def _kernel(
    m_ref,
    qx_ref, qy_ref, qz_ref, qm_ref, r2_ref,
    cx_ref, cy_ref, cz_ref, cm_ref,
    h_ref, rho_ref, ok_ref,
    *, kh: int, n_bisect: int = N_BISECT,
):
    dtype = qx_ref.dtype
    big = jnp.finfo(dtype).max
    kf = jnp.asarray(float(kh), dtype)

    qx = qx_ref[0]  # (qb, 1)
    qy = qy_ref[0]
    qz = qz_ref[0]
    qm = qm_ref[0]
    r2 = r2_ref[0]
    cx = cx_ref[0]  # (1, 27*cap)
    cy = cy_ref[0]
    cz = cz_ref[0]
    cm = cm_ref[0]

    dx = qx - cx
    dy = qy - cy
    dz = qz - cz
    d2 = dx * dx + dy * dy + dz * dz
    valid = (cm > 0) & (qm > 0)
    d2m = jnp.where(valid, d2, big)

    hi0 = 1.001 * r2
    lo0 = jnp.zeros_like(r2)

    def bis(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        cnt = jnp.sum(
            jnp.where(d2m <= mid, 1.0, 0.0).astype(dtype),
            axis=1,
            keepdims=True,
        )
        ge = cnt >= kf  # k-th distance <= mid: shrink to [lo, mid]
        return jnp.where(ge, lo, mid), jnp.where(ge, mid, hi)

    lo, hi = jax.lax.fori_loop(0, n_bisect, bis, (lo0, hi0))

    inw = d2m <= hi
    rk2 = jnp.max(jnp.where(inw, d2m, 0.0), axis=1, keepdims=True)
    nfound = jnp.sum(
        jnp.where(d2m <= rk2, 1.0, 0.0).astype(dtype),
        axis=1,
        keepdims=True,
    )
    h_t = jnp.sqrt(rk2) / 2.0
    h_safe = jnp.where(h_t > 0, h_t, 1.0)
    w_k = W(jnp.sqrt(d2) / h_safe, h_safe)
    rho_t = m_ref[0, 0] * jnp.sum(
        jnp.where(valid & (d2m <= rk2), w_k, 0.0),
        axis=1,
        keepdims=True,
    )
    row_ok = (qm <= 0) | ((nfound >= kf) & (rk2 <= r2))

    h_ref[0] = h_t
    rho_ref[0] = rho_t
    ok_ref[0] = row_ok.astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("kh", "cap", "interpret", "n_bisect")
)
def phase_a_cells(
    queries,  # (qx, qy, qz, qm): each (n_cells, cap); qm = species mask
    reach2,  # (n_cells, cap) per-query certification radius^2
    cands,  # (cx, cy, cz, cm): each (n_cells, cw); cm = occupancy
    m,
    *,
    kh: int,
    cap: int,
    interpret: bool = False,
    n_bisect: int = N_BISECT,
):
    """Returns (h, rho, ok) each (n_cells, cap); ok is 1.0 where the row
    certifies (masked-off, or k found with r_k^2 <= reach2).

    Shape-generic over the candidate width: the strip engines call it
    with cw = 27*cap stencil stacks; the block engine (physics/blocks.py)
    with cw = C_b candidate tables and cap = BQ packed-query blocks
    (n_bisect raised there — its seed interval spans the whole domain
    for tail-radius rows, not 1.5 cell edges)."""
    qx, qy, qz, qm = queries
    cx, cy, cz, cm = cands
    n_cells, cw = cx.shape
    dtype = cx.dtype
    qb = _qb_for(cap, cw)
    n_jb = cap // qb

    def qview(a):
        return a.reshape(n_cells, cap, 1)

    def cview(a):
        return a.reshape(n_cells, 1, cw)

    q_specs = pl.BlockSpec((1, qb, 1), lambda i, j: (i, j, 0))
    c_specs = pl.BlockSpec((1, 1, cw), lambda i, j: (i, 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, qb, 1), lambda i, j: (i, j, 0))
    out_shape = jax.ShapeDtypeStruct((n_cells, cap, 1), dtype)

    h, rho, ok = pl.pallas_call(
        functools.partial(_kernel, kh=kh, n_bisect=n_bisect),
        grid=(n_cells, n_jb),
        in_specs=[s_spec] + [q_specs] * 5 + [c_specs] * 4,
        out_specs=[out_spec] * 3,
        out_shape=[out_shape] * 3,
        interpret=interpret,
    )(
        jnp.asarray(m, dtype).reshape(1, 1),
        qview(qx), qview(qy), qview(qz), qview(qm), qview(reach2),
        cview(cx), cview(cy), cview(cz), cview(cm),
    )
    return (
        h.reshape(n_cells, cap),
        rho.reshape(n_cells, cap),
        ok.reshape(n_cells, cap),
    )
