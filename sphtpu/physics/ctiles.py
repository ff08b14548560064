"""Class-compacted tile engine: occupancy-classed query blocks.

The mono-tile engine (physics/tiles.py) pads EVERY cell's query slots to
the global capacity: at the uniform headline (grid 15, cap 128, mean cell
occupancy ~30) roughly 3/4 of all swept query slots are padding, which is
most of why the roofline pins the uniform pass at ~14% of the VPU roof
with ~2% slot utility (BASELINE.md round-4 roofline; VERDICT r4 next-1).

This engine removes the QUERY-side padding while keeping everything that
makes the tile formulation fast on TPU — mono-level certification
(r_k <= cell edge), the 27-cell candidate prestack, the scatter-free
fwd+rev symmetric pair sum:

*   Cells are classed per evaluation by OCCUPANCY into a static capacity
    menu (32, 64, 96, 128): a cell with 30 particles sweeps (32, 27*cap)
    pair tiles instead of (128, 27*cap). Class LIST SIZES are plan-time
    constants (with drift headroom) so shapes stay static; the per-eval
    class assignment is data-dependent and certified — a class-count
    overflow fails the evaluation certificate exactly like a slot
    overflow (fallback, never wrong physics).
*   Phases A and B both run per class as VMEM-resident Pallas kernels
    over gathered prestack rows: phase A is the shape-generic
    kernels/pallas_strip_knn.phase_a_cells, phase B the new
    kernels/pallas_tile_pairs.phase_b_tiles (same division-diet algebra
    as tiles.py phase_b, fwd+rev masks, near-gravity correction).
*   Candidate width stays the full 27*cap stencil (a candidate cell's
    occupancy class is independent of the query's), so certification and
    pair coverage are EXACTLY the mono engine's; only padded query rows
    disappear from the sweep.

P3M mode is supported when the tail stencil half-width is one cell
(EngineConfig.c_halfwidth == 1, the default mesh_factor = 10 geometry):
the Newtonian-minus-mesh-shape term rides the same 3^3 pass, as in
tiles.py phase C. The outlier lane is NOT supported here — states needing
it stay on the legacy engine (the driver's planner already routes them).

Reference parity: same pair physics as polytrope_hydroKDTree.jl:222-248 /
isothermal_hydroKDTree.jl:219-245 via the tiles.py formulation it
compacts; pinned against the gather oracle by tests/test_ctiles.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .mesh_gravity import newton_minus_mesh  # noqa: F401 (p3m sigma docs)
from .tiles import ReducedForces, _bin_particles

CLASS_MENU = (32, 64, 96, 128)


def _class_thresholds(menu):
    """Max occupancy routed to each class. Shared by the planner and the
    engine so per-class counts are predictable: a cell goes to class k
    when occ <= thr_k, with thr sized so the class cap keeps ~10% + 2
    slots of drift headroom above the routing boundary; the LAST class
    accepts everything up to the global cap (the slot-overflow
    certificate guards beyond)."""
    thr = [int((ck - 2) / 1.1) for ck in menu[:-1]]
    thr.append(menu[-1])
    return tuple(thr)


def choose_tile_classes(
    pos_code,
    h,
    kh: int,
    *,
    safety: float = 1.05,
    cap_max: int = 128,
    headroom: float = 1.25,
    count_margin: float = 1.3,
    prestack_budget: float = 1.6e9,
):
    """Host-side planning: (grid, cap, classes) or None.

    grid/cap follow choose_tile_params (mono-level certification bound,
    measured max occupancy + drift headroom) restricted to cap <= 128
    (the Pallas phase-A kernel's VMEM bound). classes is a tuple of
    (cap_k, n_cells_k) list sizes over CLASS_MENU entries <= cap, each
    padded by `count_margin` so per-step occupancy drift migrates cells
    between classes without replanning; migrations past the padding fail
    the in-engine certificate (fallback, then re-plan). Returns None when
    the state cannot certify or the 11-field candidate prestack would
    exceed `prestack_budget` bytes (the caller stays on the legacy
    engine)."""
    import numpy as np

    pos_code = np.asarray(pos_code)
    h = np.asarray(h)
    half = float(np.abs(pos_code).max()) * (1 + 1e-6)
    grid = max(int(2.0 * half / (safety * 2.0 * float(h.max()))), 2)
    s_eff = 2.0 * half / grid
    c = np.clip((pos_code + half) // s_eff, 0, grid - 1).astype(np.int64)
    cells = (c[:, 2] * grid + c[:, 1]) * grid + c[:, 0]
    occ = np.bincount(cells, minlength=grid**3)
    cmax = int(occ.max())
    cap = max(32, int(-(-headroom * cmax // 32)) * 32)
    if cap > cap_max:
        return None
    if 11 * grid**3 * 27 * cap * 4 > prestack_budget:
        return None
    menu = tuple(m for m in CLASS_MENU if m < cap) + (cap,)
    thr = np.asarray(_class_thresholds(menu))
    cls = np.searchsorted(thr, occ, side="left")
    counts = np.bincount(cls[occ > 0], minlength=len(menu))
    classes = []
    for k, cap_k in enumerate(menu):
        nk = int(counts[k])
        nk_pad = max(int(-(-nk * count_margin // 8)) * 8, 8)
        classes.append((int(cap_k), min(nk_pad, grid**3)))
    return grid, cap, tuple(classes)


@functools.partial(
    jax.jit,
    static_argnames=(
        "eos", "kh", "grid", "cap", "classes", "mesh_factor",
        "sigma_cells", "interpret",
    ),
)
def ctile_sph_forces(
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
    cap: int,
    classes: tuple,
    mesh_factor: int = 0,
    sigma_cells: float = 2.2,
    interpret: bool = False,
):
    """Same contract as tile_sph_forces: (ReducedForces, (gx, gy, gz,
    phi) near-gravity corrections, ok). ok False => caller falls back.
    mesh_factor == 0 is exact mode (corrections vs the pure-Newtonian
    sweep); > 0 is P3M with c_halfwidth == 1 REQUIRED (the caller/
    planner guarantees mesh_factor >= ceil(4.4 * sigma_cells))."""
    n = pos.shape[0]
    dtype = pos.dtype
    g = grid
    del h_hint  # classing is from actual occupancy, not the hint
    half = jnp.max(jnp.abs(pos)) * (1.0 + 1e-6) + jnp.asarray(1e-30, dtype)
    coords, rank, (pz, py, px), overflow, s = _bin_particles(
        pos, g, cap, half
    )
    cell_row = (coords[:, 2] * g + coords[:, 1]) * g + coords[:, 0]
    n_cells = g**3

    gp = g + 2
    xslots = gp * cap
    plane_shape = (gp, gp, xslots)

    def to_plane(v, fill=0.0):
        return jnp.full(plane_shape, fill, dtype).at[pz, py, px].set(
            v.astype(dtype)
        )

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
        return jnp.stack(parts, axis=3).reshape(n_cells, 27 * cap)

    def qview(P):
        # unpadded (n_cells, cap) query-slot view of a padded plane
        return P[1 : g + 1, 1 : g + 1, cap : (g + 1) * cap].reshape(
            n_cells, cap
        )

    def padrow(a, fill=0.0):
        pad = jnp.full((1,) + a.shape[1:], fill, a.dtype)
        return jnp.concatenate([a, pad], axis=0)

    X = to_plane(pos[:, 0])
    Y = to_plane(pos[:, 1])
    Z = to_plane(pos[:, 2])
    MASK = to_plane(jnp.ones((n,), dtype))

    # per-eval occupancy classing (data-dependent; certified). Same
    # thresholds as choose_tile_classes so plan counts predict eval
    # counts; drift between refreshes is covered by count_margin.
    occ = jnp.zeros((n_cells,), jnp.int32).at[cell_row].add(1)
    thr = jnp.asarray(
        _class_thresholds(tuple(ck for ck, _ in classes)), jnp.int32
    )
    cls = jnp.searchsorted(thr, occ, side="left")
    counts = jnp.zeros((len(classes),), jnp.int32).at[cls].add(
        (occ > 0).astype(jnp.int32), mode="drop"
    )
    # empty cells carry no work; route them to the sentinel so small
    # classes stay small
    cls = jnp.where(occ > 0, cls, len(classes))
    fits = jnp.all(
        counts <= jnp.asarray([nk for _, nk in classes], jnp.int32)
    ) & jnp.all(occ <= cap)

    cells_k = [
        jnp.nonzero(cls == k, size=nk, fill_value=n_cells)[0].astype(
            jnp.int32
        )
        for k, (_, nk) in enumerate(classes)
    ]

    # phase A per class: exact k-th distance + density over the gathered
    # candidate prestack rows
    from ..kernels.pallas_strip_knn import phase_a_cells

    pre_a = tuple(padrow(prestack(P)) for P in (X, Y, Z, MASK))
    q_a = tuple(padrow(qview(P)) for P in (X, Y, Z, MASK))

    Hf = jnp.zeros((n_cells + 1, cap), dtype)
    RHOf = jnp.zeros((n_cells + 1, cap), dtype)
    rows_ok = jnp.asarray(True)
    s2 = s * s
    for k, (cap_k, nk) in enumerate(classes):
        ck = cells_k[k]
        qs = tuple(a[ck][:, :cap_k] for a in q_a)
        cs_ = tuple(a[ck] for a in pre_a)
        reach2 = jnp.full((nk, cap_k), s2, dtype)
        h_b, rho_b, ok_b = phase_a_cells(
            qs, reach2, cs_, m, kh=kh, cap=cap_k, interpret=interpret
        )
        pad_w = cap - cap_k
        Hf = Hf.at[ck].set(
            jnp.pad(h_b, ((0, 0), (0, pad_w))), mode="drop"
        )
        RHOf = RHOf.at[ck].set(
            jnp.pad(rho_b, ((0, 0), (0, pad_w))), mode="drop"
        )
        rows_ok = rows_ok & jnp.all(ok_b > 0)

    Hq = Hf[:n_cells]
    RHOq = RHOf[:n_cells]
    rho_safe = jnp.where(RHOq > 0, RHOq, 1.0)
    occ_mask = qview(MASK) > 0
    if eos == "polytropic":
        Kq = jnp.zeros((n_cells, cap), dtype).at[cell_row, rank].set(
            K.astype(dtype)
        )
        POR2q = jnp.where(occ_mask, Kq * rho_safe ** (gamma - 2.0), 0.0)
        CSq = jnp.where(
            occ_mask, jnp.sqrt(gamma * Kq * rho_safe ** (gamma - 1.0)), 0.0
        )
    else:
        POR2q = jnp.where(occ_mask, cs0**2 / rho_safe, 0.0)
        CSq = jnp.where(occ_mask, jnp.full_like(rho_safe, cs0), 0.0)

    def pad3(a):
        return jnp.pad(
            a.reshape(g, g, g, cap), ((1, 1), (1, 1), (1, 1), (0, 0))
        ).reshape(gp, gp, xslots)

    VXp = to_plane(vel[:, 0])
    VYp = to_plane(vel[:, 1])
    VZp = to_plane(vel[:, 2])
    Hp = pad3(Hq)
    RHOp = pad3(RHOq)
    POR2p = pad3(POR2q)
    CSp = pad3(CSq)

    if mesh_factor > 0:
        sigma = (s / mesh_factor) * sigma_cells
    else:
        sigma = None

    # phase B per class (kernels/pallas_tile_pairs.py): all 11 fields
    # prestacked once, class rows gathered
    from ..kernels.pallas_tile_pairs import phase_b_tiles

    planes_b = (X, Y, Z, VXp, VYp, VZp, MASK, Hp, RHOp, POR2p, CSp)
    pre_b = tuple(padrow(prestack(P)) for P in planes_b)
    q_b = tuple(padrow(qview(P)) for P in planes_b)

    out_names = 10
    outs_flat = [jnp.zeros((n_cells + 1, cap), dtype) for _ in range(out_names)]
    for k, (cap_k, nk) in enumerate(classes):
        ck = cells_k[k]
        qs = tuple(a[ck][:, :cap_k] for a in q_b)
        cs_ = tuple(a[ck] for a in pre_b)
        outs_k = phase_b_tiles(
            qs, cs_, m, alpha, beta, sigma,
            eos=eos, p3m=mesh_factor > 0, cap=cap_k, interpret=interpret,
        )
        pad_w = cap - cap_k
        for i, o in enumerate(outs_k):
            outs_flat[i] = outs_flat[i].at[ck].set(
                jnp.pad(o, ((0, 0), (0, pad_w))), mode="drop"
            )

    # per-particle extraction (N gathers per output, same as tiles.py)
    def at_rows(a):
        return a[cell_row, rank]

    AX, AY, AZ, DIV, MU, VISC, GX, GY, GZ, GP = (
        at_rows(o[:n_cells]) for o in outs_flat
    )
    acc = jnp.stack([AX, AY, AZ], axis=1)
    out = ReducedForces(
        acc=acc,
        rho=at_rows(RHOq),
        h=at_rows(Hq),
        cs=at_rows(CSq) if eos == "polytropic" else jnp.full((n,), cs0, dtype),
        mu_max=MU,
        div_sum=DIV,
        visc_dk=VISC,
    )
    ok = (~overflow) & rows_ok & fits
    return out, (GX, GY, GZ, GP), ok


def ctile_classes_still_ok(
    pos_code, h, grid: int, cap: int, classes: tuple, *, slack: float = 1.05
):
    """Host-side hysteresis forecast for an ALREADY-COMPILED class
    config: do the current state's per-class cell counts still fit the
    compiled list sizes (with slack), on top of the mono-tile checks the
    caller performs via tile_params_still_ok? The in-engine certificate
    (`fits`) stays the safety net."""
    import numpy as np

    pos_code = np.asarray(pos_code)
    half = float(np.abs(pos_code).max()) * (1 + 1e-6)
    s_eff = 2.0 * half / grid
    c = np.clip((pos_code + half) // s_eff, 0, grid - 1).astype(np.int64)
    cells = (c[:, 2] * grid + c[:, 1]) * grid + c[:, 0]
    occ = np.bincount(cells, minlength=grid**3)
    if int(occ.max()) > cap:
        return False
    thr = np.asarray(_class_thresholds(tuple(ck for ck, _ in classes)))
    cls = np.searchsorted(thr, occ, side="left")
    if int(cls.max()) >= len(classes) and bool((occ[cls >= len(classes)] > 0).any()):
        return False
    counts = np.bincount(cls[occ > 0], minlength=len(classes))
    planned = np.asarray([nk for _, nk in classes])
    return bool(np.all(counts * slack <= planned))
