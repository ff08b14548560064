"""Pallas TPU kernel for the tile engines' phase B (pair forces + the
near-field gravity correction), VMEM-resident, query-blocked.

The mono-tile engine's XLA phase B (physics/tiles.py::phase_b) streams
eleven (queries x 27*cap) candidate planes from HBM per tile and
materializes the pair temporaries between fused ops; like the block
engine's phase-B kernel (pallas_block_pairs.py) this one computes d2 once
into VMEM per query block and produces all ten query-side reductions in a
single pass. Unlike the block kernel there are NO candidate-side
accumulators: the tile formulation evaluates the symmetric pair sum from
the receiver's side (forward mask = c in knn(q), reverse mask = q in
knn(c) — the scatter-free factoring of hydroCalculation,
polytrope_hydroKDTree.jl:229-245), so each query row owns its complete
result.

Physics per slot is the division-diet algebra of physics/tiles.py phase_b
(round 4): everything on inv_r = rsqrt(d2) with polynomial piecewise
helpers in q = r/h, one pairwise reciprocal each for 1/h_avg, the
viscosity denominator, and 1/rho_avg. The gravity correction is term 1
(softened - Newtonian, q <= 2) plus, in P3M mode, term 2
(Newtonian - mesh shape) — valid when the tail stencil half-width is one
cell (EngineConfig.c_halfwidth == 1, the default mesh_factor = 10
geometry), which the caller must guarantee.

Used by the class-compacted tile engine (physics/ctiles.py): queries
arrive as per-occupancy-class (n_cells_k, cap_k) slot blocks against the
shared (n_cells_k, 27*cap) candidate prestack, so padded query slots are
not swept. Parity with the XLA tile path is pinned by
tests/test_ctiles.py at f64 (interpret) and f32.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.mesh_gravity import newton_minus_mesh


def _kernel(
    scal_ref,  # SMEM (4,): m, alpha, beta, sigma
    qx_ref, qy_ref, qz_ref, qvx_ref, qvy_ref, qvz_ref,
    qm_ref, qh_ref, qrho_ref, qpor2_ref, qcs_ref,
    cx_ref, cy_ref, cz_ref, cvx_ref, cvy_ref, cvz_ref,
    cm_ref, ch_ref, crho_ref, cpor2_ref, ccs_ref,
    ax_ref, ay_ref, az_ref, div_ref, mu_ref, visc_ref,
    gx_ref, gy_ref, gz_ref, gp_ref,
    *, eos: str, p3m: bool,
):
    dtype = qx_ref.dtype
    big = jnp.finfo(dtype).max
    m = scal_ref[0]
    alpha = scal_ref[1]
    beta = scal_ref[2]
    sigma = scal_ref[3]

    qx = qx_ref[0]  # (qb, 1)
    qy = qy_ref[0]
    qz = qz_ref[0]
    qm = qm_ref[0]
    cx = cx_ref[0]  # (1, cw)
    cy = cy_ref[0]
    cz = cz_ref[0]
    cm = cm_ref[0]

    dx = qx - cx
    dy = qy - cy
    dz = qz - cz
    d2 = dx * dx + dy * dy + dz * dz
    inv_r = jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
    inv_r = jnp.where(d2 > 0, inv_r, 0.0)  # self-pairs: 1/r -> 0
    r = d2 * inv_r
    valid = (cm > 0) & (qm > 0)

    qh = qh_ref[0]
    ch = ch_ref[0]
    # r_k = 2h recomputed in-kernel ((2h)^2 rounds identically)
    fwd = valid & (d2 <= (2.0 * qh) * (2.0 * qh))
    rev = valid & (d2 <= (2.0 * ch) * (2.0 * ch))

    h_q = jnp.where(qh > 0, qh, 1.0)
    h_c = jnp.where(ch > 0, ch, 1.0)
    h_avg = 0.5 * (h_q + h_c)
    inv_h = 1.0 / h_avg  # pairwise reciprocal, computed ONCE
    rho_avg = jnp.where(valid, 0.5 * (qrho_ref[0] + crho_ref[0]), 1.0)
    inv_rho = 1.0 / rho_avg

    dvx = qvx_ref[0] - cvx_ref[0]
    dvy = qvy_ref[0] - cvy_ref[0]
    dvz = qvz_ref[0] - cvz_ref[0]
    v_dot_r = dvx * dx + dvy * dy + dvz * dz
    mu = jnp.minimum(
        h_avg * v_dot_r * (1.0 / (d2 + 0.01 * (h_avg * h_avg))), 0.0
    )
    pi_fwd = (-alpha * qcs_ref[0] * mu + beta * mu * mu) * inv_rho
    pi_rev = (-alpha * ccs_ref[0] * mu + beta * mu * mu) * inv_rho

    # grad_W(q)/r with per-side h (row/column reciprocal powers)
    inv_hq = 1.0 / h_q
    inv_hq2 = inv_hq * inv_hq
    ct_wq = (1.0 / jnp.pi) * inv_hq2 * inv_hq2
    q_q = r * inv_hq
    dwdr_q = jnp.where(
        q_q <= 1.0,
        ct_wq * (2.25 * r * inv_hq2 - 3.0 * inv_hq),
        jnp.where(q_q <= 2.0, ct_wq * (-0.75 * (2.0 - q_q) ** 2) * inv_r, 0.0),
    )
    inv_hc = 1.0 / h_c
    inv_hc2 = inv_hc * inv_hc
    ct_wc = (1.0 / jnp.pi) * inv_hc2 * inv_hc2
    q_c = r * inv_hc
    dwdr_c = jnp.where(
        q_c <= 1.0,
        ct_wc * (2.25 * r * inv_hc2 - 3.0 * inv_hc),
        jnp.where(q_c <= 2.0, ct_wc * (-0.75 * (2.0 - q_c) ** 2) * inv_r, 0.0),
    )

    if eos == "polytropic":
        psum = qpor2_ref[0] + cpor2_ref[0]
        ct_fwd = m * (psum + pi_fwd) / 2.0
        ct_rev = m * (psum + pi_rev) / 2.0
    else:
        ct_fwd = m * (qpor2_ref[0] + pi_fwd / 2.0)
        ct_rev = m * (cpor2_ref[0] + pi_rev / 2.0)

    coeff = -jnp.where(fwd, ct_fwd * dwdr_q, 0.0) - jnp.where(
        rev, ct_rev * dwdr_c, 0.0
    )
    ax_ref[0] = jnp.sum(coeff * dx, axis=1, keepdims=True)
    ay_ref[0] = jnp.sum(coeff * dy, axis=1, keepdims=True)
    az_ref[0] = jnp.sum(coeff * dz, axis=1, keepdims=True)

    v_dot_dw_q = v_dot_r * dwdr_q
    v_dot_dw_c = v_dot_r * dwdr_c
    div_ref[0] = m * jnp.sum(
        jnp.where(fwd, v_dot_dw_q, 0.0), axis=1, keepdims=True
    )
    mu_ref[0] = jnp.max(jnp.where(fwd, mu, -big), axis=1, keepdims=True)
    visc_ref[0] = jnp.sum(
        jnp.where(fwd, m * pi_fwd * v_dot_dw_q / 2.0, 0.0)
        + jnp.where(rev, m * pi_rev * v_dot_dw_c / 2.0, 0.0),
        axis=1,
        keepdims=True,
    )

    # near-field gravity correction, term 1: softened - Newtonian for
    # q <= 2 (the softened cubic-spline kernels inlined on inv_r/inv_h/q;
    # Newtonian terms vanish at self-pairs via inv_r = 0)
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
    if p3m:
        # term 2 (Newtonian - mesh shape), the c_halfwidth == 1 geometry
        tg, tp = newton_minus_mesh(d2, inv_r, sigma)
        cgp = cgp + jnp.where(valid, tg, 0.0)
        cpp = cpp + jnp.where(valid, tp, 0.0)
    gx_ref[0] = m * jnp.sum(cgp * dx, axis=1, keepdims=True)
    gy_ref[0] = m * jnp.sum(cgp * dy, axis=1, keepdims=True)
    gz_ref[0] = m * jnp.sum(cgp * dz, axis=1, keepdims=True)
    gp_ref[0] = m * jnp.sum(cpp, axis=1, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("eos", "p3m", "cap", "interpret")
)
def phase_b_tiles(
    qfields,  # 11-tuple of (n_cells, cap) query-slot arrays
    cfields,  # 11-tuple of (n_cells, cw) candidate prestack rows
    m, alpha, beta, sigma,
    *,
    eos: str,
    p3m: bool,
    cap: int,
    interpret: bool = False,
):
    """Returns 10 query-side (n_cells, cap) arrays in _kernel output
    order: ax, ay, az, div, mu_max, visc, ggx, ggy, ggz, gphi."""
    n_cells, cw = cfields[0].shape
    dtype = cfields[0].dtype
    # ~30 live (qb, cw) f32 planes must fit the 16 MB scoped VMEM with
    # double-buffering headroom
    limit = max(90_000 // cw, 8)
    qb = 8
    for d in range(8, cap + 1, 8):
        if cap % d == 0 and d <= limit:
            qb = d
    n_jb = cap // qb

    def qview(a):
        return a.reshape(n_cells, cap, 1)

    def cview(a):
        return a.reshape(n_cells, 1, cw)

    q_spec = pl.BlockSpec((1, qb, 1), lambda i, j: (i, j, 0))
    c_spec = pl.BlockSpec((1, 1, cw), lambda i, j: (i, 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qo_spec = pl.BlockSpec((1, qb, 1), lambda i, j: (i, j, 0))
    qo_shape = jax.ShapeDtypeStruct((n_cells, cap, 1), dtype)

    scal = jnp.stack([
        jnp.asarray(m, dtype), jnp.asarray(alpha, dtype),
        jnp.asarray(beta, dtype),
        jnp.asarray(sigma if sigma is not None else 1.0, dtype),
    ])

    outs = pl.pallas_call(
        functools.partial(_kernel, eos=eos, p3m=p3m),
        grid=(n_cells, n_jb),
        in_specs=[s_spec] + [q_spec] * 11 + [c_spec] * 11,
        out_specs=[qo_spec] * 10,
        out_shape=[qo_shape] * 10,
        interpret=interpret,
    )(scal, *[qview(a) for a in qfields], *[cview(a) for a in cfields])
    return tuple(o.reshape(n_cells, cap) for o in outs)
