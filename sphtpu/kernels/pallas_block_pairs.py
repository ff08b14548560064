"""Pallas TPU kernel for the block engine's phase B (pair forces +
gravity corrections), VMEM-resident, query-blocked with candidate-output
accumulation.

Motivation (same as the phase A kernel, kernels/pallas_strip_knn.py):
the XLA formulation materializes the (BQ, C_b) pair tile and its
derived planes (d, d2, r, masks, viscosity, two kernel evaluations, the
gravity corrections) in HBM-backed fusions — 18 reduction outputs each
re-stream or rematerialize pair-tile intermediates. Here one grid step
owns a (qb, C_b) pair block: d2 is computed once into registers/VMEM and
ALL outputs — 10 query-side reductions and 8 candidate-side scatter
accumulators — come out of that single pass.

Candidate-side accumulation uses the matmul-accumulator pattern: the
grid is (block, query-sub-block) with the candidate outputs' index map
ignoring the inner axis, so mosaic keeps each block's (1, C_b)
accumulators resident in VMEM across the inner iterations; they are
zeroed at j == 0 and accumulated with += after.

Semantics are exactly physics/blocks.py's XLA phase_b (owner-sweep pair
terms, two-sided ownership weights for gravity): same masks, same
coefficient algebra, verified to f32 reassociation roundoff by
tests/test_blocks.py::test_blocks_pallas_phase_b_matches_xla.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.mesh_gravity import newton_minus_mesh



def _kernel(
    scal_ref,  # SMEM (4,): m, alpha, beta, [sigma | r_c_now unused slot]
    rc_ref,  # SMEM (1,): r_c_now
    qx_ref, qy_ref, qz_ref, qvx_ref, qvy_ref, qvz_ref,
    qm_ref, qh_ref, qrho_ref, qpor2_ref, qcs_ref,
    cx_ref, cy_ref, cz_ref, cvx_ref, cvy_ref, cvz_ref,
    cm_ref, ch_ref, crho_ref, cpor2_ref,
    # query-side outputs (1, qb, 1)
    ax_ref, ay_ref, az_ref, div_ref, mu_ref, visc_ref,
    gx_ref, gy_ref, gz_ref, gp_ref,
    # candidate-side accumulators (1, 1, C_b), revisited across j
    sax_ref, say_ref, saz_ref, svisc_ref,
    sgx_ref, sgy_ref, sgz_ref, sgp_ref,
    *, eos: str, p3m: bool,
):
    dtype = qx_ref.dtype
    big = jnp.finfo(dtype).max
    m = scal_ref[0]
    alpha = scal_ref[1]
    beta = scal_ref[2]
    sigma = scal_ref[3]
    r_c_now = rc_ref[0]

    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        for r in (sax_ref, say_ref, saz_ref, svisc_ref,
                  sgx_ref, sgy_ref, sgz_ref, sgp_ref):
            r[0] = jnp.zeros_like(r[0])

    qx = qx_ref[0]  # (qb, 1)
    qy = qy_ref[0]
    qz = qz_ref[0]
    qm = qm_ref[0]
    cx = cx_ref[0]  # (1, C_b)
    cy = cy_ref[0]
    cz = cz_ref[0]
    cm = cm_ref[0]

    dx = qx - cx
    dy = qy - cy
    dz = qz - cz
    d2 = dx * dx + dy * dy + dz * dz
    # division diet (round 4): the original body evaluated ~15-20
    # PAIRWISE divisions per slot (the piecewise helpers divide by the
    # pairwise h_avg and by r) — multi-cycle non-pipelined VPU ops that
    # dominated the eval (~0.55 s of a 0.88 s force pass on the deep
    # fixture). Everything below is rewritten on inv_r = rsqrt(d2) and
    # inv_h = 1/h_avg with polynomials in q = r * inv_h: 1 rsqrt + 3
    # reciprocals per tile, the rest multiplies. Bit-level parity with
    # the XLA formulation is reassociation-only (pinned at 3e-6 by
    # tests/test_blocks.py::test_blocks_pallas_phase_b_matches_xla).
    inv_r = jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
    inv_r = jnp.where(d2 > 0, inv_r, 0.0)  # self-pairs: 1/r -> 0
    r = d2 * inv_r
    valid = (cm > 0) & (qm > 0)

    # r_k = 2h recomputed in-kernel ((2h)^2 rounds identically wherever
    # it is squared), saving the rk2 gathers host-side
    qh = qh_ref[0]
    ch = ch_ref[0]
    qrk2 = (2.0 * qh) * (2.0 * qh)
    fwd = valid & (d2 <= qrk2)

    h_q = jnp.where(qh > 0, qh, 1.0)
    h_c = jnp.where(ch > 0, ch, 1.0)
    h_avg = 0.5 * (h_q + h_c)
    inv_h = 1.0 / h_avg  # pairwise, computed ONCE
    rho_avg = jnp.where(valid, 0.5 * (qrho_ref[0] + crho_ref[0]), 1.0)

    dvx = qvx_ref[0] - cvx_ref[0]
    dvy = qvy_ref[0] - cvy_ref[0]
    dvz = qvz_ref[0] - cvz_ref[0]
    v_dot_r = dvx * dx + dvy * dy + dvz * dz
    mu = jnp.minimum(
        h_avg * v_dot_r * (1.0 / (d2 + 0.01 * h_avg * h_avg)), 0.0
    )
    pi_own = (-alpha * qcs_ref[0] * mu + beta * mu * mu) * (1.0 / rho_avg)

    # grad_W(q)/r with q = r/h_q: h_q is a (qb, 1) ROW vector, so its
    # reciprocal powers are cheap; the q<=2 branch's /r rides inv_r
    inv_hq = 1.0 / h_q
    inv_hq2 = inv_hq * inv_hq
    ct_w = (1.0 / jnp.pi) * inv_hq2 * inv_hq2
    q_w = r * inv_hq
    g1 = ct_w * (2.25 * r * inv_hq2 - 3.0 * inv_hq)
    g2 = ct_w * (-0.75 * (2.0 - q_w) ** 2) * inv_r
    dwdr_q = jnp.where(q_w <= 1.0, g1, jnp.where(q_w <= 2.0, g2, 0.0))

    if eos == "polytropic":
        ct_own = m * (qpor2_ref[0] + cpor2_ref[0] + pi_own) / 2.0
    else:
        ct_own = m * (qpor2_ref[0] + pi_own / 2.0)

    coeff = jnp.where(fwd, ct_own * dwdr_q, 0.0)
    cdx = coeff * dx
    cdy = coeff * dy
    cdz = coeff * dz
    ax_ref[0] = -jnp.sum(cdx, axis=1, keepdims=True)
    ay_ref[0] = -jnp.sum(cdy, axis=1, keepdims=True)
    az_ref[0] = -jnp.sum(cdz, axis=1, keepdims=True)
    sax_ref[0] += jnp.sum(cdx, axis=0, keepdims=True)
    say_ref[0] += jnp.sum(cdy, axis=0, keepdims=True)
    saz_ref[0] += jnp.sum(cdz, axis=0, keepdims=True)

    v_dot_dw_q = v_dot_r * dwdr_q
    div_ref[0] = m * jnp.sum(
        jnp.where(fwd, v_dot_dw_q, 0.0), axis=1, keepdims=True
    )
    mu_ref[0] = jnp.max(jnp.where(fwd, mu, -big), axis=1, keepdims=True)
    visc_pair = jnp.where(fwd, m * pi_own * v_dot_dw_q / 2.0, 0.0)
    visc_ref[0] = jnp.sum(visc_pair, axis=1, keepdims=True)
    svisc_ref[0] += jnp.sum(visc_pair, axis=0, keepdims=True)

    # gravity corrections with two-sided ownership weights — the
    # softened cubic-spline kernels (kernels/gravity.py piecewise forms)
    # inlined on inv_r/inv_h/q so every 1/h^k and 1/r ride multiplies
    # (inv_r is 0 at self-pairs, so the Newtonian terms vanish there
    # exactly as the where-guarded originals did)
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
        inv_h * (2.0 / 3.0 * q2_g - 0.3 * q2_g * q2_g + 0.1 * q2_g * q3_g - 1.4),
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
        tg, tp = newton_minus_mesh(d2, inv_r, sigma)
        cgp = cgp + jnp.where(valid, tg, 0.0)
        cpp = cpp + jnp.where(valid, tp, 0.0)
    # visibility radii from 2h directly (same formula on both sides, so
    # per-pair ownership weights agree between owner and partner sweeps)
    vq_r = jnp.maximum(2.0 * qh, r_c_now)
    vc_r = jnp.maximum(2.0 * ch, r_c_now)
    w = jnp.where(r <= vq_r, jnp.where(r <= vc_r, 0.5, 1.0), 0.0)
    cgw = w * cgp
    cpw = w * cpp
    gwx = cgw * dx
    gwy = cgw * dy
    gwz = cgw * dz
    gx_ref[0] = m * jnp.sum(gwx, axis=1, keepdims=True)
    gy_ref[0] = m * jnp.sum(gwy, axis=1, keepdims=True)
    gz_ref[0] = m * jnp.sum(gwz, axis=1, keepdims=True)
    gp_ref[0] = m * jnp.sum(cpw, axis=1, keepdims=True)
    sgx_ref[0] += -m * jnp.sum(gwx, axis=0, keepdims=True)
    sgy_ref[0] += -m * jnp.sum(gwy, axis=0, keepdims=True)
    sgz_ref[0] += -m * jnp.sum(gwz, axis=0, keepdims=True)
    sgp_ref[0] += m * jnp.sum(cpw, axis=0, keepdims=True)


@functools.partial(
    jax.jit, static_argnames=("eos", "p3m", "cap", "interpret")
)
def phase_b_blocks(
    qfields,  # 11-tuple of (nb, cap) query-side arrays (see _kernel order)
    cfields,  # 10-tuple of (nb, C_b) candidate-side arrays
    m, alpha, beta, sigma, r_c_now,
    *,
    eos: str,
    p3m: bool,
    cap: int,
    interpret: bool = False,
):
    """Returns (10 query-side (nb, cap) arrays, 8 candidate-side
    (nb, C_b) arrays) in the _kernel output order.

    Wide candidate tables are split along the candidate axis into equal
    <=2048-wide chunks (one pallas_call each; every reduction over
    candidates is associative — query sums/maxes combine across chunks,
    candidate outputs concatenate): this kernel keeps ~25 pair-tile
    planes live, so a (8, 32768) block would need ~26 MB of scoped VMEM
    (hard compile error at 16 MB)."""
    nb, cw = cfields[0].shape
    k = -(-cw // 2048)
    if k > 1:
        cwc = cw // k
        assert cw % k == 0 and cwc % 128 == 0, cw
        qo_acc = None
        co_parts = []
        for t in range(k):
            cf_t = tuple(a[:, t * cwc : (t + 1) * cwc] for a in cfields)
            qo_t, co_t = phase_b_blocks(
                qfields, cf_t, m, alpha, beta, sigma, r_c_now,
                eos=eos, p3m=p3m, cap=cap, interpret=interpret,
            )
            if qo_acc is None:
                qo_acc = list(qo_t)
            else:
                for i, o in enumerate(qo_t):
                    # index 4 is mu_max (a max-reduction); the rest sum
                    qo_acc[i] = (
                        jnp.maximum(qo_acc[i], o) if i == 4
                        else qo_acc[i] + o
                    )
            co_parts.append(co_t)
        couts = tuple(
            jnp.concatenate([p[i] for p in co_parts], axis=1)
            for i in range(8)
        )
        return tuple(qo_acc), couts

    dtype = cfields[0].dtype
    # ~25 live (qb, cw) f32 planes must fit the 16 MB scoped VMEM with
    # double-buffering headroom: qb * cw <= ~107k lanes
    limit = max(107_000 // cw, 8)
    qb = 8
    for d in range(8, cap + 1, 8):
        if cap % d == 0 and d <= limit:
            qb = d
    n_jb = cap // qb

    def qview(a):
        return a.reshape(nb, cap, 1)

    def cview(a):
        return a.reshape(nb, 1, cw)

    q_spec = pl.BlockSpec((1, qb, 1), lambda i, j: (i, j, 0))
    c_spec = pl.BlockSpec((1, 1, cw), lambda i, j: (i, 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qo_spec = pl.BlockSpec((1, qb, 1), lambda i, j: (i, j, 0))
    co_spec = pl.BlockSpec((1, 1, cw), lambda i, j: (i, 0, 0))
    qo_shape = jax.ShapeDtypeStruct((nb, cap, 1), dtype)
    co_shape = jax.ShapeDtypeStruct((nb, 1, cw), dtype)

    scal = jnp.stack([
        jnp.asarray(m, dtype), jnp.asarray(alpha, dtype),
        jnp.asarray(beta, dtype),
        jnp.asarray(sigma if sigma is not None else 1.0, dtype),
    ])
    rc = jnp.asarray(r_c_now, dtype).reshape(1)

    outs = pl.pallas_call(
        functools.partial(_kernel, eos=eos, p3m=p3m),
        grid=(nb, n_jb),
        in_specs=[s_spec, s_spec] + [q_spec] * 11 + [c_spec] * 10,
        out_specs=[qo_spec] * 10 + [co_spec] * 8,
        out_shape=[qo_shape] * 10 + [co_shape] * 8,
        interpret=interpret,
    )(scal, rc, *[qview(a) for a in qfields], *[cview(a) for a in cfields])
    qouts = tuple(o.reshape(nb, cap) for o in outs[:10])
    couts = tuple(o.reshape(nb, cw) for o in outs[10:])
    return qouts, couts
