"""Grouped (ragged) Pallas TPU kernel for the block engine's phase B:
ONE kernel launch for ALL capacity buckets.

The per-bucket formulation (kernels/pallas_block_pairs.py) pays, per
evaluation, one pallas_call per bucket per <=2048-wide candidate chunk
(~58 launches on the deep-collapse fixture) plus ~10 per-bucket
candidate-table field gathers (~45M gather rows/eval) and per-bucket
scatter-adds — the XLA glue around the kernels, not the pair
arithmetic, is what pins the hard regime at 4% of the VPU roof
(BENCH_r04 roofline; VERDICT r4 next-2).

This kernel flattens every bucket's (nb, C_b) candidate table into ONE
chunk list: chunk i is a (BQ, CW) pair tile owning candidate slots
[i*CW, (i+1)*CW) of the flat table and querying packed-query block
qblk[i]. Because every menu capacity is a multiple of CW (C_MENU drops
768), a block's C_b/CW chunks are consecutive, so:

*   query-side reductions accumulate in the revisited output block
    (matmul-accumulator pattern: init at the block's first chunk via a
    host-computed `first` flag, += / max after);
*   candidate-side outputs write one (8, CW) row-block per chunk, which
    the caller transposes into the (T, 8) update of a SINGLE fused
    row-order scatter-add;
*   the candidate fields arrive as ONE gathered (chunks, 10, CW) stack
    — a single (T, 10) row gather replaces the ~10 per-field per-bucket
    gathers (TPU gather cost is per index row; the 10-wide minor dim
    rides along ~free, same lesson as the round-4 fused scatter).

qblk/first are STATIC host arrays (the bucket structure is a plan-time
constant), shipped via scalar prefetch so the index maps can read them.

Pair semantics are exactly pallas_block_pairs._kernel's (owner-sweep
terms, division-diet algebra, two-sided gravity ownership weights);
parity is pinned by tests/test_blocks.py against the XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..physics.mesh_gravity import newton_minus_mesh

# flat candidate chunk width: divides every C_MENU capacity, keeps the
# ~20 live (BQ, CW) f32 planes of one grid step under ~6 MB VMEM
CW = 512


def _kernel(
    qblk_ref, first_ref,  # scalar prefetch (n_chunks,) int32
    scal_ref,  # SMEM (4,): m, alpha, beta, sigma
    rc_ref,  # SMEM (1,): r_c_now
    qx_ref, qy_ref, qz_ref, qvx_ref, qvy_ref, qvz_ref,
    qm_ref, qh_ref, qrho_ref, qpor2_ref, qcs_ref,  # (1, BQ, 1) each
    c_ref,  # (1, 10, CW): x, y, z, vx, vy, vz, h, rho, por2, mask
    # query-side outputs (1, BQ, 1), revisited across a block's chunks
    ax_ref, ay_ref, az_ref, div_ref, mu_ref, visc_ref,
    gx_ref, gy_ref, gz_ref, gp_ref,
    # candidate-side output (1, 8, CW): sax say saz svisc sgx sgy sgz sgp
    co_ref,
    *, eos: str, p3m: bool,
):
    dtype = qx_ref.dtype
    big = jnp.finfo(dtype).max
    m = scal_ref[0]
    alpha = scal_ref[1]
    beta = scal_ref[2]
    sigma = scal_ref[3]
    r_c_now = rc_ref[0]

    i = pl.program_id(0)

    @pl.when(first_ref[i] == 1)
    def _init():
        z = jnp.zeros_like(ax_ref[0])
        for r in (ax_ref, ay_ref, az_ref, div_ref, visc_ref,
                  gx_ref, gy_ref, gz_ref, gp_ref):
            r[0] = z
        mu_ref[0] = jnp.full_like(mu_ref[0], -big)

    qx = qx_ref[0]  # (BQ, 1)
    qy = qy_ref[0]
    qz = qz_ref[0]
    qm = qm_ref[0]
    c = c_ref[0]  # (10, CW)
    cx = c[0:1]  # (1, CW)
    cy = c[1:2]
    cz = c[2:3]
    cvx = c[3:4]
    cvy = c[4:5]
    cvz = c[5:6]
    ch = c[6:7]
    crho = c[7:8]
    cpor2 = c[8:9]
    cm = c[9:10]

    dx = qx - cx
    dy = qy - cy
    dz = qz - cz
    d2 = dx * dx + dy * dy + dz * dz
    # division-diet algebra (see pallas_block_pairs.py): 1 rsqrt + 3
    # reciprocals per tile, polynomials in q for the piecewise kernels
    inv_r = jax.lax.rsqrt(jnp.where(d2 > 0, d2, 1.0))
    inv_r = jnp.where(d2 > 0, inv_r, 0.0)  # self-pairs: 1/r -> 0
    r = d2 * inv_r
    valid = (cm > 0) & (qm > 0)

    qh = qh_ref[0]
    qrk2 = (2.0 * qh) * (2.0 * qh)
    fwd = valid & (d2 <= qrk2)

    h_q = jnp.where(qh > 0, qh, 1.0)
    h_c = jnp.where(ch > 0, ch, 1.0)
    h_avg = 0.5 * (h_q + h_c)
    inv_h = 1.0 / h_avg
    rho_avg = jnp.where(valid, 0.5 * (qrho_ref[0] + crho), 1.0)

    dvx = qvx_ref[0] - cvx
    dvy = qvy_ref[0] - cvy
    dvz = qvz_ref[0] - cvz
    v_dot_r = dvx * dx + dvy * dy + dvz * dz
    mu = jnp.minimum(
        h_avg * v_dot_r * (1.0 / (d2 + 0.01 * h_avg * h_avg)), 0.0
    )
    pi_own = (-alpha * qcs_ref[0] * mu + beta * mu * mu) * (1.0 / rho_avg)

    inv_hq = 1.0 / h_q
    inv_hq2 = inv_hq * inv_hq
    ct_w = (1.0 / jnp.pi) * inv_hq2 * inv_hq2
    q_w = r * inv_hq
    g1 = ct_w * (2.25 * r * inv_hq2 - 3.0 * inv_hq)
    g2 = ct_w * (-0.75 * (2.0 - q_w) ** 2) * inv_r
    dwdr_q = jnp.where(q_w <= 1.0, g1, jnp.where(q_w <= 2.0, g2, 0.0))

    if eos == "polytropic":
        ct_own = m * (qpor2_ref[0] + cpor2 + pi_own) / 2.0
    else:
        ct_own = m * (qpor2_ref[0] + pi_own / 2.0)

    coeff = jnp.where(fwd, ct_own * dwdr_q, 0.0)
    cdx = coeff * dx
    cdy = coeff * dy
    cdz = coeff * dz
    ax_ref[0] += -jnp.sum(cdx, axis=1, keepdims=True)
    ay_ref[0] += -jnp.sum(cdy, axis=1, keepdims=True)
    az_ref[0] += -jnp.sum(cdz, axis=1, keepdims=True)
    sax = jnp.sum(cdx, axis=0, keepdims=True)
    say = jnp.sum(cdy, axis=0, keepdims=True)
    saz = jnp.sum(cdz, axis=0, keepdims=True)

    v_dot_dw_q = v_dot_r * dwdr_q
    div_ref[0] += m * jnp.sum(
        jnp.where(fwd, v_dot_dw_q, 0.0), axis=1, keepdims=True
    )
    mu_ref[0] = jnp.maximum(
        mu_ref[0], jnp.max(jnp.where(fwd, mu, -big), axis=1, keepdims=True)
    )
    visc_pair = jnp.where(fwd, m * pi_own * v_dot_dw_q / 2.0, 0.0)
    visc_ref[0] += jnp.sum(visc_pair, axis=1, keepdims=True)
    svisc = jnp.sum(visc_pair, axis=0, keepdims=True)

    # gravity corrections with two-sided ownership weights
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
    vq_r = jnp.maximum(2.0 * qh, r_c_now)
    vc_r = jnp.maximum(2.0 * ch, r_c_now)
    w = jnp.where(r <= vq_r, jnp.where(r <= vc_r, 0.5, 1.0), 0.0)
    cgw = w * cgp
    cpw = w * cpp
    gwx = cgw * dx
    gwy = cgw * dy
    gwz = cgw * dz
    gx_ref[0] += m * jnp.sum(gwx, axis=1, keepdims=True)
    gy_ref[0] += m * jnp.sum(gwy, axis=1, keepdims=True)
    gz_ref[0] += m * jnp.sum(gwz, axis=1, keepdims=True)
    gp_ref[0] += m * jnp.sum(cpw, axis=1, keepdims=True)
    sgx = -m * jnp.sum(gwx, axis=0, keepdims=True)
    sgy = -m * jnp.sum(gwy, axis=0, keepdims=True)
    sgz = -m * jnp.sum(gwz, axis=0, keepdims=True)
    sgp = m * jnp.sum(cpw, axis=0, keepdims=True)

    co_ref[0] = jnp.concatenate(
        [sax, say, saz, svisc, sgx, sgy, sgz, sgp], axis=0
    )


@functools.partial(
    jax.jit,
    static_argnames=("eos", "p3m", "cap", "qblk", "first", "interpret"),
)
def phase_b_grouped(
    qfields,  # 11-tuple of (NB, cap) packed-query arrays (kernel order)
    cstack,  # (n_chunks, 10, CW) gathered candidate field stack
    m, alpha, beta, sigma, r_c_now,
    *,
    eos: str,
    p3m: bool,
    cap: int,
    qblk: tuple,  # static: query block id per chunk (non-decreasing)
    first: tuple,  # static: 1 at each block's first chunk
    interpret: bool = False,
):
    """Returns (10 query-side (NB, cap) arrays, (n_chunks, 8, CW)
    candidate-side output) in the _kernel order. qblk/first describe the
    flat chunk list; every block's chunks must be consecutive."""
    import numpy as np

    nb = qfields[0].shape[0]
    n_chunks = cstack.shape[0]
    dtype = cstack.dtype
    assert len(qblk) == n_chunks and len(first) == n_chunks

    qblk_a = jnp.asarray(np.asarray(qblk, np.int32))
    first_a = jnp.asarray(np.asarray(first, np.int32))

    def qview(a):
        return a.reshape(nb, cap, 1)

    q_spec = pl.BlockSpec((1, cap, 1), lambda i, qb, fr: (qb[i], 0, 0))
    c_spec = pl.BlockSpec((1, 10, CW), lambda i, qb, fr: (i, 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    qo_spec = pl.BlockSpec((1, cap, 1), lambda i, qb, fr: (qb[i], 0, 0))
    co_spec = pl.BlockSpec((1, 8, CW), lambda i, qb, fr: (i, 0, 0))
    qo_shape = jax.ShapeDtypeStruct((nb, cap, 1), dtype)
    co_shape = jax.ShapeDtypeStruct((n_chunks, 8, CW), dtype)

    scal = jnp.stack([
        jnp.asarray(m, dtype), jnp.asarray(alpha, dtype),
        jnp.asarray(beta, dtype),
        jnp.asarray(sigma if sigma is not None else 1.0, dtype),
    ])
    rc = jnp.asarray(r_c_now, dtype).reshape(1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_chunks,),
        in_specs=[s_spec, s_spec] + [q_spec] * 11 + [c_spec],
        out_specs=[qo_spec] * 10 + [co_spec],
    )
    outs = pl.pallas_call(
        functools.partial(_kernel, eos=eos, p3m=p3m),
        grid_spec=grid_spec,
        out_shape=[qo_shape] * 10 + [co_shape],
        interpret=interpret,
    )(qblk_a, first_a, scal, rc, *[qview(a) for a in qfields], cstack)
    qouts = tuple(o.reshape(nb, cap) for o in outs[:10])
    return qouts, outs[10]
