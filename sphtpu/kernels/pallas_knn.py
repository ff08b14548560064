"""Pallas TPU kernel for the tile engine's phase A (exact k-th distance +
density), VMEM-resident.

The XLA formulation (physics/tiles.py phase_a) re-streams the
(queries x 27*cap) squared-distance tile from HBM on every bisection pass
— 17 passes x ~2 MB per cell block, the dominant HBM traffic of the hydro
pass (measured ~70% of the force-eval time at N=1e5). This kernel computes
d2 ONCE into VMEM and runs the whole bisection + the density pass on-chip:
per grid cell (cap query slots), the candidate row (27 neighbor cells,
pre-stacked) is loaded once, d2 (cap, 27*cap) lives in VMEM, and 34 binary
bisection sweeps + the W-sum run at VPU speed with zero extra HBM traffic.

Binary (not 4-ary) bisection: the 4-ary split in the XLA path amortizes
HBM re-reads (3 thresholds per pass over the streamed tile); VMEM-resident
there is nothing to amortize, and 34 single-threshold sweeps beat
17 x 3 = 51 sweeps.

Semantics are bit-compatible with phase_a: same certification
(nfound >= kh and r_k <= cell edge per occupied row), same tie handling
(the interval shrinks to one float so ties at the k-th distance are all
included — they sit at q = 2 where W and grad W vanish).

Layout: candidates are pre-stacked per cell as (n_cells, 27*cap) planes
(x/y/z/mask); queries are the same slots viewed as (n_cells*cap, 1)
columns so the (cap, 27*cap) pair tile broadcasts without any in-kernel
transpose. Outputs come back as (n_cells*cap, 1) and reshape straight into
the engine's unpadded (g, g, g*cap) grids.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .cubic_spline import W

# bisection sweeps: halving [0, 1.001 s^2] 34 times reaches f32 ulp at any
# representable r_k <= s, so (lo, hi] holds a single distinct d2 value
N_BISECT = 34


def _phase_a_kernel(
    s2_ref, m_ref,
    qx_ref, qy_ref, qz_ref, qm_ref,
    cx_ref, cy_ref, cz_ref, cm_ref,
    h_ref, rho_ref, ok_ref,
    *, kh: int, cb: int,
):
    dtype = qx_ref.dtype
    big = jnp.finfo(dtype).max
    s2 = s2_ref[0, 0]
    kf = jnp.asarray(float(kh), dtype)

    # cb cells per program (unrolled): amortizes per-program dispatch over
    # several (cap, cw) pair tiles; each tile still fits VMEM
    for c in range(cb):
        qx = qx_ref[0, c]  # (cap, 1)
        qy = qy_ref[0, c]
        qz = qz_ref[0, c]
        qm = qm_ref[0, c]
        cx = cx_ref[0, c]  # (1, cw)
        cy = cy_ref[0, c]
        cz = cz_ref[0, c]
        cm = cm_ref[0, c]

        dx = qx - cx
        dy = qy - cy
        dz = qz - cz
        d2 = dx * dx + dy * dy + dz * dz
        valid = (cm > 0) & (qm > 0)
        d2m = jnp.where(valid, d2, big)

        hi0 = jnp.full_like(qm, 1.001 * s2)
        lo0 = jnp.zeros_like(qm)

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

        lo, hi = jax.lax.fori_loop(0, N_BISECT, bis, (lo0, hi0))

        inw = d2m <= hi
        rk2 = jnp.max(jnp.where(inw, d2m, 0.0), axis=1, keepdims=True)
        nfound = jnp.sum(
            jnp.where(d2m <= rk2, 1.0, 0.0).astype(dtype),
            axis=1,
            keepdims=True,
        )
        h_t = jnp.sqrt(rk2) / 2.0
        h_safe = jnp.where(h_t > 0, h_t, 1.0)
        q_ratio = jnp.sqrt(d2) / h_safe
        w_k = W(q_ratio, h_safe)
        rho_t = m_ref[0, 0] * jnp.sum(
            jnp.where(valid & (d2m <= rk2), w_k, 0.0), axis=1, keepdims=True
        )
        row_ok = (qm <= 0) | ((nfound >= kf) & (rk2 <= s2))

        h_ref[0, c] = h_t
        rho_ref[0, c] = rho_t
        ok_ref[0, c] = row_ok.astype(dtype)


@functools.partial(
    jax.jit, static_argnames=("kh", "cap", "interpret")
)
def phase_a_pallas(
    cands,  # (cx, cy, cz, cm): each (n_cells, 27*cap)
    s2,
    m,
    *,
    kh: int,
    cap: int,
    interpret: bool = False,
):
    """Returns (h, rho, ok) each (n_cells, cap); ok is 1.0 where the row is
    certified (unoccupied, or k found with r_k <= cell edge)."""
    cx, cy, cz, cm = cands
    n_cells, cw = cx.shape
    dtype = cx.dtype
    center = 13 * cap  # cell (dz,dy,dxs)=(1,1,1) of the 27-stack = self

    # queries are the center-cell slice of the candidate stack, as
    # (n_blocks, cb, cap, 1) columns; candidates (n_blocks, cb, 1, cw).
    # Leading block dims of 1 with last-two dims equal to the array dims
    # satisfy the mosaic block-shape rule, and cb cells ride one program.
    cb = 8
    n_pad = -(-n_cells // cb) * cb
    pad = n_pad - n_cells

    def qview(c):
        q = c[:, center : center + cap]
        q = jnp.pad(q, ((0, pad), (0, 0)))
        return q.reshape(n_pad // cb, cb, cap, 1)

    def cview(c):
        c = jnp.pad(c, ((0, pad), (0, 0)))
        return c.reshape(n_pad // cb, cb, 1, cw)

    q_specs = pl.BlockSpec((1, cb, cap, 1), lambda i: (i, 0, 0, 0))
    c_specs = pl.BlockSpec((1, cb, 1, cw), lambda i: (i, 0, 0, 0))
    s_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, cb, cap, 1), lambda i: (i, 0, 0, 0))
    out_shape = jax.ShapeDtypeStruct((n_pad // cb, cb, cap, 1), dtype)

    h, rho, ok = pl.pallas_call(
        functools.partial(_phase_a_kernel, kh=kh, cb=cb),
        grid=(n_pad // cb,),
        in_specs=[s_spec, s_spec] + [q_specs] * 4 + [c_specs] * 4,
        out_specs=[out_spec] * 3,
        out_shape=[out_shape] * 3,
        interpret=interpret,
    )(
        jnp.asarray(s2, dtype).reshape(1, 1),
        jnp.asarray(m, dtype).reshape(1, 1),
        qview(cx), qview(cy), qview(cz), qview(cm),
        cview(cx), cview(cy), cview(cz), cview(cm),
    )
    return (
        h.reshape(n_pad, cap)[:n_cells],
        rho.reshape(n_pad, cap)[:n_cells],
        ok.reshape(n_pad, cap)[:n_cells],
    )
